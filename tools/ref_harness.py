"""Import harness for the read-only reference tree at /root/reference.

The environment has no network and lacks most of the reference's binary
dependencies (numba, rich, pycrfsuite, pyrodigal_gv, taxopy, xgboost,
rich_click). This module installs permissive stub modules for those names
so that the reference's *pure-Python/numpy* code paths — the math
primitives, tokenizer, branch attention, calibration MLP, provirus
tagging — can be imported and executed to generate golden fixtures
(SURVEY.md §4 prescribes golden-file tests against the reference).

Only fixture-generation tools import this; the test suite consumes the
generated fixtures from tests/golden/ and never touches /root/reference.

NOTE: numba.njit is stubbed as an identity decorator, so reference
functions marked @njit run as plain Python — identical semantics,
just slow. Keep fixture inputs small.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


class _Dummy:
    """Permissive stand-in: constructible, callable, subscriptable,
    attribute access returns another _Dummy."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        return _Dummy()

    def __getattr__(self, name):
        return _Dummy()

    def __getitem__(self, item):
        return _Dummy()

    def __iter__(self):
        return iter(())

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _StubModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return _Dummy


def _identity_njit(*args, **kwargs):
    # numba.njit used bare (@njit) or parameterized (@njit(cache=True))
    if args and callable(args[0]) and not kwargs:
        return args[0]
    return lambda f: f


def install_stubs() -> None:
    import importlib.util

    # Only stub packages that are genuinely absent: the environment DOES
    # ship some of the reference's deps (e.g. rich), and stubbing an
    # installed package breaks OTHER libraries that import it (keras
    # imports rich.markup).
    stub_roots = [
        "rich",
        "rich_click",
        "pycrfsuite",
        "pyrodigal_gv",
        "taxopy",
        "xgboost",
    ]
    rich_submodules = [
        "rich.box",
        "rich._log_render",
        "rich.console",
        "rich.padding",
        "rich.panel",
        "rich.progress",
        "rich.rule",
        "rich.tree",
    ]
    for name in stub_roots:
        if name in sys.modules:
            continue
        if importlib.util.find_spec(name) is not None:
            continue  # real package available — use it
        sys.modules[name] = _StubModule(name)
        if name == "rich":
            for sub in rich_submodules:
                sys.modules.setdefault(sub, _StubModule(sub))

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.njit = _identity_njit
        numba.jit = _identity_njit
        sys.modules["numba"] = numba


def import_reference():
    """Install stubs, put /root/reference on sys.path, import genomad."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import genomad  # noqa: F401

    return genomad
