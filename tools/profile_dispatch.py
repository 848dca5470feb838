"""Measure axon dispatch overhead vs true device throughput.

Compares per-call dispatch of the IGLOO forward against the same N
iterations run inside one jitted lax.scan (single RPC), across batch sizes.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genomad_tpu.models import igloo  # noqa: E402


# module-scope so the jit cache hits after the first warmup call
_SUM = jax.jit(lambda x: x.sum().astype(np.float32))


def sync(out):
    np.asarray(_SUM(out))


def main():
    params = igloo.init_params(seed=0)
    prepared = igloo.prepare_params(params, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    @jax.jit
    def fwd(p, bases):
        return igloo.apply_bases(p, bases)

    def fwd_scan(p, bases, n):
        # roll the batch by the step index so each iteration's input is
        # genuinely different — otherwise the whole forward is loop-invariant
        # and XLA's LICM can hoist it, timing ~1 iteration instead of n
        def body(carry, i):
            out = igloo.apply_bases(p, jnp.roll(bases, i, axis=0))
            return carry + out.sum().astype(jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return total

    n = 6
    for B in (2048, 4096):
        bases = jax.device_put(rng.integers(0, 4, (B, 6000)).astype(np.int32))
        sync(fwd(prepared, bases))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(prepared, bases)
        sync(out)
        percall = (time.perf_counter() - t0) / n * 1e3

        fs = jax.jit(lambda p, b: fwd_scan(p, b, n))
        np.asarray(fs(prepared, bases))
        t0 = time.perf_counter()
        np.asarray(fs(prepared, bases))
        scanned = (time.perf_counter() - t0) / n * 1e3

        mbps = B * 6000 / scanned / 1e3
        print(
            f"B={B:5d}: per-call {percall:7.2f} ms | scanned {scanned:7.2f} ms/iter "
            f"-> {mbps:7.1f} Mbp/s device-side"
        )


if __name__ == "__main__":
    main()
