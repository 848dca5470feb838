"""Adversarial-layout fuzz for the Keras-h5 weight converter.

tests/test_keras_parity.py validates load_keras_h5 against checkpoints the
LIVE Keras writer produces. This file attacks the converter from the other
side (the way the UBJSON codec was spec-fuzzed in round 4): an INDEPENDENT
writer emits checkpoints with randomized layer names, group orderings,
nesting prefixes, leaf-naming conventions, optimizer junk, and stray
non-layer groups — forms a particular Keras version may never produce but
the h5 container and the Keras layout families allow. The converter's
structure-driven routing must recover the exact tensors every time.

Modeled invariants the converter legitimately relies on (and which Keras
guarantees): the two inner convs and the two IGLOO kernels appear in
creation order under natural name sort, and the encoder's Dense+BN pair
shares the nested-submodel subtree with the first conv while the head pair
does not. Everything else (names, suffix numbers, group order, leaf
anonymity, ':0' suffixes) is randomized.
"""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from genomad_tpu.models import igloo, weights

C, V, K = igloo.CHANNELS, igloo.VOCAB, igloo.CONV_KERNEL
P, S, L8 = igloo.N_PATCHES, igloo.PATCH_SIZE, igloo.POOLED_LEN
E, N = igloo.ENC_DIM, igloo.N_CLASSES


def _ground_truth(rng):
    """A parameter pytree whose every tensor is uniquely fingerprinted, so
    any routing swap (conv2<->conv3, encoder<->head BN, kernel<->bias)
    changes the recovered values."""
    tag = [0.0]

    def arr(*shape):
        tag[0] += 1.0
        base = np.arange(int(np.prod(shape)), dtype=np.float32)
        return (base % 97 + tag[0] * 1000.0).reshape(shape)

    def ints(*shape):
        return rng.integers(0, L8, shape).astype(np.float32)

    return {
        "conv1": {"kernel": arr(K, V, C), "bias": arr(C)},
        "igloo1": {
            "patches": ints(P, S),
            "w_mult": arr(P, S, C),
            "w_summer": arr(S * C),
            "w_bias": arr(P),
            "w_qk": arr(P, L8),
            "w_v": arr(C, C),
        },
        "conv2": {"kernel": arr(K, C, C), "bias": arr(C)},
        "conv3": {"kernel": arr(K, C, C), "bias": arr(C)},
        "igloo2": {
            "patches": ints(P, S),
            "w_mult": arr(P, S, C),
            "w_summer": arr(S * C),
            "w_bias": arr(P),
            "w_qk": arr(P, L8),
            "w_v": arr(C, C),
        },
        "enc_dense": {"kernel": arr(2 * C, E), "bias": arr(E)},
        "enc_bn": {"gamma": arr(E), "beta": arr(E), "mean": arr(E), "var": arr(E)},
        "head_dense": {"kernel": arr(E, E), "bias": arr(E)},
        "head_bn": {"gamma": arr(E), "beta": arr(E), "mean": arr(E), "var": arr(E)},
        "out_dense": {"kernel": arr(E, N), "bias": arr(N)},
    }


def _layer_tensors(params, layer):
    """The h5-visible tensors of one layer, in Keras creation order."""
    p = params[layer]
    if layer.startswith("igloo"):
        return [
            ("patches", p["patches"].reshape(P, S, 1)),
            ("w_mult", p["w_mult"][None]),
            ("w_summer", p["w_summer"][None, :, None]),
            ("w_bias", p["w_bias"][None]),
            ("w_qk", p["w_qk"]),
            ("w_v", p["w_v"][None]),
        ]
    if layer.endswith("_bn"):
        return [
            ("gamma", p["gamma"]),
            ("beta", p["beta"]),
            ("moving_mean", p["mean"]),
            ("moving_variance", p["var"]),
        ]
    return [("kernel", p["kernel"]), ("bias", p["bias"])]


def _rand_name(rng, stem, order_rank=None):
    """A Keras-plausible layer name: random stem casing/suffix. When
    order_rank is given the numeric suffix preserves natural-sort order
    (Keras creation-order suffixes), while still randomizing the base."""
    if order_rank is None:
        suffix = "" if rng.random() < 0.3 else f"_{rng.integers(1, 50)}"
    else:
        suffix = f"_{order_rank}"
    return f"{stem}{suffix}"


def _write_fuzzed(path, params, rng):
    """Write one randomized checkpoint; returns nothing. Layout family,
    names, orderings, junk all drawn from rng."""
    family = rng.choice(["legacy_model", "legacy_weights", "keras3"])
    colon = family == "legacy_weights"
    # creation-order ranks keep conv2<conv3 and igloo1<igloo2 sortable;
    # regenerate until names are unique (random suffixes can collide)
    while True:
        layer_names = {
            "conv1": _rand_name(rng, "conv1d"),
            "conv2": _rand_name(rng, "conv1d", order_rank=rng.integers(1, 5)),
            "conv3": _rand_name(rng, "conv1d", order_rank=rng.integers(5, 9)),
            "igloo1": _rand_name(rng, "igloo1d__kernel", order_rank=rng.integers(1, 5)),
            "igloo2": _rand_name(rng, "igloo1d__kernel", order_rank=rng.integers(5, 9)),
            "enc_dense": _rand_name(rng, "dense"),
            "enc_bn": _rand_name(rng, "batch_normalization"),
            "head_dense": _rand_name(rng, "dense_head"),
            "head_bn": _rand_name(rng, "batch_normalization_head"),
            "out_dense": _rand_name(rng, "dense_out"),
        }
        if len(set(layer_names.values())) == len(layer_names):
            break
    # the encoder submodel's nested prefix (conv/igloo/enc_* under it)
    encoder_prefix = rng.choice(["functional", "igloo_encoder", "model_1"])
    encoder_layers = {
        "conv1", "conv2", "conv3", "igloo1", "igloo2", "enc_dense", "enc_bn",
    }

    with h5py.File(path, "w") as f:
        if family == "legacy_model":
            root = f.create_group("model_weights")
        elif family == "keras3":
            root = f.create_group("layers") if rng.random() < 0.5 else f
        else:
            root = f
        # optimizer junk the converter must skip
        if rng.random() < 0.7:
            opt = f.create_group("optimizer_weights")
            opt.create_dataset("iter", data=np.zeros(1, np.float32))
            opt.create_dataset(
                "m_0", data=np.zeros((E, E), np.float32)  # head-dense shaped!
            )
        # a stray non-layer group with unmatched shapes
        if rng.random() < 0.5:
            junk = root.create_group("top_level_model_weights")
            junk.create_dataset("j", data=np.zeros(7, np.float32))

        layer_items = list(layer_names.items())
        rng.shuffle(layer_items)
        for layer, name in layer_items:
            parts = []
            if layer in encoder_layers:
                parts.append(encoder_prefix)
            parts.append(name)
            if family == "legacy_model" and rng.random() < 0.5:
                # legacy doubles the layer name as an inner group
                parts.append(name)
            g = root
            for part in parts:
                g = g.require_group(part)
            if family == "keras3":
                g = g.require_group("vars")
            tensors = _layer_tensors(params, layer)
            if family == "keras3":
                # anonymous, creation-order integer names
                for i, (_, a) in enumerate(tensors):
                    g.create_dataset(str(i), data=a)
            else:
                items = list(tensors)
                rng.shuffle(items)  # name-keyed: order must not matter
                for leaf, a in items:
                    g.create_dataset(leaf + (":0" if colon else ""), data=a)


def _assert_equal(got, want):
    for layer in want:
        for key in want[layer]:
            w = want[layer][key]
            g = np.asarray(got[layer][key], dtype=np.float32)
            np.testing.assert_array_equal(
                g, np.asarray(w, np.float32), err_msg=f"{layer}/{key}"
            )


def test_fuzzed_layouts_roundtrip(tmp_path):
    for trial in range(25):
        rng = np.random.default_rng(1000 + trial)
        params = _ground_truth(rng)
        path = tmp_path / f"fuzz_{trial}.h5"
        _write_fuzzed(path, params, rng)
        got = weights.load_keras_h5(path)
        try:
            _assert_equal(got, params)
        except AssertionError as exc:
            raise AssertionError(f"trial {trial}: {exc}") from exc
        path.unlink()


def test_ambiguous_bn_subtree_raises(tmp_path):
    """Two Dense(512)+BN pairs at the SAME subtree depth as conv1 cannot be
    routed; the converter must refuse rather than guess."""
    rng = np.random.default_rng(7)
    params = _ground_truth(rng)
    path = tmp_path / "ambig.h5"
    with h5py.File(path, "w") as f:
        for layer in params:
            g = f.require_group(layer)  # everything flat: equal depth
            for leaf, a in _layer_tensors(params, layer):
                g.create_dataset(leaf, data=a)
    with pytest.raises(ValueError):
        weights.load_keras_h5(path)


def test_missing_layer_raises(tmp_path):
    rng = np.random.default_rng(8)
    params = _ground_truth(rng)
    path = tmp_path / "missing.h5"
    with h5py.File(path, "w") as f:
        enc = f.require_group("functional")
        for layer in params:
            if layer == "out_dense":
                continue
            g = (enc if layer != "head_dense" and layer != "head_bn" else f).require_group(layer)
            for leaf, a in _layer_tensors(params, layer):
                g.create_dataset(leaf, data=a)
    with pytest.raises(ValueError):
        weights.load_keras_h5(path)
