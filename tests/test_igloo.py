"""IGLOO model tests: numerics vs a direct numpy oracle of the reference
equations (genomad/neural_network/igloo.py:190-217, model.py:14-45), weight
IO round-trips, and the full-size forward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genomad_tpu.models import igloo, weights


def make_tiny_params(rng, L=64, V=9, C=8, P=16, S=4, ENC=12):
    """Small-shape parameter pytree exercising every code path."""
    pool_len = L // igloo.POOL

    def glorot(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.2

    def igloo_kernel():
        patches = np.stack(
            [np.sort(rng.choice(L, size=S, replace=False)) for _ in range(P)]
        ).astype(np.int32)
        return {
            "patches": patches,
            "w_mult": glorot(P, S, C),
            "w_summer": glorot(S * C),
            "w_bias": glorot(P),
            "w_qk": glorot(P, pool_len),
            "w_v": glorot(C, C),
        }

    def bn():
        return {
            "gamma": rng.uniform(0.5, 1.5, ENC).astype(np.float32),
            "beta": glorot(ENC),
            "mean": glorot(ENC),
            "var": rng.uniform(0.5, 1.5, ENC).astype(np.float32),
        }

    return {
        "conv1": {"kernel": glorot(6, V, C), "bias": glorot(C)},
        "igloo1": igloo_kernel(),
        "conv2": {"kernel": glorot(6, C, C), "bias": glorot(C)},
        "conv3": {"kernel": glorot(6, C, C), "bias": glorot(C)},
        "igloo2": igloo_kernel(),
        "enc_dense": {"kernel": glorot(2 * C, ENC), "bias": glorot(ENC)},
        "enc_bn": bn(),
        "head_dense": {"kernel": glorot(ENC, ENC), "bias": glorot(ENC)},
        "head_bn": bn(),
        "out_dense": {"kernel": glorot(ENC, 3), "bias": glorot(3)},
    }


# ---------------------------------------------------------------------------
# Numpy oracle following the reference graph literally
# ---------------------------------------------------------------------------


def oracle_causal_conv(x, kernel, bias):
    """Keras Conv1D(padding='causal') semantics: cross-correlation with
    left zero padding of K-1."""
    K = kernel.shape[0]
    B, L, _ = x.shape
    xp = np.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    out = np.zeros((B, L, kernel.shape[2]))
    for t in range(L):
        window = xp[:, t : t + K, :]  # (B, K, Cin)
        out[:, t] = np.einsum("bkc,kcd->bd", window, kernel)
    return out + bias


def oracle_igloo_kernel(y, p):
    """Literal transcription of the reference tensor algebra
    (igloo.py:190-217) in float64 numpy."""
    B = y.shape[0]
    P, S = p["patches"].shape
    C = y.shape[2]
    gathered = y[:, p["patches"], :]  # (B, P, S, C)
    mpi = (p["w_mult"][None] * gathered).reshape(B, P, S * C) @ p["w_summer"]
    mpi = mpi + p["w_bias"]
    y_proj = y @ p["w_v"]
    pooled_len = y.shape[1] // igloo.POOL
    pooled = y_proj[:, : pooled_len * igloo.POOL].reshape(B, pooled_len, igloo.POOL, C).max(2)
    logits = mpi @ p["w_qk"]
    alpha = np.exp(logits - logits.max(-1, keepdims=True))
    alpha /= alpha.sum(-1, keepdims=True)
    return np.einsum("bl,blc->bc", alpha, pooled)


def oracle_forward(params, tokens, V):
    def leaky(x):
        return np.where(x > 0, x, 0.1 * x)

    def bn(x, p):
        return (x - p["mean"]) / np.sqrt(p["var"] + igloo.BN_EPS) * p["gamma"] + p["beta"]

    onehot = np.eye(V)[tokens]  # (B, L, V)
    h1 = leaky(oracle_causal_conv(onehot, params["conv1"]["kernel"], params["conv1"]["bias"]))
    a = oracle_igloo_kernel(h1, params["igloo1"])
    h2 = leaky(oracle_causal_conv(h1, params["conv2"]["kernel"], params["conv2"]["bias"]))
    h3 = leaky(oracle_causal_conv(h2, params["conv3"]["kernel"], params["conv3"]["bias"]))
    b = oracle_igloo_kernel(h3, params["igloo2"])
    feat = np.concatenate([a, b], -1)
    enc = np.maximum(bn(feat @ params["enc_dense"]["kernel"] + params["enc_dense"]["bias"], params["enc_bn"]), 0)
    hid = np.maximum(bn(enc @ params["head_dense"]["kernel"] + params["head_dense"]["bias"], params["head_bn"]), 0)
    logits = hid @ params["out_dense"]["kernel"] + params["out_dense"]["bias"]
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_forward_matches_reference_oracle(rng):
    V = 9
    params = make_tiny_params(rng, V=V)
    tokens = rng.integers(0, V, size=(3, 64))
    expected = oracle_forward(params, tokens, V)
    prepared = igloo.prepare_params(params, compute_dtype=jnp.float32)
    got = np.asarray(igloo.apply(prepared, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_embed_conv_equals_onehot_conv(rng):
    V, C, L, B = 11, 8, 40, 2
    kernel = rng.normal(size=(6, V, C)).astype(np.float32)
    bias = rng.normal(size=C).astype(np.float32)
    tokens = rng.integers(0, V, size=(B, L))
    expected = oracle_causal_conv(np.eye(V)[tokens], kernel, bias)
    got = np.asarray(
        igloo._causal_embed_conv(jnp.asarray(tokens), jnp.asarray(kernel), jnp.asarray(bias))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_full_size_forward_shapes():
    params = igloo.init_params(seed=0)
    forward = igloo.make_forward(params, compute_dtype=jnp.float32)
    tokens = np.zeros((2, igloo.WINDOW_TOKENS), dtype=np.int32)
    probs = np.asarray(forward(tokens))
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    # deterministic across calls
    probs2 = np.asarray(forward(tokens))
    np.testing.assert_array_equal(probs, probs2)


def test_weight_npz_roundtrip(tmp_path):
    params = igloo.init_params(seed=1)
    path = tmp_path / "weights.npz"
    weights.save_npz(params, path)
    loaded = weights.load_npz(path)
    for group in params:
        for name in params[group]:
            np.testing.assert_array_equal(params[group][name], loaded[group][name])


def test_keras_h5_loader(tmp_path):
    """Build a synthetic checkpoint with Keras-style layer groups/names and
    check the shape+name-driven conversion routes every tensor correctly."""
    h5py = pytest.importorskip("h5py")
    params = igloo.init_params(seed=2)
    path = tmp_path / "nn_classifier.h5"
    with h5py.File(path, "w") as f:
        enc = f.create_group("model_weights/functional")
        for i, conv in enumerate(["conv1", "conv2", "conv3"]):
            name = "conv1d" if i == 0 else f"conv1d_{i}"
            g = enc.create_group(name)
            g.create_dataset("kernel:0", data=params[conv]["kernel"])
            g.create_dataset("bias:0", data=params[conv]["bias"])
        for i, key in enumerate(["igloo1", "igloo2"]):
            name = "igloo1d_kernel" if i == 0 else "igloo1d_kernel_1"
            g = enc.create_group(name)
            g.create_dataset("random_patches:0", data=params[key]["patches"][..., None])
            g.create_dataset("w_mult:0", data=params[key]["w_mult"][None])
            g.create_dataset("w_summer:0", data=params[key]["w_summer"][None, :, None])
            g.create_dataset("w_bias:0", data=params[key]["w_bias"][None])
            g.create_dataset("w_qk:0", data=params[key]["w_qk"])
            g.create_dataset("w_v:0", data=params[key]["w_v"][None])
        g = enc.create_group("dense")
        g.create_dataset("kernel:0", data=params["enc_dense"]["kernel"])
        g.create_dataset("bias:0", data=params["enc_dense"]["bias"])
        g = enc.create_group("batch_normalization")
        g.create_dataset("gamma:0", data=params["enc_bn"]["gamma"])
        g.create_dataset("beta:0", data=params["enc_bn"]["beta"])
        g.create_dataset("moving_mean:0", data=params["enc_bn"]["mean"])
        g.create_dataset("moving_variance:0", data=params["enc_bn"]["var"])
        top = f["model_weights"]
        g = top.create_group("dense_1")
        g.create_dataset("kernel:0", data=params["head_dense"]["kernel"])
        g.create_dataset("bias:0", data=params["head_dense"]["bias"])
        g = top.create_group("batch_normalization_1")
        g.create_dataset("gamma:0", data=params["head_bn"]["gamma"])
        g.create_dataset("beta:0", data=params["head_bn"]["beta"])
        g.create_dataset("moving_mean:0", data=params["head_bn"]["mean"])
        g.create_dataset("moving_variance:0", data=params["head_bn"]["var"])
        g = top.create_group("dense_2")
        g.create_dataset("kernel:0", data=params["out_dense"]["kernel"])
        g.create_dataset("bias:0", data=params["out_dense"]["bias"])

    loaded = weights.load_keras_h5(path)
    for group in params:
        for name in params[group]:
            np.testing.assert_array_equal(
                np.asarray(params[group][name]), np.asarray(loaded[group][name]), err_msg=f"{group}/{name}"
            )


def test_train_forward_runs(rng):
    params = make_tiny_params(rng)
    prepared = igloo.prepare_params(params, compute_dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 9, size=(2, 64)), jnp.int32)
    probs = igloo.apply_train(prepared, tokens, jax.random.PRNGKey(0))
    assert probs.shape == (2, 3)


def test_apply_bases_matches_apply(rng):
    """The base-code fast path is bit-compatible with the token path,
    including N handling and the causal edge."""
    import jax.numpy as jnp

    from genomad_tpu import sequence

    params = igloo.init_params(seed=4)
    prepared = igloo.prepare_params(params, compute_dtype=jnp.float32)
    # random DNA with Ns sprinkled in
    alphabet = np.frombuffer(b"ACGTN", dtype=np.uint8)
    B = 2
    bases_ascii = rng.choice(alphabet, (B, 6000), p=[0.24, 0.24, 0.24, 0.24, 0.04])
    tokens = np.stack(
        [sequence.tokenize_dna(bases_ascii[b].tobytes(), 4) for b in range(B)]
    ).astype(np.int32)
    base_codes = sequence._BASE_CODES[bases_ascii].astype(np.int32)
    out_tokens = np.asarray(igloo.apply(prepared, jnp.asarray(tokens)))
    out_bases = np.asarray(igloo.apply_bases(prepared, jnp.asarray(base_codes)))
    np.testing.assert_allclose(out_bases, out_tokens, rtol=1e-5, atol=1e-7)


def test_embed_from_bases_matches_embed_conv(rng):
    import jax.numpy as jnp

    from genomad_tpu import sequence

    params = igloo.init_params(seed=5)
    prepared = igloo.prepare_params(params, compute_dtype=jnp.float32)
    alphabet = np.frombuffer(b"ACGTN", dtype=np.uint8)
    bases_ascii = rng.choice(alphabet, (1, 200), p=[0.23, 0.23, 0.23, 0.23, 0.08])
    tokens = sequence.tokenize_dna(bases_ascii[0].tobytes(), 4)[None].astype(np.int32)
    base_codes = sequence._BASE_CODES[bases_ascii].astype(np.int32)
    ref = np.asarray(
        igloo._causal_embed_conv(
            jnp.asarray(tokens), prepared["conv1"]["kernel"], prepared["conv1"]["bias"]
        )
    )
    got = np.asarray(
        igloo._embed_from_bases(
            jnp.asarray(base_codes),
            prepared["base_tables"],
            prepared["conv1"]["kernel"],
            prepared["conv1"]["bias"],
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
