"""IGLOO sequence classifier in pure functional JAX.

Re-design of the reference Keras model (genomad/neural_network/model.py:14-45,
genomad/neural_network/igloo.py:30-217) for TPU:

Architecture (inference graph, per 6,000 bp window -> 5,997 tokens):

    tokens (B, 5997) int32 in [0, 256]
      |  one-hot(257) conv, causal, width 6      <- computed as 6 embedding
      v                                             gathers + shifted adds
    h1 (B, 5997, 128) -- LeakyReLU(0.1)
      |-- IGLOO kernel A ------------------------.
      v                                          |
    conv (causal, width 6) + LeakyReLU x2        |
      v                                          |
    h3 (B, 5997, 128)                            |
      |-- IGLOO kernel B ------------------------+
      v                                          v
           concat (B, 256) -> Dense 512 + BN + ReLU        (encoder)
           -> Dense 512 + BN + ReLU -> Dense 3 -> softmax  (classifier head)

IGLOO kernel (transformer_style, pooling 8 — igloo.py:190-217): 2,100 random
4-position patches are gathered from the (L, C) feature map, reduced to one
logit per patch through trainable weights, and the patch-logit vector attends
(softmax over 749 positions) over a max-pooled value projection of the input.

TPU-first notes versus the reference graph:
  * The reference materializes a one-hot (B, 5997, 257) tensor and runs a
    dense conv over it. Because the input is one-hot, that conv is exactly a
    sum of 6 shifted embedding lookups; we never materialize the one-hot and
    do 257x fewer MACs in stack 1.
  * w_mult (P,4,C) and w_summer (4C,) are algebraically folded into a single
    per-patch reduction tensor at load time (prepare_params), halving the
    elementwise work of the patch reduction.
  * All matmuls run on the MXU via lax.conv / jnp.einsum with
    preferred_element_type=float32; the compute dtype is configurable
    (bfloat16 for speed, float32 for bit-parity checks).

The reference model has nb_stacks=3 but — per the actual Keras graph builder
(igloo.py:63-83) — that creates only TWO IGLOO kernels: one after the first
conv and one after two further convs; the two (B, 128) outputs concatenate to
(B, 256).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from genomad_tpu import xla_cache  # noqa: F401  (persistent compile cache)

# Architecture constants (genomad/neural_network/model.py:15-27)
WINDOW_TOKENS = 5_997
VOCAB = 257
CHANNELS = 128
CONV_KERNEL = 6
N_PATCHES = 2_100
PATCH_SIZE = 4
POOL = 8
POOLED_LEN = WINDOW_TOKENS // POOL  # 749 (keras MaxPool1D 'valid')
# The trunk runs at a 128-multiple padded length so the Pallas patch
# reduction can tile it; positions >= WINDOW_TOKENS are masked out of every
# consumer (patch slots never reference them, the value path is sliced).
L_PAD = 6_016
ENC_DIM = 512
N_CLASSES = 3
BN_EPS = 1e-3  # keras BatchNormalization default epsilon

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _glorot(rng: np.random.Generator, shape) -> np.ndarray:
    fan_in, fan_out = shape[0], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return rng.uniform(-limit, limit, size=shape).astype(np.float32)


def random_patches(rng: np.random.Generator, vector_size: int = WINDOW_TOKENS, n_patches: int = N_PATCHES, patch_size: int = PATCH_SIZE) -> np.ndarray:
    """Sorted random position patches, matching the distribution of the
    reference generator at init time (igloo.py:280-296, build_backbone=False).

    In production the patch tensor comes from the trained checkpoint
    (nn_classification.py:309-310); this generator only provides
    deterministic placeholders for tests/benchmarks.
    """
    out = np.empty((n_patches, patch_size), dtype=np.int32)
    for i in range(n_patches):
        out[i] = np.sort(rng.choice(vector_size, size=patch_size, replace=False))
    return out


def init_params(seed: int = 0) -> Params:
    """Deterministic full parameter pytree (synthetic weights).

    Used for benchmarks and tests when the trained checkpoint
    (nn_classifier.h5, absent from the source mirror) is unavailable.
    """
    rng = np.random.default_rng(seed)

    def igloo_kernel_params():
        return {
            "patches": random_patches(rng),
            "w_mult": _glorot(rng, (N_PATCHES, PATCH_SIZE, CHANNELS)),
            "w_summer": _glorot(rng, (PATCH_SIZE * CHANNELS, 1))[:, 0],
            "w_bias": _glorot(rng, (1, N_PATCHES))[0],
            "w_qk": _glorot(rng, (N_PATCHES, POOLED_LEN)),
            "w_v": _glorot(rng, (CHANNELS, CHANNELS)),
        }

    def bn_params(dim):
        return {
            "gamma": np.ones(dim, np.float32),
            "beta": np.zeros(dim, np.float32),
            "mean": np.zeros(dim, np.float32),
            "var": np.ones(dim, np.float32),
        }

    params = {
        "conv1": {"kernel": _glorot(rng, (CONV_KERNEL, VOCAB, CHANNELS)), "bias": np.zeros(CHANNELS, np.float32)},
        "igloo1": igloo_kernel_params(),
        "conv2": {"kernel": _glorot(rng, (CONV_KERNEL, CHANNELS, CHANNELS)), "bias": np.zeros(CHANNELS, np.float32)},
        "conv3": {"kernel": _glorot(rng, (CONV_KERNEL, CHANNELS, CHANNELS)), "bias": np.zeros(CHANNELS, np.float32)},
        "igloo2": igloo_kernel_params(),
        "enc_dense": {"kernel": _glorot(rng, (2 * CHANNELS, ENC_DIM)), "bias": np.zeros(ENC_DIM, np.float32)},
        "enc_bn": bn_params(ENC_DIM),
        "head_dense": {"kernel": _glorot(rng, (ENC_DIM, ENC_DIM)), "bias": np.zeros(ENC_DIM, np.float32)},
        "head_bn": bn_params(ENC_DIM),
        "out_dense": {"kernel": _glorot(rng, (ENC_DIM, N_CLASSES)), "bias": np.zeros(N_CLASSES, np.float32)},
    }
    return params


def build_base_tables(kernel: np.ndarray) -> np.ndarray:
    """Precompute the two 6-base group tables for the fast embedding path.

    Because DNA tokens are OVERLAPPING 4-mers, the six tokens feeding
    output position t are fully determined by 9 consecutive bases, split
    into two 6-base groups: tokens {t-5,t-4,t-3} by bases t-5..t and
    tokens {t-2,t-1,t} by bases t-2..t+3. Each group has only 5^6 = 15,625
    possible base patterns (alphabet ACGT + N), so the summed conv-kernel
    contribution of a whole group is a table row:

        G[g][code(bases)] = sum_j kernel[3g+j][token_j(bases)]

    with token_j = 0 when its 4-base window contains an N — exactly the
    tokenizer's semantics (genomad/sequence.py:170-193). The embedding then
    needs TWO 128-wide gathers per position instead of one 768-wide gather:
    6x less gather traffic for bit-identical results.

    kernel: (6, 257, C) -> tables (2, 15625, C) float32.
    """
    k_size, vocab, channels = kernel.shape
    assert k_size == 6 and vocab == 257
    codes = np.arange(5**6)
    digits = (codes[:, None] // (5 ** np.arange(6))) % 5  # (15625, 6), digit j = base at offset j
    tables = np.zeros((2, 5**6, channels), np.float32)
    weights4 = 4 ** np.arange(3, -1, -1)
    for g in range(2):
        for j in range(3):
            window = digits[:, j : j + 4]  # bases of token j in this group
            valid = (window < 4).all(axis=1)
            token = np.where(valid, window @ weights4 + 1, 0)
            tables[g] += kernel[3 * g + j][token]
    return tables


def prepare_params(params: Params, compute_dtype=jnp.bfloat16) -> Params:
    """Fold inference-time constants and cast for the TPU forward pass.

    * w_mult (P,S,C) x w_summer (S*C,) -> single reduction tensor w_patch.
    * Batch-norm folded to scale/shift.
    * Weights cast to the compute dtype (patches stay int32).
    """

    def fold_igloo(p):
        patch_size, channels = p["w_mult"].shape[1], p["w_mult"].shape[2]
        w_summer = np.asarray(p["w_summer"]).reshape(patch_size, channels)
        return {
            "patches": jnp.asarray(p["patches"], jnp.int32),
            "w_patch": jnp.asarray(p["w_mult"] * w_summer[None, :, :], compute_dtype),
            "w_bias": jnp.asarray(p["w_bias"], compute_dtype),
            "w_qk": jnp.asarray(p["w_qk"], compute_dtype),
            "w_v": jnp.asarray(p["w_v"], compute_dtype),
        }

    def fold_bn(bn):
        scale = bn["gamma"] / np.sqrt(np.asarray(bn["var"]) + BN_EPS)
        shift = bn["beta"] - np.asarray(bn["mean"]) * scale
        return {"scale": jnp.asarray(scale, compute_dtype), "shift": jnp.asarray(shift, compute_dtype)}

    def cast(d):
        return {k: jnp.asarray(v, compute_dtype) for k, v in d.items()}

    conv1 = np.asarray(params["conv1"]["kernel"])
    base_tables = (
        jnp.asarray(build_base_tables(conv1), compute_dtype)
        if conv1.shape[0] == CONV_KERNEL and conv1.shape[1] == VOCAB
        else None
    )

    def patch_plan(p):
        """Static tiling plan for the Pallas patch reduction (full-size
        models only; tiny test models fall back to the gather path)."""
        patches = np.asarray(p["patches"])
        if patches.shape != (N_PATCHES, PATCH_SIZE) or patches.max() >= WINDOW_TOKENS:
            return None
        from genomad_tpu.ops import patch_reduce

        w_patch = np.asarray(p["w_mult"], np.float32) * np.asarray(
            p["w_summer"], np.float32
        ).reshape(PATCH_SIZE, -1)[None, :, :]
        plan = patch_reduce.build_plan(patches, w_patch, L_PAD)
        return {
            "w_tiles": jnp.asarray(plan.w_tiles, jnp.float32),
            "onehot": jnp.asarray(plan.onehot, jnp.float32),
            "idx": jnp.asarray(plan.idx, jnp.int32),
        }

    return {
        "conv1": cast(params["conv1"]),
        "base_tables": base_tables,
        "igloo1": fold_igloo(params["igloo1"]),
        "igloo1_plan": patch_plan(params["igloo1"]),
        "conv2": cast(params["conv2"]),
        "conv3": cast(params["conv3"]),
        "igloo2": fold_igloo(params["igloo2"]),
        "igloo2_plan": patch_plan(params["igloo2"]),
        "enc_dense": cast(params["enc_dense"]),
        "enc_bn": fold_bn(params["enc_bn"]),
        "head_dense": cast(params["head_dense"]),
        "head_bn": fold_bn(params["head_bn"]),
        "out_dense": cast(params["out_dense"]),
    }


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def _leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def _causal_embed_conv(tokens: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Width-K causal conv over one-hot input, computed as ONE embedding
    gather of a combined table plus K shifted slice-adds (the one-hot
    tensor is never materialized).

    out[:, t] = bias + sum_k kernel[k][tokens[:, t - (K-1) + k]]
    with out-of-range positions contributing zero (causal zero padding).

    The K per-offset tables are concatenated into U (V+1, K*C) (last row =
    zero pad token); a single wide gather G = U[padded_tokens] replaces K
    separate row gathers, and the shifted sum over G's K channel blocks is
    pure fusible elementwise work.
    """
    k_size, vocab, channels = kernel.shape
    length = tokens.shape[1]
    table = jnp.concatenate(
        [
            jnp.swapaxes(kernel, 0, 1).reshape(vocab, k_size * channels),
            jnp.zeros((1, k_size * channels), kernel.dtype),
        ],
        axis=0,
    )
    padded = jnp.pad(tokens, ((0, 0), (k_size - 1, 0)), constant_values=vocab)
    gathered = jnp.take(table, padded, axis=0)  # (B, L+K-1, K*C)
    out = sum(
        gathered[:, k : k + length, k * channels : (k + 1) * channels]
        for k in range(k_size)
    )
    return out + bias


def _causal_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Causal 1-D conv (B, L, C_in) -> (B, L, C_out) on the MXU."""
    pad = kernel.shape[0] - 1
    return (
        jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1,),
            padding=[(pad, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype,
        )
        + bias
    )


def _igloo_kernel(y: jnp.ndarray, p: Params, plan: Params | None = None) -> jnp.ndarray:
    """IGLOO patch-attention kernel (reference: igloo.py:190-217).

    y: (B, L, C) feature map -> (B, C) pooled representation. L may be the
    padded trunk length L_PAD; everything past WINDOW_TOKENS is ignored.
    """
    from genomad_tpu.ops import patch_reduce

    real_len = min(y.shape[1], WINDOW_TOKENS)
    pooled_len = real_len // POOL
    if plan is not None and y.shape[1] == L_PAD and patch_reduce.enabled():
        # Fused Pallas pass: patch reduction (MXU tile-matmul + mask-reduce)
        # AND value-projection + max-pool in one read of y — the unfused
        # graph round-trips a full (B, L, C) projection through HBM just to
        # pool it 8x (see patch_reduce._kernel_fused).
        mpi, pooled = patch_reduce.fused_reduce(
            y, plan["w_tiles"], plan["onehot"], plan["idx"], p["w_v"]
        )
        pooled = pooled[:, :pooled_len]
    else:
        # Patch gather + reduction: (B, P, S, C) * (P, S, C) summed -> (B, P)
        gathered = jnp.take(y, p["patches"], axis=1)  # (B, P, S, C)
        mpi = jnp.einsum("bpsc,psc->bp", gathered, p["w_patch"], preferred_element_type=jnp.float32)
        # Value projection + max-pool by 8 ('valid': trailing remainder
        # dropped). Project/pool over the full (possibly padded) length and
        # slice the 8x smaller pooled tensor — slicing y itself would copy
        # the whole feature map before the matmul.
        y_proj = jnp.einsum("blc,cd->bld", y, p["w_v"], preferred_element_type=jnp.float32).astype(y.dtype)
        full_windows = y.shape[1] // POOL
        pooled = jnp.max(
            y_proj[:, : full_windows * POOL].reshape(y.shape[0], full_windows, POOL, -1), axis=2
        )[:, :pooled_len]
    mpi = mpi.astype(y.dtype) + p["w_bias"]
    # Attention of the patch-logit vector over pooled positions
    alpha = jax.nn.softmax(
        jnp.einsum("bp,pl->bl", mpi, p["w_qk"], preferred_element_type=jnp.float32), axis=-1
    ).astype(y.dtype)
    return jnp.einsum("bl,blc->bc", alpha, pooled, preferred_element_type=jnp.float32).astype(y.dtype)


def _bn(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    return x * p["scale"] + p["shift"]


def _embed_from_bases(bases: jnp.ndarray, tables: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Fast first-conv path from 5-ary base codes (see build_base_tables).

    bases: (B, L_bases) int32 in [0, 4] (4 = N/unknown). Output length is
    L_bases - 3 (one per token position), matching _causal_embed_conv on the
    tokenized sequence bit-for-bit.
    """
    n_out = bases.shape[1] - 3
    # 5-ary 6-mer codes C6[p] = sum_j bases[p+j] * 5^j, p = 0..L_bases-6
    n_codes = bases.shape[1] - 5
    c6 = sum(bases[:, j : j + n_codes] * (5**j) for j in range(6))
    # main positions t >= 5: group a at t-5, group b at t-2
    main = jnp.take(tables[0], c6[:, : n_out - 5], axis=0) + jnp.take(
        tables[1], c6[:, 3 : n_out - 2], axis=0
    )
    # edge positions t = 0..4: causal zero padding means only tokens
    # 0..t contribute: h1[t] = sum_{k=5-t..5} kernel[k][token[t-5+k]]
    weights4 = jnp.asarray([64, 16, 4, 1], jnp.int32)
    first_windows = jnp.stack([bases[:, i : i + 4] for i in range(6)], axis=1)  # (B, 6, 4)
    valid = (first_windows < 4).all(axis=2)
    first_tokens = jnp.where(valid, first_windows @ weights4 + 1, 0)  # (B, 6)
    edge_cols = []
    for t in range(5):
        acc = sum(
            jnp.take(kernel[k], first_tokens[:, t - 5 + k], axis=0)
            for k in range(5 - t, 6)
        )
        edge_cols.append(acc)
    edge = jnp.stack(edge_cols, axis=1)  # (B, 5, C)
    return jnp.concatenate([edge, main], axis=1) + bias


def _tokens_from_bases(bases: jnp.ndarray) -> jnp.ndarray:
    """Vectorized 4-mer tokenizer on device: 5-ary base codes (B, L_bases)
    -> tokens (B, L_bases - 3) with token = kmer + 1, or 0 when any base in
    the window is N (genomad/sequence.py:170-193 semantics)."""
    n_out = bases.shape[1] - 3
    windows = jnp.stack([bases[:, j : j + n_out] for j in range(4)], axis=2)
    valid = (windows < 4).all(axis=2)
    weights4 = jnp.asarray([64, 16, 4, 1], jnp.int32)
    return jnp.where(valid, windows @ weights4 + 1, 0)


def _embed_onehot_conv(tokens: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """First conv layer as a dense one-hot conv on the MXU.

    Measured on v5e this beats the embedding-gather formulations: XLA's
    row gather sustains only ~100 GB/s, while the 257-channel one-hot conv
    runs as an MXU matmul (~10 ms vs ~22 ms for two table gathers at
    batch 512). The causal zero padding falls out of the conv's input
    padding (all-zero one-hot rows contribute nothing).
    """
    oh = jax.nn.one_hot(tokens, VOCAB, dtype=kernel.dtype)
    pad = kernel.shape[0] - 1
    return (
        jax.lax.conv_general_dilated(
            oh,
            kernel,
            window_strides=(1,),
            padding=[(pad, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=kernel.dtype,
        )
        + bias
    )


def _forward_from_h1(p: Params, h1: jnp.ndarray) -> jnp.ndarray:
    a = _igloo_kernel(h1, p["igloo1"], p.get("igloo1_plan"))
    h2 = _leaky_relu(_causal_conv(h1, p["conv2"]["kernel"], p["conv2"]["bias"]))
    h3 = _leaky_relu(_causal_conv(h2, p["conv3"]["kernel"], p["conv3"]["bias"]))
    b = _igloo_kernel(h3, p["igloo2"], p.get("igloo2_plan"))
    feat = jnp.concatenate([a, b], axis=-1)
    enc = jax.nn.relu(_bn(feat @ p["enc_dense"]["kernel"] + p["enc_dense"]["bias"], p["enc_bn"]))
    hid = jax.nn.relu(_bn(enc @ p["head_dense"]["kernel"] + p["head_dense"]["bias"], p["head_bn"]))
    logits = (hid @ p["out_dense"]["kernel"] + p["out_dense"]["bias"]).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)


def apply(params: Params, tokens: jnp.ndarray) -> jnp.ndarray:
    """Inference forward pass: (B, 5997) int tokens -> (B, 3) class probs.

    ``params`` must come from :func:`prepare_params`.
    """
    p = params
    h1 = _leaky_relu(_causal_embed_conv(tokens, p["conv1"]["kernel"], p["conv1"]["bias"]))
    return _forward_from_h1(p, h1)


def _pad_bases(bases: jnp.ndarray) -> jnp.ndarray:
    """Pad a (B, 6000) base-code batch with N codes out to L_PAD + 3.

    Padded token positions are masked out of every consumer and, being
    causal, never influence real positions. Profilers decomposing the
    forward (tools/profile_stages.py) must use this same helper so their
    stage inputs match apply_bases exactly."""
    return jnp.pad(bases, ((0, 0), (0, L_PAD + 3 - bases.shape[1])), constant_values=4)


def apply_bases(params: Params, bases: jnp.ndarray) -> jnp.ndarray:
    """Fast inference path from base codes: (B, 6000) int in [0, 4]
    (ACGT=0..3, N=4) -> (B, 3) class probs. Equal (to accumulation
    rounding) to ``apply(params, tokenize(bases))``: tokenizes on device
    and runs the first layer as a one-hot MXU conv, with the trunk padded
    to L_PAD so the Pallas patch reduction can tile it."""
    p = params
    bases = _pad_bases(bases)
    h1 = _leaky_relu(
        _embed_onehot_conv(_tokens_from_bases(bases), p["conv1"]["kernel"], p["conv1"]["bias"])
    )
    return _forward_from_h1(p, h1)


def apply_bases_tables(params: Params, bases: jnp.ndarray) -> jnp.ndarray:
    """Two-table embedding-gather variant of :func:`apply_bases` —
    bit-identical to the token path (see build_base_tables). Kept for
    parity testing; the one-hot conv path is faster on TPU."""
    p = params
    h1 = _leaky_relu(
        _embed_from_bases(bases, p["base_tables"], p["conv1"]["kernel"], p["conv1"]["bias"])
    )
    return _forward_from_h1(p, h1)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def _jit_apply(prepared: Params, tokens: jnp.ndarray, compute_dtype=jnp.bfloat16):
    return apply(prepared, tokens)


def make_forward(params: Params, compute_dtype=jnp.bfloat16):
    """Return a jitted (tokens -> probs) closure with prepared params."""
    prepared = prepare_params(params, compute_dtype)

    def forward(tokens: jnp.ndarray) -> jnp.ndarray:
        return _jit_apply(prepared, tokens, compute_dtype=compute_dtype)

    return forward


@functools.partial(jax.jit, static_argnames=())
def _jit_apply_bases(prepared: Params, bases: jnp.ndarray):
    return apply_bases(prepared, bases)


def make_forward_bases(params: Params, compute_dtype=jnp.bfloat16):
    """Jitted (base codes -> probs) closure — the production fast path."""
    prepared = prepare_params(params, compute_dtype)

    def forward(bases: jnp.ndarray) -> jnp.ndarray:
        return _jit_apply_bases(prepared, bases)

    return forward


# ---------------------------------------------------------------------------
# Training-mode forward (dropout active) — used by fine-tuning utilities.
# ---------------------------------------------------------------------------


def apply_train(params: Params, tokens: jnp.ndarray, rng: jax.Array, dropout_rate: float = 0.2) -> jnp.ndarray:
    """Forward pass with dropout active (SpatialDropout1D on conv stacks,
    plain Dropout on the classifier head — reference igloo.py:49-53,
    model.py:43). Returns class probabilities."""
    p = params
    k1, k2, k3, k4 = jax.random.split(rng, 4)

    def spatial_dropout(x, key):
        # Drop whole channels (SpatialDropout1D semantics)
        keep = jax.random.bernoulli(key, 1 - dropout_rate, (x.shape[0], 1, x.shape[2]))
        return jnp.where(keep, x / (1 - dropout_rate), 0)

    h1 = spatial_dropout(_leaky_relu(_causal_embed_conv(tokens, p["conv1"]["kernel"], p["conv1"]["bias"])), k1)
    a = _igloo_kernel(h1, p["igloo1"])
    h2 = spatial_dropout(_leaky_relu(_causal_conv(h1, p["conv2"]["kernel"], p["conv2"]["bias"])), k2)
    h3 = spatial_dropout(_leaky_relu(_causal_conv(h2, p["conv3"]["kernel"], p["conv3"]["bias"])), k3)
    b = _igloo_kernel(h3, p["igloo2"])
    feat = jnp.concatenate([a, b], axis=-1)
    enc = jax.nn.relu(_bn(feat @ p["enc_dense"]["kernel"] + p["enc_dense"]["bias"], p["enc_bn"]))
    hid = jax.nn.relu(_bn(enc @ p["head_dense"]["kernel"] + p["head_dense"]["bias"], p["head_bn"]))
    keep = jax.random.bernoulli(k4, 1 - dropout_rate, hid.shape)
    hid = jnp.where(keep, hid / (1 - dropout_rate), 0)
    logits = (hid @ p["out_dense"]["kernel"] + p["out_dense"]["bias"]).astype(jnp.float32)
    return jax.nn.softmax(logits, axis=-1)
