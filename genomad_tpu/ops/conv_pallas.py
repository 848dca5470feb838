"""Pallas TPU kernels for the IGLOO causal convolutions.

Replaces two XLA convolutions that profiling (tools/profile_stages.py,
docs/performance.md) showed running at ~50% MFU with ~10 GB of avoidable
HBM traffic per batch:

  * ``causal_conv`` — width-6 causal conv (B, L, C) -> (B, L, C) for the
    conv2/conv3 stacks: per grid program, one (TB, TL, C) tile plus a
    5-row halo from the previous L-block stays VMEM-resident while the 6
    taps run as MXU matmuls accumulated in f32; bias and LeakyReLU fuse
    into the same pass.

  * ``embed_conv`` — the first layer: width-6 causal conv over one-hot
    tokens. XLA's formulation materializes the (B, L, 257) one-hot to HBM
    (6.3 GB/batch at B=2048) and pads the 257-deep contraction to 384 on
    the 128x128 MXU. Here the one-hot is built per tap in VMEM and split
    exactly: a 256-wide matmul over ``one_hot(tokens - 1, 256)`` (tokens
    1..256; the N token 0 maps to the all-zero row) plus a VPU rank-1
    correction ``n_mask x W_k[0]`` that restores the N row — zero padding
    waste, no one-hot ever leaves VMEM.

Both kernels are bit-compared against the XLA formulations in
tests/test_conv_pallas.py (interpret mode on CPU; compiled on TPU) and
selected automatically on TPU by genomad_tpu.models.igloo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_SIZE = 6
HALO = K_SIZE - 1
LEAKY_SLOPE = 0.1


def enabled() -> bool:
    platform = jax.devices()[0].platform
    return platform in ("tpu", "axon")


def _leaky(x):
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x)


# ---------------------------------------------------------------------------
# Dense causal conv (conv2 / conv3)
# ---------------------------------------------------------------------------


def _conv_kernel(halo_ref, x_cur, w_ref, b_ref, o_ref, *, apply_leaky):
    TB, TL, C = x_cur.shape
    # causal left context: the 5 rows before this block, precomputed as a
    # compact (B, nL, HALO, C) tensor — fetching the whole previous block
    # for 5 rows would double the kernel's HBM read traffic
    halo = halo_ref[...].reshape(TB, HALO, C)
    xext = jnp.concatenate([halo, x_cur[...]], axis=1)  # (TB, TL+HALO, C)
    acc = jnp.zeros((TB * TL, C), jnp.float32)
    for k in range(K_SIZE):
        xs = xext[:, k : k + TL, :].reshape(TB * TL, C)
        acc += jax.lax.dot_general(
            xs,
            w_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = acc + b_ref[...].astype(jnp.float32)
    if apply_leaky:
        out = _leaky(out)
    o_ref[...] = out.reshape(TB, TL, C).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_l", "apply_leaky", "interpret")
)
def causal_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    tile_b: int = 16,
    tile_l: int = 376,
    apply_leaky: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Width-6 causal conv + bias (+ LeakyReLU): (B, L, C) -> (B, L, C).

    B must divide by tile_b and L by tile_l. tile_l only needs 8-alignment
    (it is the sublane axis; C is the lane axis), so the default 376
    divides the production trunk length L_PAD = 6016 = 16 x 376.
    """
    if interpret is None:
        interpret = not enabled()
    B, L, C = x.shape
    assert B % tile_b == 0 and L % tile_l == 0, (x.shape, tile_b, tile_l)
    n_l = L // tile_l
    grid = (B // tile_b, n_l)
    bias2d = jnp.asarray(bias, x.dtype).reshape(1, C)
    # compact per-block halo: halos[:, j] = x rows [j*TL - HALO, j*TL)
    # (zeros for j = 0 — the conv's causal zero padding)
    xp = jnp.concatenate([jnp.zeros((B, HALO, C), x.dtype), x[:, : L - HALO]], axis=1)
    halos = xp.reshape(B, n_l, tile_l, C)[:, :, :HALO, :]
    return pl.pallas_call(
        functools.partial(_conv_kernel, apply_leaky=apply_leaky),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, 1, HALO, C), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((tile_b, tile_l, C), lambda i, j: (i, j, 0)),
            pl.BlockSpec((K_SIZE, C, C), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, C), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, tile_l, C), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        interpret=interpret,
    )(halos, x, jnp.asarray(kernel, x.dtype), bias2d)


# ---------------------------------------------------------------------------
# One-hot embedding conv (conv1)
# ---------------------------------------------------------------------------


def _embed_kernel(t_prev, t_cur, w_ref, w0_ref, b_ref, o_ref, *, apply_leaky):
    TB, TL = t_cur.shape
    C = o_ref.shape[2]
    j = pl.program_id(1)
    # left context tokens; -1 = causal padding (contributes nothing: its
    # one-hot row is zero AND it is not the N token)
    halo = jnp.where(j > 0, t_prev[:, TL - HALO :], -1)
    text = jnp.concatenate([halo, t_cur[...]], axis=1)  # (TB, TL+HALO) int32
    acc = jnp.zeros((TB * TL, C), jnp.float32)
    for k in range(K_SIZE):
        tok = text[:, k : k + TL].reshape(TB * TL)
        # exact 256-wide contraction: tokens 1..256 -> rows 0..255; both the
        # N token (0) and causal padding (-1) give an all-zero one-hot row
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (TB * TL, 256), 1) == (tok - 1)[:, None]
        ).astype(w_ref.dtype)
        acc += jax.lax.dot_general(
            oh,
            w_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # VPU rank-1 correction restores W_k[0] for N tokens
        n_mask = (tok == 0).astype(jnp.float32)
        acc += n_mask[:, None] * w0_ref[k].astype(jnp.float32)
    out = acc + b_ref[...].astype(jnp.float32)
    if apply_leaky:
        out = _leaky(out)
    o_ref[...] = out.reshape(TB, TL, C).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_l", "apply_leaky", "interpret")
)
def embed_conv(
    tokens: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    tile_b: int = 16,
    tile_l: int = 376,
    apply_leaky: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """First-layer causal one-hot conv + bias (+ LeakyReLU).

    tokens: (B, L) int32 in [0, 256]; kernel: (6, 257, C). B must divide by
    tile_b and L by tile_l.
    """
    if interpret is None:
        interpret = not enabled()
    B, L = tokens.shape
    assert B % tile_b == 0 and L % tile_l == 0, (tokens.shape, tile_b, tile_l)
    C = kernel.shape[2]
    grid = (B // tile_b, L // tile_l)
    dtype = kernel.dtype
    w_main = jnp.asarray(kernel[:, 1:, :], dtype)  # (6, 256, C)
    w0 = jnp.asarray(kernel[:, 0, :], dtype)  # (6, C) N-token rows
    bias2d = jnp.asarray(bias, dtype).reshape(1, C)
    return pl.pallas_call(
        functools.partial(_embed_kernel, apply_leaky=apply_leaky),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, tile_l), lambda i, j: (i, jnp.maximum(j - 1, 0))),
            pl.BlockSpec((tile_b, tile_l), lambda i, j: (i, j)),
            pl.BlockSpec((K_SIZE, 256, C), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((K_SIZE, C), lambda i, j: (0, 0)),
            pl.BlockSpec((1, C), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, tile_l, C), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, C), dtype),
        interpret=interpret,
    )(tokens, tokens, w_main, w0, bias2d)
