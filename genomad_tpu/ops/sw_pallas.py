"""Pallas TPU kernel for batched affine-gap profile Smith-Waterman.

Kernel strategy (one grid program per batch tile of pairs):

  1. The full score tensor S = onehot(query) @ profile^T is computed tile-
     resident with MXU dots (per pair: (Lq, 21) @ (21, Lp)) — queries are
     int32 residue rows, profiles PSSM blocks, both staged in VMEM.
  2. The DP runs as a fori_loop over query rows. Per row, the vertical gap
     state F and the open-cell H0 are elementwise; the horizontal gap state
     E uses the closed-form prefix max (valid because gap_open >=
     gap_extend): E_j = max_{k<j}(H0_k - open + ext*k) - ext*(j-1), computed
     with a Hillis-Steele shift-max scan (log2(Lp) steps of pad/slice +
     max) entirely on the VPU.
  3. Best score and its (row, column) argmax are tracked in VMEM scratch.

The kernel matches genomad_tpu.ops.protein_search._sw_forward bit-for-bit
in f32 on real TPU hardware (interpret mode is used for CPU tests).

Measured on v5e it is NOT the production path: XLA compiles the lax.scan
kernel to full-batch (B, Lp) vector work per DP row, while this kernel is
bounded to small batch tiles by its VMEM score scratch (TB=8: ~4x slower;
TB=16: ~2x slower; TB>=32: VMEM OOM at Lq=Lp=256). It is kept as a
parity-tested alternative (GENOMAD_TPU_USE_PALLAS=1) and as the
starting point for a future flash-style tiled-DP variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from genomad_tpu.ops.protein_search import GAP_EXTEND, GAP_OPEN

NEG_INF = -1e30


def _cummax_inclusive(t: jnp.ndarray, length: int) -> jnp.ndarray:
    """Inclusive running max along axis 1 via Hillis-Steele shift-max."""
    shift = 1
    while shift < length:
        shifted = jnp.pad(t[:, :-shift], ((0, 0), (shift, 0)), constant_values=NEG_INF)
        t = jnp.maximum(t, shifted)
        shift *= 2
    return t


def _sw_kernel(q_ref, p_ref, best_ref, iend_ref, jend_ref, s_scratch):
    """One batch tile: q (TB, Lq) int32; p (TB, Lp, 21) f32.

    Outputs best (TB,), end_i (TB,), end_j (TB,). s_scratch (TB, Lq, Lp).
    """
    TB, Lq = q_ref.shape
    Lp = p_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, Lp), 1).astype(jnp.float32)

    # Stage 1: per-pair score matrix via MXU dot of one-hot(query) x PSSM.
    for b in range(TB):
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (Lq, 21), 1) == q_ref[b, :][:, None]
        ).astype(jnp.float32)
        s_scratch[b] = jax.lax.dot_general(
            onehot, p_ref[b],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # full-f32 MXU passes: the one-hot dot must reproduce the PSSM
            # entries bit-exactly for parity with the gather-based kernel
            precision=jax.lax.Precision.HIGHEST,
        )

    # Stage 2: row-scan DP. Mosaic lowering constraints on real hardware
    # (this jaxlib) shape this loop:
    #   * a fori_loop with TWO (TB, Lp) carries miscompiles ("invalid
    #     relayout ... replicated in destination") -> H and F are packed
    #     into ONE (TB, 2*Lp) carry and lane-sliced inside the step;
    #   * argmax has no working lowering -> first-index argmax via
    #     iota + where + min;
    #   * all loop state stays 2-D ((TB, x) / (TB, 1)); 1-D vectors trip
    #     the same relayout error.
    col_i = jax.lax.broadcasted_iota(jnp.int32, (TB, Lp), 1)

    def row_step(i, carry):
        hf, best, best_i, best_j = carry
        h_prev, f_prev = hf[:, :Lp], hf[:, Lp:]
        s_row = s_scratch[:, i, :]  # (TB, Lp)
        f = jnp.maximum(h_prev - GAP_OPEN, f_prev - GAP_EXTEND)
        diag = jnp.pad(h_prev[:, :-1], ((0, 0), (1, 0)))
        h0 = jnp.maximum(jnp.maximum(diag + s_row, f), 0.0)
        t = h0 - GAP_OPEN + GAP_EXTEND * col
        m = _cummax_inclusive(t, Lp)
        m = jnp.pad(m[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF)
        e = m - GAP_EXTEND * (col - 1.0)
        h = jnp.maximum(h0, e)
        row_best = jnp.max(h, axis=1, keepdims=True)  # (TB, 1)
        row_arg = jnp.min(
            jnp.where(h == row_best, col_i, Lp), axis=1, keepdims=True
        )
        improved = row_best > best
        best = jnp.where(improved, row_best, best)
        best_i = jnp.where(improved, i, best_i)
        best_j = jnp.where(improved, row_arg, best_j)
        return jnp.concatenate([h, f], axis=1), best, best_i, best_j

    init = (
        jnp.concatenate(
            [jnp.zeros((TB, Lp), jnp.float32), jnp.full((TB, Lp), NEG_INF, jnp.float32)],
            axis=1,
        ),
        jnp.zeros((TB, 1), jnp.float32),
        jnp.zeros((TB, 1), jnp.int32),
        jnp.zeros((TB, 1), jnp.int32),
    )
    _, best, best_i, best_j = jax.lax.fori_loop(0, Lq, row_step, init)
    best_ref[...] = best
    iend_ref[...] = best_i
    jend_ref[...] = best_j


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def sw_forward_pallas(queries: jnp.ndarray, profiles: jnp.ndarray, tile_b: int = 8, interpret: bool | None = None):
    """Batched SW via the Pallas kernel.

    queries: (B, Lq) int32 (pad/unknown = 20); profiles: (B, Lp, 21) f32.
    Returns (best, end_i, end_j), matching _sw_forward.
    """
    if interpret is None:
        # compiled Mosaic on TPU; interpreter everywhere else
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    B, Lq = queries.shape
    Lp = profiles.shape[1]
    pad_b = (-B) % tile_b
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)), constant_values=20)
        profiles = jnp.pad(profiles, ((0, pad_b), (0, 0), (0, 0)))
    n_tiles = queries.shape[0] // tile_b
    best, end_i, end_j = pl.pallas_call(
        _sw_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_b, Lq), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, Lp, 21), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((queries.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((queries.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((queries.shape[0], 1), jnp.int32),
        ],
        scratch_shapes=[_vmem_scratch((tile_b, Lq, Lp))],
        interpret=interpret,
    )(queries, profiles)
    return best[:B, 0], end_i[:B, 0], end_j[:B, 0]


def _vmem_scratch(shape):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM(shape, jnp.float32)
