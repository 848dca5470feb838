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

Three kernels live here, all bit-parity-tested against the lax.scan
kernel (tests/test_sw_pallas.py):

  * ``sw_forward_pallas`` — round 1: full (TB, Lq, Lp) score scratch.
  * ``sw_forward_pallas_flash`` — row-block staged scores ((TB, RB, Lp)
    scratch, RB on the 128-lane axis), batch-tile grid axis 0, row-block
    grid axis 1 with DP state persisted in VMEM scratch across blocks.
  * ``sw_forward_pallas_flash_t`` — queries fed transposed so TB is the
    lane axis (TB=128+, RB=8/16), maximizing VPU row-op density.

Measured on v5e-1 (round 2), B x Lq x Lp alignment cells, f32:

  | kernel                      | B=4096, 256x256 | B=256, 256x256 |
  |-----------------------------|-----------------|----------------|
  | lax.scan (XLA while loop)   |    9.3 GCUPS    |    2.7 GCUPS   |
  | pallas round-1 (TB=8)       |    2.1          |      —         |
  | pallas flash  (TB=32,RB=128)|    6.3          |      —         |
  | pallas flash_t(TB=128,RB=16)| compile crash*  |    3.9         |

  *grids past ~(4, 32) programs crash this environment's experimental
  axon remote-compile helper (HTTP 500 from tpu_compile_helper) — the
  kernel itself compiles and matches bit-for-bit at smaller grids, and
  TB=48/64 variants of `flash` hit the same crash, so the scaling
  experiment that would settle flash_t vs scan at production batch is
  blocked by the toolchain, not by the kernel design.

Conclusion (VERDICT r1 next #7): the lax.scan kernel IS the production
design at production batch sizes — XLA streams the (B, Lp) carries at
full HBM bandwidth and amortizes per-row overhead across the whole batch,
which the VMEM-resident Pallas tiles only approach (6.3 vs 9.3) before
the toolchain blocks larger tiles. flash_t is 1.5x faster than scan for
small batches (B<=256) and is kept parity-tested for that regime and for
retesting on a non-tunneled toolchain.
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


# ---------------------------------------------------------------------------
# Flash-style variant: row-block staged scores
# ---------------------------------------------------------------------------
#
# The kernel above stages the FULL (TB, Lq, Lp) score tensor in VMEM, which
# caps TB at ~16 and leaves the VPU underutilized (a (8, 256) row op uses 2
# of 8 sublanes). This variant stages scores for ROW_BLOCK query rows at a
# time ((TB, RB, Lp) scratch), so TB can grow until the VPU row op is fully
# dense — the flash-attention memory trick applied to sequence DP
# (VERDICT round 1, next #7).


def _sw_kernel_flash(q_ref, p_ref, best_ref, iend_ref, jend_ref,
                     s_blk, hf_ref, best_s, besti_s, bestj_s):
    """Grid (n_tiles, n_blocks): program (i, j) advances pair tile i by one
    RB-row block. TPU grids iterate sequentially over the trailing axis, so
    the DP state lives in VMEM scratch across j steps (hf_ref packs H and F
    lane-concatenated; best/argmax in their own scratch), and Pallas
    pipelines the (TB, RB) query blocks via the BlockSpec index map — no
    dynamic lane slicing inside the kernel (Mosaic rejects it).

    q_ref: (TB, RB) int32 rows of this block; p_ref: (TB, Lp, 21) f32.
    """
    TB, RB = q_ref.shape
    Lp = p_ref.shape[1]
    blk = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, Lp), 1).astype(jnp.float32)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (TB, Lp), 1)

    @pl.when(blk == 0)
    def _init():
        hf_ref[:, :Lp] = jnp.zeros((TB, Lp), jnp.float32)
        hf_ref[:, Lp:] = jnp.full((TB, Lp), NEG_INF, jnp.float32)
        best_s[...] = jnp.zeros((TB, 1), jnp.float32)
        besti_s[...] = jnp.zeros((TB, 1), jnp.int32)
        bestj_s[...] = jnp.zeros((TB, 1), jnp.int32)

    # stage this block's score rows: one-hot(q rows) @ PSSM on the MXU
    for b in range(TB):
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (RB, 21), 1) == q_ref[b, :][:, None]
        ).astype(jnp.float32)
        s_blk[b] = jax.lax.dot_general(
            onehot,
            p_ref[b],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def row_step(r, c):
        hf, best, best_i, best_j = c
        h_prev, f_prev = hf[:, :Lp], hf[:, Lp:]
        s_row = s_blk[:, r, :]  # (TB, Lp)
        f = jnp.maximum(h_prev - GAP_OPEN, f_prev - GAP_EXTEND)
        diag = jnp.pad(h_prev[:, :-1], ((0, 0), (1, 0)))
        h0 = jnp.maximum(jnp.maximum(diag + s_row, f), 0.0)
        t = h0 - GAP_OPEN + GAP_EXTEND * col
        m = _cummax_inclusive(t, Lp)
        m = jnp.pad(m[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF)
        e = m - GAP_EXTEND * (col - 1.0)
        h = jnp.maximum(h0, e)
        row_best = jnp.max(h, axis=1, keepdims=True)
        row_arg = jnp.min(
            jnp.where(h == row_best, col_i, Lp), axis=1, keepdims=True
        )
        improved = row_best > best
        best = jnp.where(improved, row_best, best)
        best_i = jnp.where(improved, blk * RB + r, best_i)
        best_j = jnp.where(improved, row_arg, best_j)
        return jnp.concatenate([h, f], axis=1), best, best_i, best_j

    init = (hf_ref[...], best_s[...], besti_s[...], bestj_s[...])
    hf, best, best_i, best_j = jax.lax.fori_loop(0, RB, row_step, init)
    hf_ref[...] = hf
    best_s[...] = best
    besti_s[...] = best_i
    bestj_s[...] = best_j

    @pl.when(blk == n_blocks - 1)
    def _emit():
        best_ref[...] = best_s[...]
        iend_ref[...] = besti_s[...]
        jend_ref[...] = bestj_s[...]


@functools.partial(jax.jit, static_argnames=("tile_b", "row_block", "interpret"))
def sw_forward_pallas_flash(
    queries: jnp.ndarray,
    profiles: jnp.ndarray,
    tile_b: int = 32,
    row_block: int = 128,
    interpret: bool | None = None,
):
    """Batched SW via the flash-style row-block kernel.

    ``row_block`` must be a multiple of 128 on real TPUs (the q block's lane
    dimension); interpret mode accepts any value.

    queries: (B, Lq) int32 (pad/unknown = 20); profiles: (B, Lp, 21) f32.
    Returns (best, end_i, end_j), matching _sw_forward. Padding rows added
    here score 0 everywhere, so extra DP rows cannot change results.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    B, Lq = queries.shape
    Lp = profiles.shape[1]
    pad_b = (-B) % tile_b
    pad_q = (-Lq) % row_block
    if pad_q:
        queries = jnp.pad(queries, ((0, 0), (0, pad_q)), constant_values=20)
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)), constant_values=20)
        profiles = jnp.pad(profiles, ((0, pad_b), (0, 0), (0, 0)))
    n_tiles = queries.shape[0] // tile_b
    n_blocks = queries.shape[1] // row_block
    from jax.experimental.pallas import tpu as pltpu

    best, end_i, end_j = pl.pallas_call(
        _sw_kernel_flash,
        grid=(n_tiles, n_blocks),
        in_specs=[
            pl.BlockSpec((tile_b, row_block), lambda i, j: (i, j)),
            pl.BlockSpec((tile_b, Lp, 21), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((queries.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((queries.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((queries.shape[0], 1), jnp.int32),
        ],
        scratch_shapes=[
            _vmem_scratch((tile_b, row_block, Lp)),
            _vmem_scratch((tile_b, 2 * Lp)),
            _vmem_scratch((tile_b, 1)),
            pltpu.VMEM((tile_b, 1), jnp.int32),
            pltpu.VMEM((tile_b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(queries, profiles)
    return best[:B, 0], end_i[:B, 0], end_j[:B, 0]


# ---------------------------------------------------------------------------
# Transposed-q flash variant: TB on the lane axis
# ---------------------------------------------------------------------------
#
# The (TB, RB) q block above forces RB to be the 128-lane axis, so the score
# scratch is (TB, 128, Lp) and VMEM caps TB at 32 — short of the ~64+ the
# VPU needs for full row-op density. Feeding q TRANSPOSED ((Lq, B) layout)
# makes TB the lane axis: RB can drop to 8-16 rows, the scratch shrinks
# ~8x, and TB reaches 128 (a (128, Lp) row op saturates all 8 sublanes).


def _sw_kernel_flash_t(q_ref, p_ref, best_ref, iend_ref, jend_ref,
                       s_blk, hf_ref, best_s, besti_s, bestj_s):
    """Grid (n_tiles, n_blocks); q_ref (RB, TB) int32 (transposed rows of
    this block); p_ref (TB, Lp, 21) f32; s_blk (TB, RB, Lp) scratch."""
    RB, TB = q_ref.shape
    Lp = p_ref.shape[1]
    blk = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, Lp), 1).astype(jnp.float32)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (TB, Lp), 1)

    @pl.when(blk == 0)
    def _init():
        hf_ref[:, :Lp] = jnp.zeros((TB, Lp), jnp.float32)
        hf_ref[:, Lp:] = jnp.full((TB, Lp), NEG_INF, jnp.float32)
        best_s[...] = jnp.zeros((TB, 1), jnp.float32)
        besti_s[...] = jnp.zeros((TB, 1), jnp.int32)
        bestj_s[...] = jnp.zeros((TB, 1), jnp.int32)

    # one-hot for ALL pairs at once — a (RB, TB, 21) elementwise compare.
    # Extracting q_ref[:, b] per pair would read a single LANE as a vector
    # (cross-lane relayout, which Mosaic rejects); slicing oh[:, b, :] below
    # is a sublane slice of a 3-D value, which lowers cleanly.
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (RB, TB, 21), 2) == q_ref[...][:, :, None]
    ).astype(jnp.float32)
    for b in range(TB):
        s_blk[b] = jax.lax.dot_general(
            oh[:, b, :],
            p_ref[b],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def row_step(r, c):
        hf, best, best_i, best_j = c
        h_prev, f_prev = hf[:, :Lp], hf[:, Lp:]
        s_row = s_blk[:, r, :]  # (TB, Lp)
        f = jnp.maximum(h_prev - GAP_OPEN, f_prev - GAP_EXTEND)
        diag = jnp.pad(h_prev[:, :-1], ((0, 0), (1, 0)))
        h0 = jnp.maximum(jnp.maximum(diag + s_row, f), 0.0)
        t = h0 - GAP_OPEN + GAP_EXTEND * col
        m = _cummax_inclusive(t, Lp)
        m = jnp.pad(m[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF)
        e = m - GAP_EXTEND * (col - 1.0)
        h = jnp.maximum(h0, e)
        row_best = jnp.max(h, axis=1, keepdims=True)
        row_arg = jnp.min(
            jnp.where(h == row_best, col_i, Lp), axis=1, keepdims=True
        )
        improved = row_best > best
        best = jnp.where(improved, row_best, best)
        best_i = jnp.where(improved, blk * RB + r, best_i)
        best_j = jnp.where(improved, row_arg, best_j)
        return jnp.concatenate([h, f], axis=1), best, best_i, best_j

    init = (hf_ref[...], best_s[...], besti_s[...], bestj_s[...])
    hf, best, best_i, best_j = jax.lax.fori_loop(0, RB, row_step, init)
    hf_ref[...] = hf
    best_s[...] = best
    besti_s[...] = best_i
    bestj_s[...] = best_j

    @pl.when(blk == n_blocks - 1)
    def _emit():
        best_ref[...] = best_s[...]
        iend_ref[...] = besti_s[...]
        jend_ref[...] = bestj_s[...]


@functools.partial(jax.jit, static_argnames=("tile_b", "row_block", "interpret"))
def sw_forward_pallas_flash_t(
    queries: jnp.ndarray,
    profiles: jnp.ndarray,
    tile_b: int = 128,
    row_block: int = 16,
    interpret: bool | None = None,
):
    """Batched SW via the transposed-q flash kernel.

    queries: (B, Lq) int32 (pad/unknown = 20); profiles: (B, Lp, 21) f32.
    Returns (best, end_i, end_j), matching _sw_forward. ``tile_b`` must be
    a multiple of 128 on real TPUs (lane axis); ``row_block`` of 8.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    B, Lq = queries.shape
    Lp = profiles.shape[1]
    pad_b = (-B) % tile_b
    pad_q = (-Lq) % row_block
    if pad_q:
        queries = jnp.pad(queries, ((0, 0), (0, pad_q)), constant_values=20)
    if pad_b:
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)), constant_values=20)
        profiles = jnp.pad(profiles, ((0, pad_b), (0, 0), (0, 0)))
    q_t = jnp.swapaxes(queries, 0, 1)  # (Lq_pad, B_pad)
    n_tiles = queries.shape[0] // tile_b
    n_blocks = queries.shape[1] // row_block
    from jax.experimental.pallas import tpu as pltpu

    best, end_i, end_j = pl.pallas_call(
        _sw_kernel_flash_t,
        grid=(n_tiles, n_blocks),
        in_specs=[
            pl.BlockSpec((row_block, tile_b), lambda i, j: (j, i)),
            pl.BlockSpec((tile_b, Lp, 21), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((queries.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((queries.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((queries.shape[0], 1), jnp.int32),
        ],
        scratch_shapes=[
            _vmem_scratch((tile_b, row_block, Lp)),
            _vmem_scratch((tile_b, 2 * Lp)),
            _vmem_scratch((tile_b, 1)),
            pltpu.VMEM((tile_b, 1), jnp.int32),
            pltpu.VMEM((tile_b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q_t, profiles)
    return best[:B, 0], end_i[:B, 0], end_j[:B, 0]
