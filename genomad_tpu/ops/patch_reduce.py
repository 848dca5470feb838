"""Pallas TPU kernel for the IGLOO patch reduction.

The IGLOO kernel needs mpi[b, p] = sum_{s} dot(y[b, I[p, s], :], w[p, s, :])
for 2,100 static 4-position patches (reference: igloo.py:190-196). As an
XLA gather + einsum this is bound by gather throughput (~100 GB/s on v5e:
~8 ms at batch 512); the access pattern is static, so it can be turned
into MXU work instead:

  1. The feature map is tiled along the position axis (tile = 128). Each
     (p, s) slot falls in exactly one tile; the slot weights w[p, s, :] of a
     tile form a (C, K) matrix (K = padded slot capacity).
  2. Per (batch block, tile) the kernel computes M = Y_tile @ W_tile on the
     MXU — the dot of EVERY tile position with every slot — and reduces
     M * OH over positions on the VPU, where OH[x, k] = 1 iff slot k's
     position is x. This computes each slot's dot product exactly (the
     redundant position-slot dots are masked out) without any gather.
  3. The (B, T, K) slot values are mapped back to patches with a static
     width-4 index gather + sum (17 MB of f32 traffic — negligible).

Requires the feature-map length padded to a tile multiple (the model runs
its trunk at L_PAD = 6016 for this; positions past 5,997 are masked out of
every consumer). ~4.3 ms at batch 512 vs ~8.3 ms for the gather form.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILE = 128


@dataclass
class PatchPlan:
    """Static tiling of a patch set (host numpy; becomes jit arguments)."""

    w_tiles: np.ndarray  # (T, C, K) slot weight matrices
    onehot: np.ndarray  # (T, TILE, K) slot position masks
    idx: np.ndarray  # (P, S) flat slot index (tile * K + slot)
    l_pad: int

    @property
    def n_tiles(self) -> int:
        return self.w_tiles.shape[0]

    @property
    def k_slots(self) -> int:
        return self.w_tiles.shape[2]


def build_plan(patches: np.ndarray, w_patch: np.ndarray, l_pad: int) -> PatchPlan:
    """patches (P, S) int positions; w_patch (P, S, C) folded reduction
    weights (see igloo.prepare_params). l_pad must be a TILE multiple
    covering every position."""
    P, S = patches.shape
    C = w_patch.shape[2]
    assert l_pad % TILE == 0 and patches.max() < l_pad
    T = l_pad // TILE
    flat_pos = np.asarray(patches, np.int64).reshape(-1)
    flat_w = np.asarray(w_patch, np.float32).reshape(P * S, C)
    tile_of = flat_pos // TILE
    x_of = flat_pos % TILE
    counts = np.bincount(tile_of, minlength=T)
    K = max(TILE, int(-(-counts.max() // TILE) * TILE))
    w_tiles = np.zeros((T, C, K), np.float32)
    onehot = np.zeros((T, TILE, K), np.float32)
    idx = np.zeros(P * S, np.int32)
    fill = np.zeros(T, np.int64)
    for k, (t, x) in enumerate(zip(tile_of, x_of)):
        slot = fill[t]
        fill[t] += 1
        w_tiles[t, :, slot] = flat_w[k]
        onehot[t, x, slot] = 1.0
        idx[k] = t * K + slot
    return PatchPlan(w_tiles, onehot, idx.reshape(P, S), l_pad)


POOL = 8


def _kernel_fused(y_ref, w_ref, oh_ref, wv_ref, slot_ref, pool_ref):
    """Patch reduction + value projection + POOLx max-pool in one pass.

    Reads each (bb, TILE, C) feature-map block ONCE and produces both
    IGLOO kernel operands, so the full-length value projection never
    round-trips HBM (the unfused forward writes and re-reads a whole
    (B, L, C) tensor just to max-pool it 8x — pure bandwidth waste).
    TILE is a POOL multiple and tiles are aligned, so pooling windows
    never cross block boundaries.
    """
    bb, tile, c = y_ref.shape
    k = w_ref.shape[2]
    # f32 inputs signal a parity run: force true-f32 MXU passes (the
    # default multiplies f32 operands in bf16). bf16 production inputs
    # are exact under f32 accumulation either way.
    prec = jax.lax.Precision.HIGHEST if y_ref.dtype == jnp.float32 else None
    y2 = y_ref[...].reshape(bb * tile, c)
    m = jax.lax.dot_general(
        y2,
        w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).reshape(bb, tile, k)
    slot_ref[0] = jnp.sum(m * oh_ref[0], axis=1)
    v = jax.lax.dot_general(
        y2,
        wv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).reshape(bb, tile // POOL, POOL, c)
    pool_ref[0] = jnp.max(v, axis=2).astype(pool_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_values(
    y: jnp.ndarray,
    w_tiles: jnp.ndarray,
    onehot: jnp.ndarray,
    w_v: jnp.ndarray,
    interpret: bool = False,
):
    """(B, L_pad, C) -> ((B, T * K) f32 slot dots, (B, L_pad / POOL, C)
    pooled value projection)."""
    B = y.shape[0]
    T, C, K = w_tiles.shape
    bb = 64 if B % 64 == 0 else 8
    pad = (-B) % bb
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0), (0, 0)))
    slots, pooled = pl.pallas_call(
        _kernel_fused,
        grid=((B + pad) // bb, T),
        in_specs=[
            pl.BlockSpec((bb, TILE, C), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, C, K), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, TILE, K), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((C, C), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bb, K), lambda i, j: (j, i, 0)),
            pl.BlockSpec((1, bb, TILE // POOL, C), lambda i, j: (j, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B + pad, K), jnp.float32),
            jax.ShapeDtypeStruct((T, B + pad, TILE // POOL, C), y.dtype),
        ],
        interpret=interpret,
    )(y, w_tiles.astype(y.dtype), onehot, w_v.astype(y.dtype))
    slots = jnp.swapaxes(slots, 0, 1)[:B].reshape(B, T * K)
    pooled = jnp.swapaxes(pooled, 0, 1)[:B].reshape(B, T * (TILE // POOL), C)
    return slots, pooled


def fused_reduce(
    y: jnp.ndarray,
    w_tiles: jnp.ndarray,
    onehot: jnp.ndarray,
    idx: jnp.ndarray,
    w_v: jnp.ndarray,
    interpret: bool | None = None,
):
    """(mpi (B, P) f32, pooled (B, L_pad / POOL, C)) for a padded feature
    map y (B, L_pad, C). pooled rows past the real sequence's pooled
    length are garbage (fed from padding) — callers must slice them off."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    g, pooled = _fused_values(y, w_tiles, onehot, w_v, interpret=interpret)
    P, S = idx.shape
    mpi = jnp.take(g, idx.reshape(-1), axis=1).reshape(y.shape[0], P, S).sum(-1)
    return mpi, pooled


def _kernel(y_ref, w_ref, oh_ref, out_ref):
    bb, tile, c = y_ref.shape
    k = w_ref.shape[2]
    prec = jax.lax.Precision.HIGHEST if y_ref.dtype == jnp.float32 else None
    m = jax.lax.dot_general(
        y_ref[...].reshape(bb * tile, c),
        w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).reshape(bb, tile, k)
    out_ref[0] = jnp.sum(m * oh_ref[0], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _slot_values(y: jnp.ndarray, w_tiles: jnp.ndarray, onehot: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(B, L_pad, C) -> (B, T * K) f32 per-slot dot products."""
    B = y.shape[0]
    T, C, K = w_tiles.shape
    bb = 64 if B % 64 == 0 else 8
    pad = (-B) % bb
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0), (0, 0)))
    g = pl.pallas_call(
        _kernel,
        grid=((B + pad) // bb, T),
        in_specs=[
            pl.BlockSpec((bb, TILE, C), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, C, K), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, TILE, K), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bb, K), lambda i, j: (j, i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B + pad, K), jnp.float32),
        interpret=interpret,
    )(y, w_tiles.astype(y.dtype), onehot)
    return jnp.swapaxes(g, 0, 1)[:B].reshape(B, T * K)


def patch_reduce(y: jnp.ndarray, w_tiles: jnp.ndarray, onehot: jnp.ndarray, idx: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """mpi (B, P) f32 for a padded feature map y (B, L_pad, C)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    g = _slot_values(y, w_tiles, onehot, interpret=interpret)
    P, S = idx.shape
    return jnp.take(g, idx.reshape(-1), axis=1).reshape(y.shape[0], P, S).sum(-1)


def enabled() -> bool:
    return os.environ.get("GENOMAD_TPU_PATCH_PALLAS", "1") == "1"
