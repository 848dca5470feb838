"""Pallas patch-reduction kernel: plan construction + numeric parity with
the gather/einsum formulation (interpret mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from genomad_tpu.models import igloo
from genomad_tpu.ops import patch_reduce


@pytest.fixture
def full_size_plan(rng):
    patches = igloo.random_patches(rng)
    w_patch = rng.normal(size=(igloo.N_PATCHES, igloo.PATCH_SIZE, igloo.CHANNELS)).astype(np.float32)
    return patches, w_patch, patch_reduce.build_plan(patches, w_patch, igloo.L_PAD)


def test_plan_covers_every_slot(full_size_plan):
    patches, w_patch, plan = full_size_plan
    P, S = patches.shape
    # every (p, s) has exactly one slot; slots map back to the right tile/pos
    assert plan.idx.shape == (P, S)
    assert len(np.unique(plan.idx)) == P * S
    K = plan.k_slots
    for p, s in [(0, 0), (P // 2, 1), (P - 1, S - 1)]:
        flat = plan.idx[p, s]
        t, k = divmod(int(flat), K)
        pos = patches[p, s]
        assert t == pos // patch_reduce.TILE
        assert plan.onehot[t, pos % patch_reduce.TILE, k] == 1.0
        np.testing.assert_array_equal(plan.w_tiles[t, :, k], w_patch[p, s])


def test_patch_reduce_matches_einsum(rng, full_size_plan):
    patches, w_patch, plan = full_size_plan
    B = 2
    y = rng.normal(size=(B, igloo.L_PAD, igloo.CHANNELS)).astype(np.float32)
    got = np.asarray(
        patch_reduce.patch_reduce(
            jnp.asarray(y),
            jnp.asarray(plan.w_tiles),
            jnp.asarray(plan.onehot),
            jnp.asarray(plan.idx),
            interpret=True,
        )
    )
    ref = np.einsum("bpsc,psc->bp", y[:, patches], w_patch)
    # f32 accumulation-order differences only (tile matmul vs einsum)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_forward_pallas_vs_gather_paths(rng):
    """apply_bases with the Pallas path (interpret) matches the gather path
    bit-for-bit in f32 modulo accumulation order."""
    import os

    params = igloo.init_params(seed=7)
    prepared = igloo.prepare_params(params, compute_dtype=jnp.float32)
    bases = jnp.asarray(rng.integers(0, 5, (2, 6000)).astype(np.int32))
    os.environ["GENOMAD_TPU_PATCH_PALLAS"] = "1"
    out_pallas = np.asarray(igloo.apply_bases(prepared, bases))
    os.environ["GENOMAD_TPU_PATCH_PALLAS"] = "0"
    try:
        out_gather = np.asarray(igloo.apply_bases(prepared, bases))
    finally:
        os.environ.pop("GENOMAD_TPU_PATCH_PALLAS", None)
    np.testing.assert_allclose(out_pallas, out_gather, rtol=1e-5, atol=1e-6)


def test_fused_reduce_matches_unfused(rng, full_size_plan):
    """fused_reduce returns the same mpi as patch_reduce AND the same
    pooled value projection as the einsum + max-pool formulation."""
    patches, w_patch, plan = full_size_plan
    B = 2
    y = rng.normal(size=(B, igloo.L_PAD, igloo.CHANNELS)).astype(np.float32)
    w_v = rng.normal(size=(igloo.CHANNELS, igloo.CHANNELS)).astype(np.float32)
    mpi, pooled = patch_reduce.fused_reduce(
        jnp.asarray(y),
        jnp.asarray(plan.w_tiles),
        jnp.asarray(plan.onehot),
        jnp.asarray(plan.idx),
        jnp.asarray(w_v),
        interpret=True,
    )
    ref_mpi = np.einsum("bpsc,psc->bp", y[:, patches], w_patch)
    np.testing.assert_allclose(np.asarray(mpi), ref_mpi, rtol=1e-4, atol=1e-4)
    proj = y @ w_v
    ref_pooled = proj.reshape(B, igloo.L_PAD // patch_reduce.POOL, patch_reduce.POOL, -1).max(axis=2)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, rtol=1e-4, atol=1e-4)
