"""Pallas SW kernel parity with the lax.scan reference kernel (interpret
mode on CPU; the compiled path runs on TPU)."""

import numpy as np
import pytest

from genomad_tpu.ops import protein_search, sw_pallas
from genomad_tpu.ops.profiledb import N_AA


def make_batch(rng, B=5, Lq=32, Lp=48):
    queries = np.full((B, Lq), 20, np.int32)
    profiles = np.zeros((B, Lp, 21), np.float32)
    for b in range(B):
        lq = int(rng.integers(8, Lq + 1))
        lp = int(rng.integers(10, Lp + 1))
        consensus = rng.integers(0, N_AA, lp)
        pssm = rng.normal(-1.5, 1.0, (lp, N_AA)).astype(np.float32)
        pssm[np.arange(lp), consensus] += rng.uniform(4, 8, lp)
        m = min(lq, lp, 10)
        q = rng.integers(0, N_AA, lq)
        q[:m] = consensus[:m]
        queries[b, :lq] = q
        profiles[b, :lp, :N_AA] = pssm
    return queries, profiles


def test_pallas_matches_lax_kernel(rng):
    queries, profiles = make_batch(rng)
    import jax.numpy as jnp

    ref_best, ref_i, ref_j = protein_search._sw_forward(
        jnp.asarray(queries), jnp.asarray(profiles)
    )
    got_best, got_i, got_j = sw_pallas.sw_forward_pallas(
        jnp.asarray(queries), jnp.asarray(profiles), tile_b=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_best), np.asarray(ref_best), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    np.testing.assert_array_equal(np.asarray(got_j), np.asarray(ref_j))


def test_pallas_batch_padding(rng):
    # B=5 with tile_b=4 exercises the pad-to-tile path
    queries, profiles = make_batch(rng, B=5)
    import jax.numpy as jnp

    got_best, _, _ = sw_pallas.sw_forward_pallas(
        jnp.asarray(queries), jnp.asarray(profiles), tile_b=4, interpret=True
    )
    assert got_best.shape == (5,)


def test_flash_kernel_matches_lax_kernel(rng):
    """Row-block staged (flash-style) kernel: bit parity with the scan
    kernel, including Lq padding to the row-block size."""
    queries, profiles = make_batch(rng, B=6, Lq=40, Lp=48)
    import jax.numpy as jnp

    ref_best, ref_i, ref_j = protein_search._sw_forward(
        jnp.asarray(queries), jnp.asarray(profiles)
    )
    got_best, got_i, got_j = sw_pallas.sw_forward_pallas_flash(
        jnp.asarray(queries), jnp.asarray(profiles),
        tile_b=4, row_block=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_best), np.asarray(ref_best), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    np.testing.assert_array_equal(np.asarray(got_j), np.asarray(ref_j))


def test_flash_t_kernel_matches_lax_kernel(rng):
    """Transposed-q flash kernel parity (interpret mode)."""
    queries, profiles = make_batch(rng, B=10, Lq=40, Lp=48)
    import jax.numpy as jnp

    ref_best, ref_i, ref_j = protein_search._sw_forward(
        jnp.asarray(queries), jnp.asarray(profiles)
    )
    got_best, got_i, got_j = sw_pallas.sw_forward_pallas_flash_t(
        jnp.asarray(queries), jnp.asarray(profiles),
        tile_b=4, row_block=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_best), np.asarray(ref_best), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    np.testing.assert_array_equal(np.asarray(got_j), np.asarray(ref_j))
