"""Pallas causal-conv kernels: parity with the XLA conv formulations."""

import numpy as np
import jax.numpy as jnp

from genomad_tpu.models import igloo
from genomad_tpu.ops import conv_pallas


def test_causal_conv_matches_xla(rng):
    B, L, C = 8, 512, 128
    x = jnp.asarray(rng.normal(0, 1, (B, L, C)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(0, 0.2, (6, C, C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.2, C).astype(np.float32))
    ref = igloo._leaky_relu(igloo._causal_conv(x, kernel, bias))
    got = conv_pallas.causal_conv(
        x, kernel, bias, tile_b=4, tile_l=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_causal_conv_no_leaky(rng):
    B, L, C = 4, 256, 128
    x = jnp.asarray(rng.normal(0, 1, (B, L, C)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(0, 0.2, (6, C, C)).astype(np.float32))
    bias = jnp.zeros(C, np.float32)
    ref = igloo._causal_conv(x, kernel, bias)
    got = conv_pallas.causal_conv(
        x, kernel, bias, tile_b=4, tile_l=128, apply_leaky=False, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_embed_conv_matches_xla(rng):
    B, L, C = 8, 512, 128
    tokens = rng.integers(0, 257, (B, L)).astype(np.int32)
    tokens[0, :32] = 0  # N runs exercise the rank-1 correction
    tokens[1, ::7] = 0
    tokens_d = jnp.asarray(tokens)
    kernel = jnp.asarray(rng.normal(0, 0.2, (6, 257, C)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.2, C).astype(np.float32))
    ref = igloo._leaky_relu(igloo._embed_onehot_conv(tokens_d, kernel, bias))
    got = conv_pallas.embed_conv(
        tokens_d, kernel, bias, tile_b=4, tile_l=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
