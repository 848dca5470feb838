"""Training-loop tests: loss decreases on a separable toy task; sharded
train step matches the unsharded one."""

import jax
import jax.numpy as jnp
import numpy as np

from genomad_tpu import train
from genomad_tpu.models import igloo
from genomad_tpu.parallel import mesh as meshlib
from tests.test_igloo import make_tiny_params


def toy_data(rng, n=64, L=64, V=9):
    """Class 0 sequences use low tokens, class 2 high tokens."""
    tokens = np.zeros((n, L), np.int32)
    labels = np.zeros(n, np.int32)
    for i in range(n):
        c = i % 3
        lo, hi = {0: (0, 3), 1: (3, 6), 2: (6, 9)}[c]
        tokens[i] = rng.integers(lo, hi, L)
        labels[i] = c
    return tokens, labels


def test_training_reduces_loss(rng):
    params = igloo.prepare_params(make_tiny_params(rng), compute_dtype=jnp.float32)
    optimizer = train.make_optimizer(learning_rate=3e-3)
    state = train.init_train_state(params, optimizer)
    step = train.make_train_step(optimizer, donate=False)
    tokens, labels = toy_data(rng)
    key = jax.random.PRNGKey(0)
    first_loss = None
    for i in range(30):
        key, sub = jax.random.split(key)
        state, loss = step(state, tokens, labels, sub)
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < first_loss * 0.8, (first_loss, float(loss))
    assert int(state.step) == 30


def test_sharded_train_step_matches_unsharded(rng):
    params = igloo.prepare_params(make_tiny_params(rng), compute_dtype=jnp.float32)
    optimizer = train.make_optimizer(learning_rate=1e-3)
    tokens, labels = toy_data(rng, n=16)
    key = jax.random.PRNGKey(1)

    state_a = train.init_train_state(params, optimizer)
    step_a = train.make_train_step(optimizer, donate=False)
    state_a, loss_a = step_a(state_a, tokens, labels, key)

    mesh = meshlib.make_mesh()
    state_b = train.init_train_state(params, optimizer)
    step_b = train.make_sharded_train_step(optimizer, mesh)
    state_b, loss_b = step_b(state_b, jnp.asarray(tokens), jnp.asarray(labels), key)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for group in state_a.trainable:
        for name in state_a.trainable[group]:
            np.testing.assert_allclose(
                np.asarray(state_a.trainable[group][name]),
                np.asarray(state_b.trainable[group][name]),
                rtol=1e-4, atol=1e-6, err_msg=f"{group}/{name}",
            )
