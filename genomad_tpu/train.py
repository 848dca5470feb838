"""Training utilities for the IGLOO window classifier.

The reference ships frozen weights only (training happened offline —
genomad/neural_network/model.py:34-45 freezes the encoder and trains the
classifier head). This module provides the full TPU training loop the
reference lacks: cross-entropy fine-tuning on inference-form parameters
(prepare_params output: the folded patch tensor and BN affine are a valid
reparametrization), jit/pjit-compatible, with the batch axis sharded across
the 'data' mesh axis and parameters replicated.

Integer leaves (the non-trainable patch index tensors, igloo.py:129-135
``trainable=False``) are partitioned out of the differentiated pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genomad_tpu.models import igloo


# Derived/non-trainable top-level entries (recomputed from conv1 by
# prepare_params; AdamW weight decay must never touch them).
_DERIVED_KEYS = {"base_tables", "igloo1_plan", "igloo2_plan"}


def partition_params(params: dict):
    """Split into (trainable float leaves, static/derived leaves)."""
    trainable, static = {}, {}
    for group, sub in params.items():
        if group in _DERIVED_KEYS or sub is None:
            static[group] = sub
            continue
        for name, leaf in sub.items():
            leaf = jnp.asarray(leaf)
            target = static if jnp.issubdtype(leaf.dtype, jnp.integer) else trainable
            target.setdefault(group, {})[name] = leaf
    return trainable, static


def merge_params(trainable: dict, static: dict) -> dict:
    merged = {g: dict(sub) for g, sub in trainable.items()}
    for group, sub in static.items():
        if group in _DERIVED_KEYS or not isinstance(sub, dict):
            merged[group] = sub
        else:
            merged.setdefault(group, {}).update(sub)
    return merged


class TrainState(NamedTuple):
    trainable: dict
    static: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 1e-3):
    """AdamW with the reference's l2 regularization strength as decoupled
    weight decay (igloo.py:39 l2_reg)."""
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def init_train_state(params: dict, optimizer) -> TrainState:
    trainable, static = partition_params(params)
    return TrainState(trainable, static, optimizer.init(trainable), jnp.zeros((), jnp.int32))


def loss_fn(trainable: dict, static: dict, tokens: jnp.ndarray, labels: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Mean cross-entropy of the training-mode forward pass (dropout on)."""
    probs = igloo.apply_train(merge_params(trainable, static), tokens, rng)
    log_probs = jnp.log(jnp.clip(probs, 1e-7, 1.0))
    return -jnp.mean(jnp.take_along_axis(log_probs, labels[:, None], axis=1))


def _step(optimizer, state: TrainState, tokens, labels, rng):
    loss, grads = jax.value_and_grad(loss_fn)(state.trainable, state.static, tokens, labels, rng)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
    trainable = optax.apply_updates(state.trainable, updates)
    return TrainState(trainable, state.static, opt_state, state.step + 1), loss


def make_train_step(optimizer, donate: bool = True):
    """Jittable (state, tokens, labels, rng) -> (state, loss)."""

    def train_step(state, tokens, labels, rng):
        return _step(optimizer, state, tokens, labels, rng)

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_sharded_train_step(optimizer, mesh):
    """Training step with explicit shardings: batch over 'data', parameters
    and optimizer state replicated (the model is small; pure data
    parallelism — gradient allreduce over 'data' is inserted by XLA)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))

    def train_step(state, tokens, labels, rng):
        return _step(optimizer, state, tokens, labels, rng)

    return jax.jit(
        train_step,
        in_shardings=(replicated, data_sharded, data_sharded, replicated),
        out_shardings=(replicated, replicated),
    )


def make_batches(tokens: np.ndarray, labels: np.ndarray, batch_size: int, seed: int = 0):
    """Shuffled full batches (drops the remainder)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(tokens))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        idx = order[i : i + batch_size]
        yield tokens[idx], labels[idx]
