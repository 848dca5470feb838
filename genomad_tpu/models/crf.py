"""Provirus gene tagger: 2-state linear-chain CRF marginals.

Replaces the reference's CRFsuite C engine (genomad/modules/
find_proviruses.py:50-69, model file provirus_tagger.crfsuite). The 8 model
weights were extracted from the binary (format lCRF/FOMC, 2 labels {V, host},
2 continuous attributes {spm_v, spm_c}; attribute value multiplies the
feature weight):

  state:      spm_v->V +3.300215911627542   spm_v->host -3.3002159116212413
              spm_c->V -1.1674863958607502  spm_c->host +1.1674863958417414
  transition: V->V +1.4011465610478524      V->host -1.420126254348839
              host->V -1.4149055448977685   host->host +1.4338852381987928

Scoring protocol (find_proviruses.py:56-69): per-gene marginal P(V) under
the real attributes minus the marginal under empty attributes (transitions
only), then logistic(delta, temperature=0.2).

The forward-backward pass is a jax.lax.scan over gene positions, vectorized
over a padded batch of contigs — the TPU-native replacement for the
per-contig C calls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genomad_tpu import utils

# [attribute (spm_v, spm_c), label (V, host)]
STATE_WEIGHTS = np.array(
    [
        [3.300215911627542, -3.3002159116212413],
        [-1.1674863958607502, 1.1674863958417414],
    ]
)
# [from label, to label]
TRANSITION_WEIGHTS = np.array(
    [
        [1.4011465610478524, -1.420126254348839],
        [-1.4149055448977685, 1.4338852381987928],
    ]
)


def _forward_backward_marginals(state_scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Marginal P(label=V) per position for a batch of padded sequences.

    state_scores: (B, T, 2) log-potentials; mask: (B, T) 1 for real positions.
    Padded positions have their state scores zeroed and transitions into them
    disabled, making the marginal independent of padding length.
    """
    trans = jnp.asarray(TRANSITION_WEIGHTS, state_scores.dtype)
    state_scores = state_scores * mask[..., None]

    B, T, _ = state_scores.shape
    xs = (jnp.moveaxis(state_scores, 1, 0), jnp.moveaxis(mask, 1, 0))

    alpha0 = state_scores[:, 0]

    def fwd_collect(alpha, inp):
        score, m = inp
        new = score + jax.nn.logsumexp(alpha[:, :, None] + trans[None], axis=1)
        out = jnp.where(m[:, None], new, alpha)
        return out, out

    _, alpha_seq = jax.lax.scan(fwd_collect, alpha0, (xs[0][1:], xs[1][1:]))
    alpha_all = jnp.concatenate([alpha0[None], alpha_seq], axis=0)  # (T, B, 2)

    def bwd_collect(beta, inp):
        score, m = inp
        new = jax.nn.logsumexp(trans[None] + (score + beta)[:, None, :], axis=2)
        out = jnp.where(m[:, None], new, beta)
        return out, out

    beta_T = jnp.zeros((B, 2), state_scores.dtype)
    _, beta_seq = jax.lax.scan(
        bwd_collect, beta_T, (xs[0][1:][::-1], xs[1][1:][::-1])
    )
    beta_all = jnp.concatenate([beta_seq[::-1], beta_T[None]], axis=0)  # (T, B, 2)

    log_joint = alpha_all + beta_all  # (T, B, 2)
    log_z = jax.nn.logsumexp(log_joint, axis=2, keepdims=True)
    marginals = jnp.exp(log_joint - log_z)[..., 0]  # P(V), (T, B)
    return jnp.moveaxis(marginals, 0, 1)  # (B, T)


@functools.partial(jax.jit, static_argnames=())
def _score_batch(spm_v: jnp.ndarray, spm_c: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    state_w = jnp.asarray(STATE_WEIGHTS, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    attrs = jnp.stack([spm_v, spm_c], axis=-1)  # (B, T, 2)
    scores = attrs @ state_w  # (B, T, 2)
    marginals = _forward_backward_marginals(scores, mask)
    background = _forward_backward_marginals(jnp.zeros_like(scores), mask)
    delta = marginals - background
    return 1.0 / (1.0 + jnp.exp(-delta / 0.2))


def score_provirus_genes(spm_v_array, spm_c_array) -> np.ndarray:
    """Per-gene provirus scores for one contig (reference protocol,
    find_proviruses.py:56-69)."""
    spm_v = np.asarray(spm_v_array, dtype=np.float32)[None]
    spm_c = np.asarray(spm_c_array, dtype=np.float32)[None]
    n = spm_v.shape[1]
    if n == 0:
        return np.zeros(0)
    if n == 1:
        # Single gene: no transitions; background marginal is exactly 0.5.
        mask = np.ones((1, 1), np.float32)
    else:
        mask = np.ones((1, n), np.float32)
    return np.asarray(_score_batch(spm_v, spm_c, mask))[0]


def score_provirus_genes_batch(spm_v_list, spm_c_list) -> list[np.ndarray]:
    """Score many contigs at once: pad to the max gene count and run one
    batched forward-backward on device."""
    if not spm_v_list:
        return []
    lengths = [len(v) for v in spm_v_list]
    T = max(max(lengths), 1)
    B = len(spm_v_list)
    spm_v = np.zeros((B, T), np.float32)
    spm_c = np.zeros((B, T), np.float32)
    mask = np.zeros((B, T), np.float32)
    for i, (v, c) in enumerate(zip(spm_v_list, spm_c_list)):
        spm_v[i, : lengths[i]] = v
        spm_c[i, : lengths[i]] = c
        mask[i, : lengths[i]] = 1
    scores = np.asarray(_score_batch(spm_v, spm_c, mask))
    return [scores[i, : lengths[i]] for i in range(B)]
