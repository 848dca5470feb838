"""Stage-by-stage timing of the IGLOO forward pass on the attached device.

Times each component in isolation (jitted separately) to locate the
bottleneck. Not a correctness tool; numbers are per batch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from genomad_tpu.models import igloo
from genomad_tpu.ops import patch_reduce

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048


def timeit(name, fn, *args, iters=6):
    # The axon tunnel ships every jit output to host (~260 MB/s), so each
    # staged fn must reduce its output to a scalar INSIDE the jit; fn here
    # is assumed to return something tiny.
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:35s} {dt:8.2f} ms", flush=True)
    return dt


def reduced(fn):
    return jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))


def main():
    params = igloo.init_params(seed=0)
    prepared = igloo.prepare_params(params, jnp.bfloat16)
    rng = np.random.default_rng(0)
    bases = jax.device_put(rng.integers(0, 4, (BATCH, 6000)).astype(np.int32))

    full = jax.jit(lambda b: igloo.apply_bases(prepared, b))
    timeit("full forward", full, bases)

    padded = jnp.pad(bases, ((0, 0), (0, igloo.L_PAD + 3 - 6000)), constant_values=4)
    timeit("tokenize", reduced(igloo._tokens_from_bases), padded)
    tokens = jax.jit(igloo._tokens_from_bases)(padded)

    timeit(
        "conv1 (one-hot MXU)",
        reduced(lambda t: igloo._embed_onehot_conv(t, prepared["conv1"]["kernel"], prepared["conv1"]["bias"])),
        tokens,
    )

    h1 = jax.jit(lambda t: igloo._leaky_relu(igloo._embed_onehot_conv(t, prepared["conv1"]["kernel"], prepared["conv1"]["bias"])))(tokens)

    timeit(
        "conv2+conv3",
        reduced(
            lambda x: igloo._leaky_relu(
                igloo._causal_conv(
                    igloo._leaky_relu(igloo._causal_conv(x, prepared["conv2"]["kernel"], prepared["conv2"]["bias"])),
                    prepared["conv3"]["kernel"],
                    prepared["conv3"]["bias"],
                )
            )
        ),
        h1,
    )

    timeit(
        "igloo kernel (pallas plan)",
        reduced(lambda x: igloo._igloo_kernel(x, prepared["igloo1"], prepared["igloo1_plan"])),
        h1,
    )
    timeit(
        "igloo kernel (gather path)",
        reduced(lambda x: igloo._igloo_kernel(x, prepared["igloo1"], None)),
        h1,
    )
    timeit(
        "  patch_reduce alone",
        reduced(
            lambda x: patch_reduce.patch_reduce(
                x,
                prepared["igloo1_plan"]["w_tiles"],
                prepared["igloo1_plan"]["onehot"],
                prepared["igloo1_plan"]["idx"],
            )
        ),
        h1,
    )
    timeit(
        "  value proj alone",
        reduced(lambda x: jnp.einsum("blc,cd->bld", x, prepared["igloo1"]["w_v"], preferred_element_type=jnp.float32)),
        h1,
    )

    feat = jnp.zeros((BATCH, 256), jnp.bfloat16)
    timeit(
        "head dense (first)",
        reduced(
            lambda f: jax.nn.relu(
                igloo._bn(f @ prepared["enc_dense"]["kernel"] + prepared["enc_dense"]["bias"], prepared["enc_bn"])
            )
        ),
        feat,
    )


# appended: fused igloo kernel timing
def extra():
    params = igloo.init_params(seed=0)
    prepared = igloo.prepare_params(params, jnp.bfloat16)
    rng = np.random.default_rng(0)
    bases = jax.device_put(rng.integers(0, 4, (BATCH, 6000)).astype(np.int32))
    padded = jnp.pad(bases, ((0, 0), (0, igloo.L_PAD + 3 - 6000)), constant_values=4)
    tokens = jax.jit(igloo._tokens_from_bases)(padded)
    h1 = jax.jit(lambda t: igloo._leaky_relu(igloo._embed_onehot_conv(t, prepared["conv1"]["kernel"], prepared["conv1"]["bias"])))(tokens)
    timeit(
        "igloo kernel (fused)",
        reduced(lambda x: igloo._igloo_kernel(x, prepared["igloo1"], prepared["igloo1_plan"])),
        h1,
    )


if __name__ == "__main__":
    main()
    if len(sys.argv) > 2 and sys.argv[2] == "extra":
        extra()
