"""Per-stage timing of the IGLOO forward on the attached device."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genomad_tpu.models import igloo  # noqa: E402


# module-scope so the jit cache hits after the first warmup call; a fresh
# lambda per sync() would retrace+compile inside the timed region
_SUM = jax.jit(lambda xs: sum(x.sum().astype(np.float32) for x in xs))


def sync(out):
    # scalar reduction -> tiny host transfer (the axon tunnel makes full
    # tensor transfers prohibitively slow; block_until_ready is unreliable)
    np.asarray(_SUM(jax.tree_util.tree_leaves(out)))


def timeit(fn, *args, iters=6):
    sync(fn(*args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    params = igloo.init_params(seed=0)
    prepared = igloo.prepare_params(params, compute_dtype=jnp.bfloat16)
    B = 2048
    rng = np.random.default_rng(0)
    bases = jax.device_put(rng.integers(0, 4, (B, 6000)).astype(np.int32))

    @jax.jit
    def full(p, bases):
        return igloo.apply_bases(p, bases)

    @jax.jit
    def tok(p, bases):
        return igloo._tokens_from_bases(igloo._pad_bases(bases))

    @jax.jit
    def conv1(p, bases):
        t = igloo._tokens_from_bases(igloo._pad_bases(bases))
        return igloo._leaky_relu(
            igloo._embed_onehot_conv(t, p["conv1"]["kernel"], p["conv1"]["bias"])
        )

    h1 = conv1(prepared, bases)
    sync(h1)

    @jax.jit
    def conv23(p, h1):
        h2 = igloo._leaky_relu(igloo._causal_conv(h1, p["conv2"]["kernel"], p["conv2"]["bias"]))
        h3 = igloo._leaky_relu(igloo._causal_conv(h2, p["conv3"]["kernel"], p["conv3"]["bias"]))
        return h3

    h3 = conv23(prepared, h1)
    sync(h3)

    @jax.jit
    def ig1(p, h1):
        return igloo._igloo_kernel(h1, p["igloo1"], p.get("igloo1_plan"))

    @jax.jit
    def rest(p, h1):
        return igloo._forward_from_h1(p, h1)

    print(f"full forward      : {timeit(full, prepared, bases):8.2f} ms")
    print(f"tokenize          : {timeit(tok, prepared, bases):8.2f} ms")
    print(f"conv1 (one-hot)   : {timeit(conv1, prepared, bases):8.2f} ms")
    print(f"conv2+conv3       : {timeit(conv23, prepared, h1):8.2f} ms")
    print(f"igloo kernel (x1) : {timeit(ig1, prepared, h1):8.2f} ms")
    print(f"from h1 (rest)    : {timeit(rest, prepared, h1):8.2f} ms")


if __name__ == "__main__":
    main()
