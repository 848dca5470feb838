"""Ablation profile of the IGLOO forward on the attached device.

Times sub-graphs to locate the bottleneck: embedding, conv stack, IGLOO
patch gather + reduction, attention, heads.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from genomad_tpu.models import igloo


def timeit(fn, *args, iters=8):
    np.asarray(fn(*args))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main(batch=512):
    params = igloo.init_params(seed=0)
    prepared = igloo.prepare_params(params, jnp.bfloat16)
    rng = np.random.default_rng(0)
    bases = jax.device_put(rng.integers(0, 4, (batch, 6000)).astype(np.int32))
    h1_host = rng.normal(size=(batch, igloo.WINDOW_TOKENS, igloo.CHANNELS)).astype(np.float32)
    h1 = jax.device_put(jnp.asarray(h1_host, jnp.bfloat16))

    # every sub-graph reduces to a scalar so axon tunnel transfers don't
    # dominate the measurement
    full = jax.jit(lambda p, b: igloo.apply_bases(p, b).sum())
    t_full = timeit(full, prepared, bases)

    embed = jax.jit(
        lambda p, b: igloo._leaky_relu(
            igloo._embed_from_bases(b, p["base_tables"], p["conv1"]["kernel"], p["conv1"]["bias"])
        ).sum()
    )
    t_embed = timeit(embed, prepared, bases)

    convs = jax.jit(
        lambda p, h: igloo._leaky_relu(
            igloo._causal_conv(
                igloo._leaky_relu(igloo._causal_conv(h, p["conv2"]["kernel"], p["conv2"]["bias"])),
                p["conv3"]["kernel"],
                p["conv3"]["bias"],
            )
        ).sum()
    )
    t_convs = timeit(convs, prepared, h1)

    ig = jax.jit(lambda p, h: igloo._igloo_kernel(h, p["igloo1"]).sum())
    t_igloo = timeit(ig, prepared, h1)

    # igloo sub-pieces
    gather_red = jax.jit(
        lambda p, h: jnp.einsum(
            "bpsc,psc->bp",
            jnp.take(h, p["igloo1"]["patches"], axis=1),
            p["igloo1"]["w_patch"],
            preferred_element_type=jnp.float32,
        ).sum()
    )
    t_gather = timeit(gather_red, prepared, h1)

    vproj = jax.jit(
        lambda p, h: jnp.einsum(
            "blc,cd->bld", h, p["igloo1"]["w_v"], preferred_element_type=jnp.float32
        )
        .astype(h.dtype)
        .sum()
    )
    t_vproj = timeit(vproj, prepared, h1)

    print(f"batch={batch}")
    print(f"full forward : {t_full:8.2f} ms")
    print(f"embed        : {t_embed:8.2f} ms")
    print(f"conv2+conv3  : {t_convs:8.2f} ms")
    print(f"igloo kernel : {t_igloo:8.2f} ms  (x2 in full)")
    print(f"  patch gather+reduce: {t_gather:8.2f} ms")
    print(f"  value projection   : {t_vproj:8.2f} ms")
    accounted = t_embed + t_convs + 2 * t_igloo
    print(f"accounted    : {accounted:8.2f} ms")


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
