"""Benchmark: IGLOO window-classification throughput on the attached device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is Mbp/s of nucleotide sequence classified by the NN branch
(6,000 bp windows -> 5,997 tokens -> IGLOO forward, bf16). The baseline is
the reference's TF/Keras CPU path (genomad/modules/nn_classification.py —
GPU explicitly disabled, batch 128), which sustains roughly 0.5 Mbp/s on a
modern 8-thread CPU; see BASELINE.md for provenance.
"""

import json
import sys
import time

import numpy as np

BASELINE_NN_CPU_MBPS = 0.5
WINDOW_BP = 6_000


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from genomad_tpu.models import igloo

    params = igloo.init_params(seed=0)
    # make_forward_bases: production fast path (two-table embedding); params
    # travel as jit arguments (device buffers), not closure constants —
    # constant-embedding 10M-element weights makes HLO lowering
    # pathologically slow.
    forward = igloo.make_forward_bases(params, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    batch_size = 2048
    tokens = rng.integers(0, 4, (batch_size, 6000)).astype(np.int32)
    tokens_dev = jax.device_put(tokens)
    # compile + warmup (np.asarray forces completion — block_until_ready is
    # not reliable on the axon platform)
    np.asarray(forward(tokens_dev))
    n_iters = 6
    start = time.perf_counter()
    for _ in range(n_iters):
        out = forward(tokens_dev)
    np.asarray(out)
    elapsed = time.perf_counter() - start
    best_mbps = n_iters * batch_size * WINDOW_BP / elapsed / 1e6
    best_batch = batch_size
    print(f"# batch={batch_size}: {best_mbps:.2f} Mbp/s ({elapsed / n_iters * 1e3:.1f} ms/batch)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"nn_classification_throughput(batch={best_batch})",
                "value": round(best_mbps, 3),
                "unit": "Mbp/s",
                "vs_baseline": round(best_mbps / BASELINE_NN_CPU_MBPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
