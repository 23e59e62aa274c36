"""Full-scale eval wall-clock benchmark (VERDICT r2 item 6).

Times the complete metric suite — pairwise CD + EMD over the three
(sample, ref) pairings, MMD/COV, 1-NNA, JSD — at chair scale (662 refs,
2048 points, the largest released category) on the chip, mirroring
eval_sample's scoring stage. The reference needs "1-2 hours" for the
whole eval INCLUDING sampling (README.md:94); sampling at the current
bench rate adds ~662/0.85 s — this script reports the scoring side.

    python scripts/bench_eval.py [N=662] [METRIC2=EMD]

Result recorded in README.md (eval wall-clock).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from lion_tpu.eval import (compute_all_metrics,
                               jsd_between_point_cloud_sets)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 662
    metric2 = sys.argv[2] if len(sys.argv) > 2 else "EMD"
    if metric2 == "none":
        metric2 = None
    rng = np.random.RandomState(0)
    gen = rng.randn(n, 2048, 3).astype(np.float32) * 0.2
    ref = rng.randn(n, 2048, 3).astype(np.float32) * 0.2

    t0 = time.perf_counter()
    results = compute_all_metrics(gen, ref, batch_size=64, metric2=metric2)
    t1 = time.perf_counter()
    results["jsd"] = jsd_between_point_cloud_sets(gen, ref)
    t2 = time.perf_counter()

    for k, v in results.items():
        if np.ndim(v) == 0:
            print(f"  {k}: {float(v):.6f}")
    print(f"metrics (CD{'+EMD' if metric2 else ''}) wall: {t1 - t0:.1f} s")
    print(f"jsd wall: {t2 - t1:.1f} s")
    print(f"TOTAL scoring wall at N={n}: {t2 - t0:.1f} s "
          f"(reference whole-eval budget: 1-2 h incl. sampling)")


if __name__ == "__main__":
    main()
