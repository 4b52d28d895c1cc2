"""Median-strategy step-time matrix on the real TPU (VERDICT r1 item 2:
the median was ~50% of the large-n step).

Levers measured (full SVGDSampler.run step time, two-length slope):
- warm_median: branchless scan-carried warm bisect (1 + ceil(wp/2) count
  kernels vs 1 + ceil(16/2) cold) — attacks the sequential-kernel count
  that dominates at n=1k and the block bandwidth at n=10k.
- median_max_rows: the bisect row-subsample (128 rows at n=10240 measures
  <1% median error — statistically invisible for the heuristic — and 4x
  less count-pass bandwidth than 512).

Prints one JSON line per config. Run: python benchmarks/median_bench.py
"""

import json
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402  (repo-root bench.py: make_data + bench_jax)


CONFIGS = [
    # name, n_particles, kwargs for bench_jax
    ("n1k_cold16", 1000, dict(K=200, median="bisect", median_passes=16)),
    ("n1k_warm8", 1000, dict(K=200, median="bisect", median_passes=16,
                             warm_median=True, warm_passes=8)),
    ("n1k_warm6", 1000, dict(K=200, median="bisect", median_passes=16,
                             warm_median=True, warm_passes=6)),
    ("n10k_cold16_mr512", 10240, dict(K=100, kernel_impl="pallas",
                                      median="bisect", median_passes=16)),
    ("n10k_warm8_mr512", 10240, dict(K=100, kernel_impl="pallas",
                                     median="bisect", median_passes=16,
                                     warm_median=True, warm_passes=8)),
    ("n10k_warm8_mr128", 10240, dict(K=100, kernel_impl="pallas",
                                     median="bisect", median_passes=16,
                                     warm_median=True, warm_passes=8,
                                     median_max_rows=128)),
    ("n10k_cold16_mr128", 10240, dict(K=100, kernel_impl="pallas",
                                      median="bisect", median_passes=16,
                                      median_max_rows=128)),
    # Round-2 sweep: smaller subsample / fewer warm passes, and Pallas
    # tile-size variants (each block size is a fresh Mosaic compile).
    ("n10k_warm6_mr64", 10240, dict(K=100, R=6, reps=4,
                                    kernel_impl="pallas", median="bisect",
                                    median_passes=16, warm_median=True,
                                    warm_passes=6, median_max_rows=64)),
    ("n10k_warm8_mr128_blk256", 10240, dict(K=100, R=6, reps=4,
                                            kernel_impl="pallas",
                                            median="bisect",
                                            median_passes=16,
                                            warm_median=True, warm_passes=8,
                                            median_max_rows=128,
                                            pallas_block=256)),
    ("n10k_warm8_mr128_blk1024", 10240, dict(K=100, R=6, reps=4,
                                             kernel_impl="pallas",
                                             median="bisect",
                                             median_passes=16,
                                             warm_median=True,
                                             warm_passes=8,
                                             median_max_rows=128,
                                             pallas_block=1024)),
]


def main():
    import jax
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    data_cache = {}
    for name, n, kwargs in CONFIGS:
        if n not in data_cache:
            data_cache[n] = bench.make_data(n, seed=1 if n > 1000 else 0)
        X, y, theta0 = data_cache[n]
        dt = bench.bench_jax(X, y, theta0, **kwargs)
        print(json.dumps({
            "bench": "median_matrix", "config": name, "n": n,
            "step_us": round(dt * 1e6, 2),
            "updates_per_s": round(n / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
