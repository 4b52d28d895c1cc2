"""Fused single-kernel warm median vs the XLA sequential warm search,
full-step step time at both BASELINE configs (the medians themselves are
bitwise equal — tests/test_pallas_median.py — so this is purely a
latency/dispatch measurement).

Usage: python benchmarks/fused_median_bench.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import make_data, make_sampler, slope_time


def run(n, seed, timing, median_impl, warm, **kw):
    X, y, theta0 = make_data(n, seed=seed)
    s, batch = make_sampler(
        X, y, theta0, median="bisect", median_passes=16,
        warm_median=warm, median_impl=median_impl, **kw,
    )
    t = slope_time(s, batch, **timing)
    # Sanity: medians still healthy (bitwise parity is pinned by tests).
    aux = s.run(batch, 3)
    med = float(np.asarray(aux["median"])[-1])
    return t, med


def main():
    for n, seed, warm, timing, kw in (
        (1000, 0, True, dict(K=1000, R=10, reps=5), dict(warm_passes=6)),
        (10240, 1, True, dict(K=100, R=6, reps=4),
         dict(warm_passes=8, kernel_impl="pallas", pallas_block=1024,
              median_max_rows=128)),
        # Cold (non-warm) path: the fused kernel runs the SAME cold
        # quad-ary search in one invocation (bitwise-equal).
        (1000, 0, False, dict(K=1000, R=10, reps=5), {}),
        (10240, 1, False, dict(K=100, R=6, reps=4),
         dict(kernel_impl="pallas", pallas_block=1024,
              median_max_rows=128)),
    ):
        for impl in ("xla", "fused"):
            t, med = run(n, seed, timing, impl, warm, **kw)
            print(json.dumps({
                "bench": "fused_median", "n": n, "median_impl": impl,
                "warm": warm,
                "step_us": round(t * 1e6, 2),
                "updates_per_s": round(n / t, 1),
                "median_after_3": round(med, 6),
            }), flush=True)


if __name__ == "__main__":
    main()
