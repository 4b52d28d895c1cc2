"""Sweep warm_passes at n=1000: each quad-ary round is one sequential
count kernel over the cached D rows — latency-bound at this n — so fewer
rounds trade bounded bandwidth error (~0.17*med/4^rounds per step,
re-verified every step) for step time.

Two error metrics per setting:
- median_rel_err_per_step: max over a 200-step run of
  |warm_med_t - cold_med(particles_t)| / cold_med — the warm search vs
  the 16-pass cold bisect on the SAME particle set at the SAME strided
  row subsample. This is the apples-to-apples number the theory bound
  0.17/4^rounds applies to (the bound is per-search, not
  per-trajectory).
- samples_rel_dev_at_200: end-of-run particle deviation vs the
  cold-bisect trajectory. This is chaotic amplification of the tiny
  per-step bandwidth differences, NOT posterior error (the statistical
  tests pin the latter) — reported for context only.

Timing reuses bench.slope_time — the single methodology for every
benchmarks/ script.
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

from bench import make_data, make_sampler, slope_time
from stein_tpu.ops.median import bisect_median


def main():
    n = 1000
    X, y, theta0 = make_data(n)
    base = dict(median="bisect", median_passes=16)

    # Cold-bisect reference trajectory for the (context-only) end-of-run
    # deviation number.
    ref, batch = make_sampler(X, y, theta0, **base)
    ref.run(batch, 200)

    cold_med = jax.jit(lambda th: bisect_median(th, max_rows=512,
                                                passes=16))

    for wp in (8, 6, 4):
        s, batch = make_sampler(X, y, theta0, warm_median=True,
                                warm_passes=wp, **base)
        # Per-step warm-search error on identical particles: aux["median"]
        # of a 1-step run is the warm median computed on the PRE-step
        # particles — compare it against the cold bisect of that same set.
        max_rel = 0.0
        for _ in range(200):
            # Host snapshot: the jitted step donates the state buffers, so
            # the device array is deleted once run() executes.
            pre = np.asarray(s.state.particles)
            aux = s.run(batch, 1)
            warm_med = float(np.asarray(aux["median"])[-1])
            ref_med = float(cold_med(jax.numpy.asarray(pre)))
            max_rel = max(
                max_rel, abs(warm_med - ref_med) / max(abs(ref_med), 1e-30)
            )
        samp_rel = float(
            np.max(np.abs(s.samples - ref.samples))
            / max(np.max(np.abs(ref.samples)), 1e-30)
        )
        us = slope_time(s, batch, K=1000, R=10, reps=5) * 1e6
        print(json.dumps({
            "bench": "warm_passes_sweep", "n": n, "warm_passes": wp,
            "step_us": round(us, 2),
            "median_rel_err_per_step": round(max_rel, 8),
            "samples_rel_dev_at_200": round(samp_rel, 8),
        }))


if __name__ == "__main__":
    main()
