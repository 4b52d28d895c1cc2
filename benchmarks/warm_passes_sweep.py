"""Sweep warm_passes at n=1000: each quad-ary round is one sequential
count kernel over the cached D rows — latency-bound at this n — so fewer
rounds trade bounded bandwidth error (~0.17*med/4^rounds per step,
re-verified every step) for step time.

Two error metrics per setting:
- median_rel_err_per_step: max over a 200-step PRODUCTION-REGIME run
  (the (state, med) carry maintained across steps, exactly as inside
  api.run's scan) of |warm_med_t - exact_med(subsample_t)| /
  exact_med — the warm search vs jnp.median of the SAME strided row
  block of the SAME particles. The reference must be exact: an earlier
  version of this sweep compared against the 16-pass cold bisect, whose
  own midpoint error (range/4^8/2, with range(D) >> med) dominated the
  comparison and made the warm numbers look ~10x worse than they are.
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
import jax.numpy as jnp

from bench import make_data, make_sampler, slope_time
from stein_tpu.ops.median import row_subsample_block


def exact_subsample_median(theta, max_rows=512):
    """jnp.median of the SAME strided row block the warm search counts."""
    return jnp.median(row_subsample_block(theta, max_rows))


def per_step_error(X, y, theta0, wp, n_steps=200, **base):
    """Max per-step warm-search error in the production carry regime:
    drive the SAME warm step function the benchmarked sampler scans
    (sampler internals — this is the one trajectory the timing below
    measures), keeping the (state, med) carry across single steps."""
    s, batch = make_sampler(X, y, theta0, warm_median=True,
                            warm_passes=wp, **base)
    step = jax.jit(s._warm_step_fn)
    ref_med = jax.jit(exact_subsample_median)

    med0 = s._warm_init_med(s.state.particles).astype(jnp.float32)
    carry = (s.state, med0)
    max_rel = 0.0
    for _ in range(n_steps):
        exact = float(ref_med(carry[0].particles))
        carry, aux = step(carry, batch)
        warm = float(aux["median"])
        max_rel = max(max_rel, abs(warm - exact) / max(abs(exact), 1e-30))
    return max_rel


def main():
    n = 1000
    X, y, theta0 = make_data(n)
    base = dict(median="bisect", median_passes=16)

    # Cold-bisect reference trajectory for the (context-only) end-of-run
    # deviation number.
    ref, batch = make_sampler(X, y, theta0, **base)
    ref.run(batch, 200)

    for wp in (8, 6, 4):
        max_rel = per_step_error(X, y, theta0, wp, **base)
        s, batch = make_sampler(X, y, theta0, warm_median=True,
                                warm_passes=wp, **base)
        s.run(batch, 200)
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
        }), flush=True)


if __name__ == "__main__":
    main()
