"""Sweep warm_passes at n=1000: each quad-ary round is one sequential
count kernel over the cached D rows — latency-bound at this n — so fewer
rounds trade bounded bandwidth error (~0.17*med/4^rounds per step,
re-verified every step) for step time. Prints JSON lines with step time
and the measured end-of-run bandwidth deviation vs the cold-bisect
trajectory.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from bench import make_data, N_PARAMS
from stein_tpu import SVGDSampler, Adam
from stein_tpu.models import LinearRegressionModel


def make_sampler(X, y, theta0, **kwargs):
    model = LinearRegressionModel(N_PARAMS)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    return SVGDSampler(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(),
        gd=Adam(learning_rate=1e-1),
        theta=jnp.asarray(theta0, jnp.float32),
        median="bisect", median_passes=16, **kwargs,
    ), batch


def slope_time(sampler, batch, K=1000, R=10, reps=5):
    sampler.run(batch, K)
    np.asarray(sampler.state.particles)

    def timed(n_dispatches):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_dispatches):
                sampler.run(batch, K)
            np.asarray(sampler.state.particles)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tR = timed(R)
    return max(tR - t1, 1e-9) / ((R - 1) * K)


def main():
    n = 1000
    X, y, theta0 = make_data(n)

    # Cold-bisect reference trajectory for the error check.
    ref, batch = make_sampler(X, y, theta0)
    ref_aux = ref.run(batch, 200)
    ref_med = float(np.asarray(ref_aux["median"])[-1])

    for wp in (8, 6, 4):
        s, batch = make_sampler(X, y, theta0, warm_median=True,
                                warm_passes=wp)
        aux = s.run(batch, 200)
        med = float(np.asarray(aux["median"])[-1])
        med_rel_err = abs(med - ref_med) / max(abs(ref_med), 1e-30)
        samp_rel = float(
            np.max(np.abs(s.samples - ref.samples))
            / max(np.max(np.abs(ref.samples)), 1e-30)
        )
        us = slope_time(s, batch) * 1e6
        print(json.dumps({
            "bench": "warm_passes_sweep", "n": n, "warm_passes": wp,
            "step_us": round(us, 2),
            "median_rel_err_at_200": round(med_rel_err, 8),
            "samples_rel_dev_at_200": round(samp_rel, 8),
        }))


if __name__ == "__main__":
    main()
