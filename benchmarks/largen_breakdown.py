"""Stage attribution of the PRODUCTION large-n step (Pallas tile + fused
warm median — bench.py config 2), post u-regrouping.

step_breakdown.py decomposes the XLA path (it materialises D); this probe
decomposes the pipeline the large-n bench actually runs:

    grads (XLA HIGH, full-X)
    -> D_sub row block + fused warm median (ops/pallas_median)
    -> streaming phi tile (ops/pallas_svgd, centered u-regrouped form)
    -> clip + Adam (XLA elementwise tail)

Cumulative lax.scan stages timed by the slope method (see
bench.slope_time); stage costs are differences; the real sampler step is
the ground truth the stages must add up to. The clip+Adam residual is
the number that decides whether a fused epilogue kernel is worth
building.

Also measures the n=102400/p=64 capability config (round-1 table read
93 ms/step at bf16-tainted precision) with the current production
kernels.

Usage: python benchmarks/largen_breakdown.py [n] [p]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench import make_sampler, slope_time, N_OBS
from step_breakdown import slope_scan
from stein_tpu.models import LinearRegressionModel
from stein_tpu.ops.median import row_subsample_block
from stein_tpu.ops.pallas_median import fused_warm_median_rows, fused_block_ok
from stein_tpu.ops.pallas_svgd import pallas_svgd_phi
from stein_tpu.ops.rbf import bandwidth_sq_from_median


def make_data_p(n_particles, p, seed=1):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N_OBS, p))
    w = rng.normal(size=(p, 1))
    y = X @ w + rng.normal(size=(N_OBS, 1)) * 0.3
    theta0 = rng.normal(size=(n_particles, p)) * 0.01
    return X, y, theta0


def breakdown(n, p, warm_passes=8, max_rows=128, block=1024,
              K=None, R=6, reps=4):
    if K is None:
        # Keep the slope numerator ~1-2 s without hour-long scans at
        # very large n (step time grows ~n^2).
        K = max(10, min(1000, int(20_000_000_000 / (n * n // 50))))
    X, y, theta0 = make_data_p(n, p)
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    theta = jnp.asarray(theta0, jnp.float32)
    grad_all = jax.vmap(jax.value_and_grad(
        lambda row, b: model.log_p({"w": row.reshape(-1, 1)}, b)
    ), in_axes=(0, None))
    eps = jnp.float32(1e-20)
    med0 = jnp.float32(1.0)

    def warm_med(th, med):
        D_sub = row_subsample_block(th, max_rows)
        if fused_block_ok(*D_sub.shape):
            return fused_warm_median_rows(D_sub, med,
                                          warm_passes=warm_passes)
        from stein_tpu.ops.median import _warm_search
        return _warm_search(D_sub, med, warm_passes)

    def s_grads(carry):
        th, med = carry
        _, g = grad_all(th, batch)
        return th + eps * g, med

    def s_med(carry):
        th, med = carry
        _, g = grad_all(th, batch)
        med = warm_med(th, med)
        return th + eps * g, med

    def s_phi(carry):
        th, med = carry
        _, g = grad_all(th, batch)
        med = warm_med(th, med)
        h2 = bandwidth_sq_from_median(med, th.shape[0])
        phi = pallas_svgd_phi(th, g, h2, block_i=block, block_j=block)
        return th + eps * phi, med

    t_grads = slope_scan(s_grads, (theta, med0), K=K, R=R, reps=reps)
    t_med = slope_scan(s_med, (theta, med0), K=K, R=R, reps=reps)
    t_phi = slope_scan(s_phi, (theta, med0), K=K, R=R, reps=reps)

    sampler, sbatch = make_sampler(
        X, y, theta0, kernel_impl="pallas", median="bisect",
        median_passes=16, warm_median=True, warm_passes=warm_passes,
        pallas_block=block, median_max_rows=max_rows,
        median_impl="fused",
    ) if p == 128 else _sampler_p(X, y, theta0, p, warm_passes,
                                  max_rows, block)
    t_full = slope_time(sampler, sbatch, K=K, R=R, reps=reps)

    return {
        "n": n, "p": p,
        "grads_us": round(t_grads * 1e6, 1),
        "warm_median_us": round((t_med - t_grads) * 1e6, 1),
        "phi_tile_us": round((t_phi - t_med) * 1e6, 1),
        "clip_adam_rest_us": round((t_full - t_phi) * 1e6, 1),
        "cumulative_phi_us": round(t_phi * 1e6, 1),
        "full_step_us": round(t_full * 1e6, 1),
        "updates_per_s_M": round(n / t_full / 1e6, 1),
    }


def _sampler_p(X, y, theta0, p, warm_passes, max_rows, block):
    from stein_tpu import SVGDSampler, Adam
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    sampler = SVGDSampler(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(), gd=Adam(learning_rate=1e-1),
        theta=jnp.asarray(theta0, jnp.float32),
        kernel_impl="pallas", median="bisect", median_passes=16,
        warm_median=True, warm_passes=warm_passes,
        pallas_block=block, median_max_rows=max_rows,
        median_impl="fused",
    )
    return sampler, batch


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    out = breakdown(n, p)
    out["bench"] = "largen_breakdown"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
