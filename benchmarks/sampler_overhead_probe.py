"""Where does the real large-n sampler step spend what the synthetic
stage pipeline doesn't? (benchmarks/largen_breakdown.py measured
grads+median+tile = 312 us but the real sampler = 486 us, while the
isolated XLA clip+Adam tail is ~tens of us.)

Same-session, same slope method, n=10240/p=128 production config:
  1. synth_phi      — grads + warm median + tile (carry: theta, med)
  2. synth_full     — + clip + Adam with the REAL optimizer-state carry
                      (theta, med, mu, nu, count: 15.7 MB of scan carry
                      instead of 5.2 MB — tests the carry-size / VMEM
                      residency hypothesis)
  3. sampler        — the real production sampler (adds aux stacking,
                      SVGDState, donation, run() wrapper)
  4. sampler_adagrad — one moment array instead of two
  5. sampler_epilogue — step_impl='epilogue'

Usage: python benchmarks/sampler_overhead_probe.py [n]
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench import make_data, make_sampler, slope_time, N_PARAMS
from step_breakdown import slope_scan
from stein_tpu import Adagrad
from stein_tpu.models import LinearRegressionModel
from stein_tpu.ops.median import row_subsample_block
from stein_tpu.ops.pallas_median import fused_warm_median_rows
from stein_tpu.ops.pallas_svgd import pallas_svgd_both_ksum
from stein_tpu.ops.rbf import bandwidth_sq_from_median


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    p = N_PARAMS
    X, y, theta0 = make_data(n, seed=1)
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    theta = jnp.asarray(theta0, jnp.float32)
    grad_all = jax.vmap(jax.value_and_grad(
        lambda row, b: model.log_p({"w": row.reshape(-1, 1)}, b)
    ), in_axes=(0, None))
    f32 = jnp.float32
    med0 = jnp.float32(1.0)

    def phi_parts(th, med_prev, g):
        med = fused_warm_median_rows(
            row_subsample_block(th, 128), med_prev, warm_passes=8)
        h2 = bandwidth_sq_from_median(med, n)
        center = jnp.mean(th, axis=0, keepdims=True)
        ku, ksum = pallas_svgd_both_ksum(
            th, th, g, h2, center, block_i=1024, block_j=1024)
        h2f = jnp.asarray(h2, f32)
        phi = (ku + ksum * (th - center) / h2f) / n
        return med, phi

    eps = jnp.float32(1e-20)

    def s_phi(carry):
        th, med = carry
        _, g = grad_all(th, batch)
        med, phi = phi_parts(th, med, g)
        return th + eps * phi, med

    # The real Adam recursion with the real state carried through the
    # scan (mirrors ops/optimizers.py's quirks closely enough for cost).
    def s_full(carry):
        th, med, mu, nu, cnt = carry
        _, g = grad_all(th, batch)
        med, phi = phi_parts(th, med, g)
        norm = jnp.sqrt(jnp.sum(phi * phi))
        c = jnp.float32(10.0)
        phi = phi * (c / jnp.maximum(c, norm))
        b1, b2, lr = 0.9, 0.999, 1e-4
        first = (cnt == 0)
        mu = jnp.where(first, phi, b1 * mu + (1 - b1) * phi)
        nu = jnp.where(first, phi * phi, b2 * nu + (1 - b2) * phi * phi)
        t = (cnt + 1).astype(f32)
        mu_hat = mu / (1 - b1 ** t)
        nu_hat = nu / (1 - b2 ** t)
        delta = lr * mu_hat / (jnp.sqrt(nu_hat) + 1e-8)
        return th + delta, med, mu, nu, cnt + 1

    out = {"bench": "sampler_overhead_probe", "n": n, "p": p}
    out["synth_phi_us"] = round(
        slope_scan(s_phi, (theta, med0), K=1000, R=4, reps=3) * 1e6, 1)
    z = jnp.zeros_like(theta)
    out["synth_full_us"] = round(
        slope_scan(s_full, (theta, med0, z, z, jnp.int32(0)),
                   K=1000, R=4, reps=3) * 1e6, 1)

    common = dict(
        kernel_impl="pallas", median="bisect", median_passes=16,
        warm_median=True, warm_passes=8, pallas_block=1024,
        median_max_rows=128, median_impl="fused",
    )
    s1, sbatch = make_sampler(X, y, theta0, **common)
    out["sampler_us"] = round(
        slope_time(s1, sbatch, K=500, R=4, reps=3) * 1e6, 1)
    from stein_tpu import SVGDSampler
    s2 = SVGDSampler(
        n_particles=n, log_p=model.log_p,
        param_template=model.template(),
        gd=Adagrad(learning_rate=1e-1),
        theta=jnp.asarray(theta0, jnp.float32), **common)
    out["sampler_adagrad_us"] = round(
        slope_time(s2, sbatch, K=500, R=4, reps=3) * 1e6, 1)
    s3, _ = make_sampler(X, y, theta0, step_impl="epilogue", **common)
    out["sampler_epilogue_us"] = round(
        slope_time(s3, sbatch, K=500, R=4, reps=3) * 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
