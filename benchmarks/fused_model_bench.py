"""step_impl='fused_model' (in-kernel logistic gradients — the whole
hierarchical-logistic SVGD step as ONE kernel) vs step_impl='fused_gram'
(XLA autodiff gradients + the one-kernel tail) on the reference's
Covertype shape: 54 features (p = 55 with the Gamma-hyperprior
log_alpha), minibatch 50, n = 1000 particles
(examples/logistic_regression/main.py:17-18).

Also audits the in-kernel gradient numerics on-chip: fused_model vs
fused_gram share the SAME in-kernel D/K/contraction path, so any
trajectory divergence between them is attributable to the in-kernel
gradient dots (bf16-class input precision) vs XLA HIGH autodiff.

Usage: python benchmarks/fused_model_bench.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from stein_tpu import Adam, SVGDSampler
from stein_tpu.models import LogisticRegressionModel
from bench import slope_time


def make_problem(n=1000, d=54, n_obs=50, n_train=581012, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_obs, d))
    w_true = rng.normal(size=(d, 1))
    y = (X @ w_true + 0.5 * rng.normal(size=(n_obs, 1)) > 0).astype(
        np.float64
    )
    model = LogisticRegressionModel(d, n_train=n_train, n_batch=n_obs)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    theta0 = jnp.asarray(rng.normal(size=(n, d + 1)) * 0.1, jnp.float32)
    return model, batch, theta0


def make_sampler(model, batch, theta0, step_impl):
    kw = {}
    if step_impl == "fused_model":
        kw["inkernel_model"] = model.inkernel_model
    return SVGDSampler(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(),
        gd=Adam(learning_rate=5e-2, decay=0.999), theta=theta0,
        median="bisect", median_passes=16, warm_median=True,
        warm_passes=6, step_impl=step_impl, **kw,
    )


def main():
    model, batch, theta0 = make_problem()
    n = theta0.shape[0]
    out = {"n": n, "p": int(theta0.shape[1]),
           "n_obs": int(batch["X"].shape[0])}

    # --- on-chip numerics audit: 50-step trajectories ---------------
    a = make_sampler(model, batch, theta0, "fused_gram")
    b = make_sampler(model, batch, theta0, "fused_model")
    aux_a = a.run(batch, 50)
    aux_b = b.run(batch, 50)
    sa, sb = np.asarray(a.samples), np.asarray(b.samples)
    out["traj_max_abs_diff_50"] = float(np.max(np.abs(sa - sb)))
    out["traj_scale"] = float(np.max(np.abs(sa)))
    out["logp_mean_rel_diff_50"] = float(
        np.max(np.abs(
            (np.asarray(aux_a["log_p_mean"])
             - np.asarray(aux_b["log_p_mean"]))
            / np.asarray(aux_a["log_p_mean"])
        ))
    )
    out["finite"] = bool(np.isfinite(sb).all())
    print(json.dumps({"audit": out}))

    # --- throughput (slope method; numerator >= ~0.4 s) --------------
    for name, K, R in (("fused_gram", 5000, 6), ("fused_model", 5000, 8)):
        s = make_sampler(model, batch, theta0, name)
        t = slope_time(s, batch, K=K, R=R, reps=3)
        res = {"config": name, "step_us": t * 1e6,
               "updates_per_s": n / t,
               "numerator_s": (R - 1) * K * t}
        print(json.dumps(res))
        out[name + "_step_us"] = t * 1e6

    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
