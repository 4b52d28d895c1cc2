"""Gradient-stage precision sweep: model data matmuls at HIGH (bf16_3x,
f32-faithful — the default) vs DEFAULT (1-pass bf16 inputs, the TPU's
native rate — the throughput-first opt-in).

Rationale: the production kernels already accept a ~2e-3 tolerance class
(the in-kernel dot, RESULTS.md round 3); DEFAULT gradients are a ~6e-4
phi class (measured r2) — strictly inside it. The gradient stage is the
last XLA head of the n=1k step (~11 us of ~27) and ~55 us of the
n=10240 step, so this is the remaining non-kernel lever.

Run on the TPU machine:  python benchmarks/grad_precision_bench.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import bench as benchmod
    import jax.numpy as jnp
    from stein_tpu import Adam, SVGDSampler, throughput_config
    from stein_tpu.models import LinearRegressionModel

    emit(device=str(jax.devices()[0]))

    def sampler_for(n, seed, precision, K, R, reps, extra,
                    suff_stats=False, glm=False):
        X, y, theta0 = benchmod.make_data(n, seed=seed)
        model = LinearRegressionModel(benchmod.N_PARAMS,
                                      precision=precision)
        batch = {"X": jnp.asarray(X, jnp.float32),
                 "y": jnp.asarray(y, jnp.float32)}
        if suff_stats or glm:
            batch = model.sufficient_batch(batch)
        if glm:
            extra = dict(extra, step_impl="fused_glm",
                         quadratic_form=model.quadratic_form)
        s = SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(),
            gd=Adam(learning_rate=1e-1),
            theta=jnp.asarray(theta0, jnp.float32), **extra,
        )
        return s, batch

    cfg1k = dict(median="bisect", warm_median=True, warm_passes=6,
                 median_passes=16, median_impl="fused",
                 step_impl="fused_gram")
    cfg10k = dict(kernel_impl="pallas", median="bisect", median_passes=16,
                  warm_median=True, warm_passes=8, pallas_block=1024,
                  median_max_rows=128, median_impl="fused")

    for name, n, seed, cfg, K, R, reps in [
        ("n1000_high", 1000, 0, cfg1k, 2000, 6, 4),
        ("n1000_default", 1000, 0, cfg1k, 2000, 6, 4),
        ("n1000_suffstats_high", 1000, 0, cfg1k, 2000, 6, 4),
        ("n1000_glm_fullfuse", 1000, 0, cfg1k, 2000, 6, 4),
        ("n10240_high", 10240, 1, cfg10k, 100, 6, 4),
        ("n10240_default", 10240, 1, cfg10k, 100, 6, 4),
        ("n10240_suffstats_high", 10240, 1, cfg10k, 100, 6, 4),
    ]:
        precision = "default" if name.endswith("default") else "high"
        try:
            s, batch = sampler_for(n, seed, precision, K, R, reps, cfg,
                                   suff_stats="suffstats" in name,
                                   glm="glm" in name)
            dts = sorted(
                benchmod.slope_time(s, batch, K=K, R=R, reps=reps)
                for _ in range(3)
            )
            emit(bench="grad_precision", variant=name,
                 us_med=round(dts[1] * 1e6, 2),
                 us_all=[round(d * 1e6, 2) for d in dts],
                 updates_per_s=round(n / dts[1], 0))
        except Exception as e:  # noqa: BLE001
            emit(bench="grad_precision", variant=name,
                 error=str(e)[:300])


if __name__ == "__main__":
    main()
