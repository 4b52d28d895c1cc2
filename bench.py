"""Benchmark: SVGD particle-update throughput on the local accelerator vs
the NumPy oracle baseline (BASELINE.md: primary metric is
particle-updates/s/chip; speed target >= 10x NumPy wall-clock at n=1k).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the speedup of the TPU-native jitted step over the pure-NumPy
oracle (which encodes the reference's exact per-step semantics, minus its
n-session-round-trip overhead — i.e. a *favourable* version of the
reference), measured on identical work: n=1000 particles, p=128 params,
Bayesian linear regression gradients.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


N_PARTICLES = 1000
N_PARAMS = 128
N_OBS = 1000
WARMUP = 5
STEPS = 50
NP_STEPS = 5


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N_OBS, N_PARAMS))
    w = rng.normal(size=(N_PARAMS, 1))
    y = X @ w + rng.normal(size=(N_OBS, 1)) * 0.3
    theta0 = rng.normal(size=(N_PARTICLES, N_PARAMS)) * 0.01
    return X, y, theta0


def bench_numpy(X, y, theta0):
    from baselines.numpy_svgd import NumpySVGD, NumpyAdam

    def grad_log_p(theta_row, batch):
        w = theta_row.reshape(-1, 1)
        return (X.T @ (y - X @ w) - w).ravel()

    oracle = NumpySVGD(grad_log_p, theta0, NumpyAdam(learning_rate=1e-1))
    oracle.train_on_batch(None)  # warm caches
    t0 = time.perf_counter()
    for _ in range(NP_STEPS):
        oracle.train_on_batch(None)
    return (time.perf_counter() - t0) / NP_STEPS


def bench_jax(X, y, theta0):
    import jax
    import jax.numpy as jnp
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel

    model = LinearRegressionModel(N_PARAMS)
    batch = {"X": jnp.asarray(X, jnp.float32), "y": jnp.asarray(y, jnp.float32)}
    sampler = SVGDSampler(
        n_particles=N_PARTICLES,
        log_p=model.log_p,
        param_template=model.template(),
        gd=Adam(learning_rate=1e-1),
        theta=jnp.asarray(theta0, jnp.float32),
        median="bisect",   # sort-free on-device median (sorts are the one
                           # slow TPU primitive; see ops/median.py)
        median_passes=16,  # bandwidth to ~1e-4 relative: ample for the
                           # heuristic, halves the dominant sequential cost
    )
    # One dispatch per K steps (lax.scan) — the TPU-native loop shape.
    # Timing uses a two-count slope: on a tunneled device,
    # block_until_ready is unreliable and a host fetch has a large fixed
    # RTT, so we time (1 dispatch + fetch) vs (R dispatches + fetch) of
    # the SAME compiled scan and take the slope — the fixed fetch cost
    # cancels, per-dispatch overhead is part of honest throughput, and
    # only one scan length compiles (remote compiles cost minutes here).
    K, R = 200, 4

    sampler.run(batch, K)                       # compile once
    np.asarray(sampler.state.particles)

    def timed(n_dispatches, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_dispatches):
                sampler.run(batch, K)
            np.asarray(sampler.state.particles)  # forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tR = timed(R)
    return max(tR - t1, 1e-9) / ((R - 1) * K)


def main():
    X, y, theta0 = make_data()
    t_np = bench_numpy(X, y, theta0)
    t_jax = bench_jax(X, y, theta0)
    updates_per_s = N_PARTICLES / t_jax
    print(json.dumps({
        "metric": f"particle-updates/s/chip (n={N_PARTICLES}, p={N_PARAMS})",
        "value": round(updates_per_s, 1),
        "unit": "particle-updates/s",
        "vs_baseline": round(t_np / t_jax, 2),
    }))


if __name__ == "__main__":
    main()
