"""Decompose the full SVGD step time into its pipeline stages at a given n
(default the two BASELINE configs): gradients, D/Gram, median search, the
K contraction, and the optimizer+clip tail.

Each stage is timed as a K-iteration lax.scan whose carry feeds the stage's
input (so XLA cannot hoist or dead-code it), by the same two-count slope
as bench.slope_time. Differences between cumulative scans give the stage
costs; the full-sampler step is printed alongside as the ground truth the
stages must roughly add up to.

Usage: python benchmarks/step_breakdown.py [n]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench import make_data, make_sampler, N_PARAMS
from stein_tpu.models import LinearRegressionModel
from stein_tpu.ops.median import (
    bisect_median_on_D,
    warm_bisect_median_on_D,
)
from stein_tpu.ops.rbf import bandwidth_sq_from_median, pairwise_sq_dists


def slope_scan(fn, init_carry, K=2000, R=6, reps=4):
    """Slope-time one carry->carry stage iterated K times per dispatch."""
    scanned = jax.jit(
        lambda c: jax.lax.scan(lambda c, _: (fn(c), None), c,
                               None, length=K)[0]
    )
    c = scanned(init_carry)              # compile + settle
    np.asarray(jax.tree_util.tree_leaves(c)[0])

    def timed(n_dispatches):
        best = float("inf")
        for _ in range(reps):
            cc = init_carry
            t0 = time.perf_counter()
            for _ in range(n_dispatches):
                cc = scanned(cc)
            np.asarray(jax.tree_util.tree_leaves(cc)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tR = timed(R)
    return max(tR - t1, 1e-9) / ((R - 1) * K)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    X, y, theta0 = make_data(n)
    model = LinearRegressionModel(N_PARAMS)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    theta = jnp.asarray(theta0, jnp.float32)

    grad_all = jax.vmap(jax.value_and_grad(
        lambda row, b: model.log_p({"w": row.reshape(-1, 1)}, b)
    ), in_axes=(0, None))

    eps = jnp.float32(1e-20)

    # Stage 1: gradients only.
    def s_grads(th):
        _, g = grad_all(th, batch)
        return th + eps * g

    # Stage 2: + D (HIGHEST Gram).
    def s_d(th):
        _, g = grad_all(th, batch)
        D = pairwise_sq_dists(th)
        return th + eps * (g + D[:, :1])

    # Stage 3: + warm median counts on D (per-step production search).
    med0 = jnp.float32(1.0)

    def s_med(carry):
        th, med = carry
        _, g = grad_all(th, batch)
        D = pairwise_sq_dists(th)
        med = warm_bisect_median_on_D(D, med, max_rows=512, warm_passes=6)
        return th + eps * (g + D[:, :1]), med

    # Stage 4: + K and the fused contraction + phi assembly (full phi).
    def s_phi(carry):
        th, med = carry
        _, g = grad_all(th, batch)
        D = pairwise_sq_dists(th)
        med = warm_bisect_median_on_D(D, med, max_rows=512, warm_passes=6)
        h2 = bandwidth_sq_from_median(med, n)
        K = jnp.exp(-D / h2 / 2.0)
        ksum = jnp.sum(K, axis=1, keepdims=True)
        both = jnp.matmul(K, jnp.concatenate([g, th], axis=1),
                          preferred_element_type=th.dtype,
                          precision=jax.lax.Precision.HIGH)
        phi = (both[:, :N_PARAMS]
               + (ksum * th - both[:, N_PARAMS:]) / h2) / n
        return th + eps * phi, med

    t_grads = slope_scan(s_grads, theta)
    t_d = slope_scan(s_d, theta)
    t_med = slope_scan(s_med, (theta, med0))
    t_phi = slope_scan(s_phi, (theta, med0))

    # Ground truth: the production sampler step (adds clip + Adam).
    sampler, sbatch = make_sampler(
        X, y, theta0, median="bisect", median_passes=16,
        warm_median=True, warm_passes=6,
    )
    from bench import slope_time
    t_full = slope_time(sampler, sbatch, K=1000, R=10, reps=4)

    # The fused tail (step_impl='fused'): grads + HIGHEST Gram stay XLA
    # (t_grads + the gram stage above), everything else is one kernel —
    # its cost is full_fused - cumulative-through-gram.
    t_fused = None
    if n <= 1024:
        sf, sbatch = make_sampler(
            X, y, theta0, median="bisect", median_passes=16,
            warm_median=True, warm_passes=6, step_impl="fused",
        )
        t_fused = slope_time(sf, sbatch, K=1000, R=10, reps=4)

    print(json.dumps({
        "bench": "step_breakdown", "n": n, "p": N_PARAMS,
        "grads_us": round(t_grads * 1e6, 2),
        "gram_D_us": round((t_d - t_grads) * 1e6, 2),
        "warm_median_us": round((t_med - t_d) * 1e6, 2),
        "K_contraction_phi_us": round((t_phi - t_med) * 1e6, 2),
        "clip_adam_rest_us": round((t_full - t_phi) * 1e6, 2),
        "cumulative_phi_us": round(t_phi * 1e6, 2),
        "full_step_us": round(t_full * 1e6, 2),
        "full_fused_step_us": (round(t_fused * 1e6, 2)
                               if t_fused is not None else None),
        "fused_tail_us": (round((t_fused - t_d) * 1e6, 2)
                          if t_fused is not None else None),
    }))


if __name__ == "__main__":
    main()
