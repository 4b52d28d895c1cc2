"""Stage attribution of the Bayesian-NN n=1000 step (BASELINE config
#3): how much of the ~96 us step is the per-particle-MLP gradient stage
(XLA vmap autodiff over [n, 20, 100]-class batched dot_generals) vs the
SVGD tail (median + K + contraction + clip + Adam).

The gradient stage is the one part no fused kernel can ingest (the
InKernelModel boundary, docs/DESIGN.md): per-particle weight tensors
mean batched matvecs with tiny contraction dims — MXU-starved by
construction, bounded by HBM traffic on the [n, n_obs, n_hidden]
intermediates. This probe records whether that stage is worth further
attack or is already at its structural floor.

Method: slope-time (bench.slope_time semantics) three scans at the NN
shape — (a) gradients only, (b) gradients + phi (no optimizer), (c) the
full production step — so the deltas attribute stages. Numerators are
kept >= ~0.4 s.

Usage: python benchmarks/nn_breakdown.py
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

from stein_tpu import Adam, SVGDSampler, throughput_config
from stein_tpu.models import BayesianNNModel
from benchmarks.nn_bench import make_problem, make_sampler


def slope_scan(fn, carry, K, R=6, reps=3):
    """Two-count slope of a jitted lax.scan of ``fn`` over K steps.
    ``fn(carry) -> carry`` (pure); returns seconds/step."""
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run(c, k):
        return jax.lax.scan(lambda cc, _: (fn(cc), None), c, None,
                            length=k)[0]

    out = run(carry, K)
    np.asarray(jax.tree_util.tree_leaves(out)[0])

    def timed(n_dispatch):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = carry
            for _ in range(n_dispatch):
                o = run(o, K)
            np.asarray(jax.tree_util.tree_leaves(o)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tR = timed(1), timed(R)
    return max(tR - t1, 1e-9) / ((R - 1) * K)


def main():
    n, p = 1000, 303
    model, batch = make_problem(n)
    s = make_sampler(model, n, **throughput_config(n, p))
    theta0 = jnp.asarray(s.state.particles)

    def log_p_flat(row, b):
        return model.log_p(s.unravel_fn(row), b)

    grad_all = jax.vmap(jax.value_and_grad(log_p_flat), in_axes=(0, None))

    # (a) gradients only: theta -> theta + eps*grads keeps the scan
    # carry live so XLA cannot dead-code the gradient computation.
    def grads_only(theta):
        _, g = grad_all(theta, batch)
        return theta + 1e-30 * g

    K = 5000
    t_g = slope_scan(grads_only, theta0, K=K)
    print(json.dumps({"stage": "grads_only", "us": round(t_g * 1e6, 2),
                      "numerator_s": round(5 * K * t_g, 3)}), flush=True)

    # (b) gradients + phi (median + K + contractions), no clip/Adam.
    from stein_tpu.api import make_phi_fn
    phi_fn = make_phi_fn(n, median="bisect", median_passes=16,
                         median_impl="fused")

    def grads_phi(theta):
        _, g = grad_all(theta, batch)
        phi, _ = phi_fn(theta, g)
        return theta + 1e-30 * phi

    t_gp = slope_scan(grads_phi, theta0, K=2000)
    print(json.dumps({"stage": "grads_plus_phi",
                      "us": round(t_gp * 1e6, 2),
                      "numerator_s": round(5 * 2000 * t_gp, 3)}),
          flush=True)

    # (c) the full production step (the nn_bench n1000_tuned config).
    from bench import slope_time
    t_full = slope_time(s, batch, K=2000, R=6, reps=3)
    print(json.dumps({"stage": "full_step", "us": round(t_full * 1e6, 2),
                      "numerator_s": round(5 * 2000 * t_full, 3)}),
          flush=True)

    print(json.dumps({"summary": {
        "grads_us": round(t_g * 1e6, 2),
        "phi_delta_us": round((t_gp - t_g) * 1e6, 2),
        "tail_delta_us": round((t_full - t_gp) * 1e6, 2),
        "full_us": round(t_full * 1e6, 2),
    }}))


if __name__ == "__main__":
    main()
