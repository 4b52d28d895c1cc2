"""BASELINE config #3 — Bayesian neural-network regression (per-particle
MLP weights) — measured on-chip. The only BASELINE.json workload without
a recorded throughput number until now.

Workload = the reference example's exact shape
(regression_neural_network/main.py:14-21): 1 -> 100 -> 1 ReLU MLP with
per-particle weights (p = 303 raveled parameters per particle),
minibatch 20, Adam lr=1e-1 decay=0.999. Three configs:

- n=20  (the reference's particle count), reference-faithful defaults
  (XLA step, exact median);
- n=20  through throughput_config(20, 303) — fused_gram fits at this
  tiny n (the whole post-gradient tail incl. D is ONE kernel; the
  gradients stay XLA vmap-autodiff — the InKernelModel protocol
  deliberately excludes per-particle weight tensors, docs/DESIGN.md);
- n=1000 through throughput_config(1000, 303) — the fused tail does NOT
  fit at p=303 (VMEM gate), so the large-p branch selects the streaming
  Pallas tile (blk 256) + the one-kernel fused warm median (measured
  7% over the XLA phi at this shape, benchmarks/nn_phi_probe.py).

Prints one JSON line per config plus a summary. Slope numerators are
kept >= ~0.4 s (benchmarks/RESULTS.md r3 "slope noise" lesson).

Usage: python benchmarks/nn_bench.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from stein_tpu import Adam, SVGDSampler, throughput_config
from stein_tpu.models import BayesianNNModel
from bench import slope_time


def make_problem(n, n_hidden=100, n_obs=20, seed=0):
    """The example's data generator (y = cos(10x) * 5x + noise) and model
    (regression_neural_network/main.py:12-13); prior_beta=10 so the
    particles move through a non-degenerate posterior while we time them
    (the reference-default 0.01 collapses to the ARD mode — same compute
    per step, but timing a frozen cloud would be too easy)."""
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(n_obs, 1))
    y = rng.normal(np.cos(10 * X) * (5 * X), 0.1)
    model = BayesianNNModel(1, n_hidden, n_obs, n_obs, prior_beta=10.0)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    return model, batch


def make_sampler(model, n, seed=0, **kw):
    import jax
    return SVGDSampler(
        n_particles=n, log_p=model.log_p,
        param_template=model.template(),
        gd=Adam(learning_rate=1e-1, decay=0.999),
        key=jax.random.PRNGKey(seed), **kw,
    )


def main():
    out = {}
    p = 1 * 100 + 100 + 100 + 1 + 2
    configs = (
        # (label, n, sampler kwargs, K, R)
        ("n20_reference_defaults", 20, {}, 5000, 8),
        ("n20_tuned", 20, throughput_config(20, p), 10000, 8),
        ("n1000_tuned", 1000, throughput_config(1000, p), 2000, 6),
    )
    for label, n, kw, K, R in configs:
        model, batch = make_problem(n)
        s = make_sampler(model, n, **kw)
        t = slope_time(s, batch, K=K, R=R, reps=3)
        assert np.isfinite(np.asarray(s.samples)).all()
        res = {"config": label, "n": n, "p": p,
               "step_us": round(t * 1e6, 2),
               "updates_per_s": round(n / t, 1),
               "numerator_s": round((R - 1) * K * t, 3)}
        print(json.dumps(res), flush=True)
        out[label + "_step_us"] = round(t * 1e6, 2)
        out[label + "_updates_per_s"] = round(n / t, 1)

    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
