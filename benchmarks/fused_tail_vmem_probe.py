"""Probe: where is the fused tail's REAL VMEM frontier?

FUSED_STEP_VMEM_BUDGET is calibrated to the largest shape *measured* to
compile (n=1024/p=128/m=512 — exactly the n=1k bench config), but the
estimate behind it is deliberately conservative ("Mosaic's actual buffer
reuse keeps real usage below the estimate", ops/pallas_step.py) and no
one ever probed past it. The Bayesian-NN workload (n=1000, p=303,
estimate 23.4 MiB) is gated OUT by it and falls back to the streaming
tile + XLA tail at ~90 us/step (benchmarks/nn_phi_probe.py) — if the
one-kernel fused_gram tail actually compiles at that shape, the step
collapses to grads + ONE kernel and the gate should be recalibrated.

Two parts, one session:
1. Frontier map: raise the budget locally (probe-only monkeypatch) and
   attempt compile+run of the REAL fused_gram step at a ladder of
   shapes, recording compile-or-fail per shape.
2. A/B at the NN shape: full production NN step, tuned-tile config vs
   forced fused_gram, same warm fused median settings, slope-timed.

Usage: python benchmarks/fused_tail_vmem_probe.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

import stein_tpu.ops.pallas_step as ps
from stein_tpu import SVGDSampler, Adam, throughput_config
from stein_tpu.models import LinearRegressionModel
from benchmarks.nn_bench import make_problem, make_sampler
from bench import slope_time


def try_shape(n, p, m=512):
    """Compile + run ONE real fused_gram step at [n, p]; True on success."""
    from stein_tpu.ops.rbf import pairwise_sq_dists  # noqa: F401 (import check)
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    grads = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    gd = Adam(learning_rate=1e-1)
    sub = theta[:: max(1, n // m)][:m] if m < n else None
    try:
        out = ps.fused_warm_step_tail(
            theta, grads, None, None, jnp.float32(0.0),
            gd.init((n, p), jnp.float32), gd,
            gram_in_kernel=True, theta_sub=sub,
        )
        ok = bool(np.isfinite(np.asarray(out[0])).all())
        return ok, None
    except Exception as e:  # noqa: BLE001 — Mosaic failures are opaque
        return False, f"{type(e).__name__}: {str(e)[:160]}"


def main():
    est = ps.fused_step_vmem_bytes
    ladder = [
        (1024, 128, 512),   # the calibration point (must pass)
        (1024, 192, 512),
        (1024, 256, 512),
        (1000, 303, 512),   # the NN workload shape
        (1024, 384, 512),
        (1280, 303, 512),
        (1536, 256, 512),
        (2048, 128, 512),
        (1024, 512, 512),
    ]
    saved = ps.FUSED_STEP_VMEM_BUDGET
    ps.FUSED_STEP_VMEM_BUDGET = 1 << 40   # probe-only: disable the gate
    frontier = {}
    try:
        for n, p, m in ladder:
            ok, err = try_shape(n, p, m)
            mib = est(n, p, min(m, n)) / 2**20
            print(json.dumps({"shape": f"n{n}_p{p}_m{m}",
                              "estimate_mib": round(mib, 1),
                              "compiles": ok, "error": err}), flush=True)
            frontier[f"n{n}_p{p}"] = ok
    finally:
        ps.FUSED_STEP_VMEM_BUDGET = saved

    if not frontier.get("n1000_p303"):
        print(json.dumps({"summary": "NN shape does not compile; "
                                     "gate stands", "frontier": frontier}))
        return

    # Part 2: A/B the full NN step, one session.
    n, p = 1000, 303
    out = {}
    for label, kw, unlock in [
        ("tuned_tile", throughput_config(n, p), False),
        ("fused_gram", dict(median="bisect", median_passes=16,
                            warm_median=True, warm_passes=6,
                            median_impl="fused", step_impl="fused_gram"),
         True),
    ]:
        model, batch = make_problem(n)
        if unlock:
            ps.FUSED_STEP_VMEM_BUDGET = 1 << 40
        try:
            s = make_sampler(model, n, **kw)
            t = slope_time(s, batch, K=2000, R=6, reps=3)
        finally:
            ps.FUSED_STEP_VMEM_BUDGET = saved
        assert np.isfinite(np.asarray(s.samples)).all()
        print(json.dumps({"config": label, "step_us": round(t * 1e6, 2),
                          "updates_per_s": round(n / t, 1),
                          "numerator_s": round(5 * 2000 * t, 3)}),
              flush=True)
        out[label + "_us"] = round(t * 1e6, 2)
    print(json.dumps({"summary": out, "frontier": frontier}))


if __name__ == "__main__":
    main()
