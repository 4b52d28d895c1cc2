"""Isolate the large-n step TAIL: XLA (combine + norm + clip + Adam) vs
the fused epilogue kernel, same session, fixed tile outputs.

The full-step A/B (epilogue_ab.py) measured a wash; this probe decides
whether the epilogue kernel itself is slow (pipelining/SMEM-out stalls)
or the XLA tail was already at the HBM floor and the breakdown's 175 us
"clip_adam_rest" includes costs both variants pay.

Usage: python benchmarks/epilogue_stage_probe.py [n] [p]
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

from step_breakdown import slope_scan
from stein_tpu import Adam
from stein_tpu.ops.pallas_step import fused_epilogue


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, f32)
    ku = jnp.asarray(rng.normal(size=(n, p)), f32)
    ksum = jnp.asarray(rng.uniform(1.0, 5.0, size=(n, 1)), f32)
    center = jnp.mean(theta0, axis=0, keepdims=True)
    h2 = jnp.float32(1.3)
    gd = Adam(learning_rate=1e-4)
    opt0 = gd.init((n, p), f32)
    cmax = jnp.float32(10.0)

    def s_xla_tail(carry):
        theta, opt = carry
        phi = (ku + ksum * (theta - center) / h2) / n
        norm = jnp.sqrt(jnp.sum(phi * phi))
        phi = phi * (cmax / jnp.maximum(cmax, norm))
        delta, opt2 = gd.update(opt, phi)
        return theta + delta, opt2

    def make_epi(block_rows):
        def s_epi(carry):
            theta, opt = carry
            phi = (ku + ksum * (theta - center) / h2) / n
            norm = jnp.sqrt(jnp.sum(phi * phi))
            new_theta, opt2 = fused_epilogue(
                ku, ksum, theta, center, h2, norm, opt, gd,
                max_phi_norm=10.0, block_rows=block_rows,
            )
            return new_theta, opt2
        return s_epi

    # K large enough that the slope numerator (R-1)*K*step dominates the
    # tunnel's 30-110 ms fetch-RTT variance even for ~10 us tails
    # (first run with K=400 read 1.4-45 us pure noise).
    out = {"bench": "epilogue_stage_probe", "n": n, "p": p}
    out["xla_tail_us"] = round(
        slope_scan(s_xla_tail, (theta0, opt0), K=20000, R=4,
                   reps=3) * 1e6, 1)
    for br in (1024, 2048, 4096):
        out[f"epilogue_br{br}_us"] = round(
            slope_scan(make_epi(br), (theta0, opt0), K=20000, R=4,
                       reps=3) * 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
