"""Probe: off-origin robustness of the in-kernel (bf16-class) D.

The Pallas paths compute D = r + r^T - 2 T T^T with the in-kernel dot
(bf16-class inputs, RESULTS.md r3). That error scales with ||theta||^2,
while D itself scales with the CLOUD SPREAD — so for posteriors far
from the origin (||mean|| >> spread) the class degrades without bound.
D is translation-invariant, so centering theta at its mean before the
Gram bounds the error relative to D's own scale; the phi combine is
algebraically unchanged by translation (the repulsive term only sees
differences: ksum*(theta-c) - K@(theta-c) = ksum*theta - K@theta).

This probe measures phi error vs the XLA-HIGHEST reference as the cloud
shifts off-origin, for the shipped tile and a centered variant.

Run on the TPU machine:  python benchmarks/centering_probe.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    from stein_tpu.ops.pallas_svgd import pallas_svgd_phi
    from stein_tpu.ops.rbf import svgd_phi

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(0)
    n, p = 1024, 128
    spread = 0.05
    base = rng.normal(size=(n, p)) * spread
    grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)

    for shift in (0.0, 1.0, 10.0, 100.0):
        theta64 = base + shift / np.sqrt(p)
        theta = jnp.asarray(theta64, jnp.float32)
        # f64 reference phi (exact median, closed form).
        t64 = np.asarray(theta, np.float64)
        D64 = (np.sum(t64 * t64, 1)[:, None] + np.sum(t64 * t64, 1)[None, :]
               - 2.0 * t64 @ t64.T)
        med = np.median(D64)
        h2 = med / np.log(n)
        K64 = np.exp(-D64 / h2 / 2.0)
        g64 = np.asarray(grads, np.float64)
        phi64 = (K64 @ g64
                 + (K64.sum(1)[:, None] * t64 - K64 @ t64) / h2) / n
        scale = np.abs(phi64).max()

        # Shipped tile (in-kernel D, bf16-class).
        got = np.asarray(pallas_svgd_phi(
            theta, grads, jnp.float32(h2), block_i=512, block_j=512))
        err_raw = np.abs(got - phi64).max() / scale

        # Centered variant: same kernel fed theta - mean (D exact-
        # translation-invariant; combine provably unchanged).
        c = jnp.mean(theta, axis=0, keepdims=True)
        got_c = np.asarray(pallas_svgd_phi(
            theta - c, grads, jnp.float32(h2), block_i=512, block_j=512))
        err_centered = np.abs(got_c - phi64).max() / scale

        # XLA HIGHEST engine for calibration.
        xla = np.asarray(jax.jit(
            lambda t, g: svgd_phi(t, g, median_fn=lambda D: jnp.median(D))[0]
        )(theta, grads))
        err_xla = np.abs(xla - phi64).max() / scale

        print(json.dumps({
            "shift_norm_per_sqrtp": shift, "spread": spread,
            "med_D": float(med),
            "rel_err_tile_raw": float(err_raw),
            "rel_err_tile_centered": float(err_centered),
            "rel_err_xla_highest": float(err_xla),
        }), flush=True)


if __name__ == "__main__":
    main()
