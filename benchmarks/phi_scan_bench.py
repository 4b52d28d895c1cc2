"""True per-step phi compute time: scan K phi computations inside ONE
dispatch so the ~1.6ms tunnel latency doesn't drown the kernel.

Run: python benchmarks/phi_scan_bench.py [--sizes 4096,10240] [--p 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stein_tpu.ops import rbf
from stein_tpu.ops.pallas_svgd import pallas_svgd_phi


def scan_time(phi_fn, theta, grads, k_small=10, k_big=110, reps=3):
    """Per-phi device time via the two-length slope method: time a k-step
    chain (output feeds input, result fetched to host) at two lengths and
    take the slope — fixed dispatch/fetch RTTs cancel. block_until_ready
    is unreliable on tunneled devices, so a scalar fetch forces
    completion."""
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def chain(theta, grads, k):
        def body(carry, _):
            phi = phi_fn(carry, grads)
            # keep the chain honest: next theta depends on phi
            return carry + 1e-6 * phi, None
        out, _ = jax.lax.scan(body, theta, None, length=k)
        return jnp.sum(out)

    def timed(k):
        float(chain(theta, grads, k))  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(theta, grads, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_big) - timed(k_small)) / (k_big - k_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="4096,10240")
    ap.add_argument("--p", type=int, default=128)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--blocks", type=str, default="256,512,1024")
    args = ap.parse_args()

    p = args.p
    for n in [int(s) for s in args.sizes.split(",")]:
        rng = np.random.default_rng(0)
        theta = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
        grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
        h2 = 2.0 * p  # fixed plausible bandwidth; phi cost is h2-independent

        t_xla = scan_time(
            lambda t, g: rbf.svgd_phi(
                t, g, median_fn=lambda D: jnp.float32(h2)
            )[0],
            theta, grads,
        )
        flops = 2 * n * n * 3 * p
        line = (f"n={n:6d} p={p}: xla={t_xla*1e3:7.3f}ms "
                f"({flops/t_xla/1e12:5.1f} TF/s)")
        for b in [int(x) for x in args.blocks.split(",")]:
            t_pl = scan_time(
                lambda t, g, b=b: pallas_svgd_phi(
                    t, g, jnp.float32(h2), block_i=b, block_j=b
                ),
                theta, grads,
            )
            line += (f" | pallas[{b}]={t_pl*1e3:7.3f}ms "
                     f"({flops/t_pl/1e12:5.1f} TF/s)")
        print(line)


if __name__ == "__main__":
    main()
