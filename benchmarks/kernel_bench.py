"""Kernel-path microbenchmarks on the local accelerator.

Times the SVGD direction computation (the hot op) for the XLA materialising
path vs the Pallas streaming path across particle counts, plus the median
backends. Run: python benchmarks/kernel_bench.py
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
from stein_tpu.ops.median import (
    exact_median, subsampled_sq_dist_median, binned_median,
)
from stein_tpu.ops.pallas_svgd import pallas_svgd_phi


def timeit(fn, *args, warmup=3, iters=20):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="1024,4096,10240")
    ap.add_argument("--p", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    p = args.p
    for n in [int(s) for s in args.sizes.split(",")]:
        rng = np.random.default_rng(0)
        theta = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
        grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
        med = float(subsampled_sq_dist_median(theta, max_rows=256))
        h2 = med / np.log(n)

        sub_med = jax.jit(
            lambda t: subsampled_sq_dist_median(t, max_rows=256)
        )
        t_med_sub = timeit(sub_med, theta, iters=args.iters)

        bin_med = jax.jit(
            lambda t: binned_median(t, n_bins=2048, block_rows=512)
        )
        t_med_bin = timeit(bin_med, theta, iters=args.iters)

        if n <= 8192:
            ex_med = jax.jit(lambda t: exact_median(rbf.pairwise_sq_dists(t)))
            t_med_exact = timeit(ex_med, theta, iters=args.iters)
        else:
            t_med_exact = float("nan")

        xla_phi = jax.jit(
            lambda t, g: rbf.svgd_phi(t, g, median_fn=lambda D: jnp.float32(med))[0]
        )
        t_xla = timeit(xla_phi, theta, grads, iters=args.iters)

        t_pallas = timeit(
            lambda t, g: pallas_svgd_phi(t, g, h2, block_i=512, block_j=512),
            theta, grads, iters=args.iters,
        )

        # roofline: pure [n,n]x[n,2p] matmul for scale
        K = jnp.exp(-rbf.pairwise_sq_dists(theta) / h2 / 2.0)
        gt = jnp.concatenate([grads, theta], axis=1)
        mm = jax.jit(lambda K, gt: K @ gt)
        t_mm = timeit(mm, K, gt, iters=args.iters)

        flops = 2 * n * n * 3 * p
        print(
            f"n={n:6d} p={p}: xla_phi={t_xla*1e3:8.3f}ms "
            f"pallas_phi={t_pallas*1e3:8.3f}ms "
            f"({flops/t_pallas/1e12:5.1f} TF/s) "
            f"matmul_only={t_mm*1e3:8.3f}ms | median: "
            f"exact={t_med_exact*1e3:8.3f}ms sub={t_med_sub*1e3:7.3f}ms "
            f"binned={t_med_bin*1e3:7.3f}ms"
        )


if __name__ == "__main__":
    main()
