"""Matmul-precision cost accounting on the real TPU (VERDICT r1 item 1).

Measures, with the two-length slope method (benchmarks/README: naive
timings on this tunneled chip measure enqueue latency):

1. Pure-matmul calibration: [n, n] x [n, 2p] at DEFAULT (bf16-input),
   HIGH (bf16_3x), HIGHEST (bf16_6x / f32-effective), and explicit
   bfloat16 inputs -> honest TF/s ceilings for each precision tier.
2. The fused XLA SVGD direction (gram + exp + contraction, no median) at
   DEFAULT / HIGH / HIGHEST -> the real cost of each deployable tier
   (ops/rbf.py ships HIGHEST Gram + HIGH contraction).

Prints one JSON line per measurement. Run on the TPU machine:
    python benchmarks/precision_bench.py
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

N = 10240
P = 128


def slope_time(fn, state, k_inner, n_dispatch=4, reps=3):
    """Per-inner-iteration seconds via the two-count slope (fixed fetch
    RTT cancels)."""
    state = fn(state)
    np.asarray(jax.tree_util.tree_leaves(state)[0])   # force

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            s = state
            t0 = time.perf_counter()
            for _ in range(n):
                s = fn(s)
            np.asarray(jax.tree_util.tree_leaves(s)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tn = timed(n_dispatch)
    return max(tn - t1, 1e-12) / ((n_dispatch - 1) * k_inner)


def bench_pure_matmul():
    """carry = 1e-3 * (A @ carry): one [N,N]x[N,2P] matmul per iteration."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(N, N)) / np.sqrt(N), jnp.float32)
    B0 = jnp.asarray(rng.normal(size=(N, 2 * P)), jnp.float32)
    flops = 2.0 * N * N * 2 * P
    K = 20

    # NB: A must be a jit ARGUMENT — a closure-captured 400 MB constant
    # gets baked into the remote-compile request and the axon tunnel
    # rejects it (HTTP 413).
    for name, kwargs in [
        ("default", dict(precision=jax.lax.Precision.DEFAULT)),
        ("high", dict(precision=jax.lax.Precision.HIGH)),
        ("highest", dict(precision=jax.lax.Precision.HIGHEST)),
    ]:
        @jax.jit
        def run_ab(Amat, B, kwargs=kwargs):
            def body(c, _):
                c = 1e-3 * jnp.matmul(
                    Amat, c, preferred_element_type=jnp.float32, **kwargs
                )
                return c, None
            c, _ = jax.lax.scan(body, B, None, length=K)
            return c
        run = lambda B, f=run_ab: f(A, B)
        dt = slope_time(run, B0, K)
        print(json.dumps({
            "bench": "pure_matmul", "precision": name,
            "ms": round(dt * 1e3, 4),
            "tflops": round(flops / dt / 1e12, 1),
        }), flush=True)

    # Explicit bf16 inputs, f32 accumulation.
    A16 = A.astype(jnp.bfloat16)

    @jax.jit
    def run16_ab(Amat, B):
        def body(c, _):
            c = 1e-3 * jnp.matmul(
                Amat, c.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return c, None
        c, _ = jax.lax.scan(body, B, None, length=K)
        return c
    dt = slope_time(lambda B: run16_ab(A16, B), B0, K)
    print(json.dumps({
        "bench": "pure_matmul", "precision": "bf16_inputs",
        "ms": round(dt * 1e3, 4),
        "tflops": round(flops / dt / 1e12, 1),
    }), flush=True)


def bench_phi_xla():
    """Fused XLA SVGD direction (fixed h2; gram + exp + contraction +
    rowsum) at DEFAULT vs HIGHEST — isolates the precision cost from the
    median."""
    rng = np.random.default_rng(1)
    theta0 = jnp.asarray(rng.normal(size=(N, P)) * 0.1, jnp.float32)
    grads0 = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    h2 = jnp.float32(1.0)
    K = 20

    for name, prec in [
        ("default", jax.lax.Precision.DEFAULT),
        ("high", jax.lax.Precision.HIGH),
        ("highest", jax.lax.Precision.HIGHEST),
    ]:
        @jax.jit
        def run(theta, prec=prec):
            def body(t, _):
                r = jnp.sum(t * t, axis=1, keepdims=True)
                D = r + r.T - 2.0 * jnp.matmul(
                    t, t.T, preferred_element_type=jnp.float32,
                    precision=prec,
                )
                Km = jnp.exp(-D / h2 / 2.0)
                ksum = jnp.sum(Km, axis=1, keepdims=True)
                both = jnp.matmul(
                    Km, jnp.concatenate([grads0, t], axis=1),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                phi = (both[:, :P] + (ksum * t - both[:, P:]) / h2) / N
                return t + 1e-6 * phi, None
            t, _ = jax.lax.scan(body, theta, None, length=K)
            return t
        dt = slope_time(run, theta0, K)
        print(json.dumps({
            "bench": "phi_xla_no_median", "precision": name,
            "n": N, "p": P, "ms": round(dt * 1e3, 4),
        }), flush=True)


def bench_pallas_phi():
    """The Pallas streaming tile (f32 and bf16 mxu variants) for the
    TF/s-claim reconciliation."""
    from stein_tpu.ops.pallas_svgd import pallas_svgd_phi
    rng = np.random.default_rng(2)
    theta0 = jnp.asarray(rng.normal(size=(N, P)) * 0.1, jnp.float32)
    grads0 = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    h2 = jnp.float32(1.0)
    K = 20
    # "useful" flops: gram (n^2 p) + contraction (n^2 2p), x2 for MAC.
    flops = 2.0 * N * N * 3 * P

    for prec in ["f32", "bf16"]:
        @jax.jit
        def run(theta, prec=prec):
            def body(t, _):
                phi = pallas_svgd_phi(t, grads0, h2, precision=prec)
                return t + 1e-6 * phi, None
            t, _ = jax.lax.scan(body, theta, None, length=K)
            return t
        dt = slope_time(run, theta0, K)
        print(json.dumps({
            "bench": "pallas_phi", "precision": prec,
            "n": N, "p": P, "ms": round(dt * 1e3, 4),
            "tflops_equiv": round(flops / dt / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    bench_pure_matmul()
    bench_phi_xla()
    bench_pallas_phi()
