"""Round-3 lever measurements: the symmetric-traversal tile (n=10240)
and the in-kernel-Gram fused step (n=1000), plus the precision audit of
the in-kernel f32 dot that justifies fused_gram.

Run on the TPU machine:  python benchmarks/sym_and_gram_bench.py
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 10240
P = 128


def emit(**kw):
    print(json.dumps(kw), flush=True)


def slope_time(fn, state, k_inner, n_dispatch=6, reps=4):
    state = fn(state)
    np.asarray(state)

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            s = state
            t0 = time.perf_counter()
            for _ in range(n):
                s = fn(s)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tn = timed(n_dispatch)
    return max(tn - t1, 1e-12) / ((n_dispatch - 1) * k_inner)


# ---------------------------------------------- in-kernel D precision

def _d_kernel(rsq_ref, theta_ref, d_ref):
    rsq = rsq_ref[:]
    n = theta_ref.shape[0]
    d_ref[:] = (rsq + rsq.reshape(1, n)
                - 2.0 * jnp.dot(theta_ref[:], theta_ref[:].T,
                                preferred_element_type=jnp.float32))


@jax.jit
def inkernel_D(theta):
    n = theta.shape[0]
    rsq = jnp.sum(theta * theta, axis=1, keepdims=True)
    return pl.pallas_call(
        _d_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
    )(rsq, theta)


def precision_audit():
    rng = np.random.default_rng(0)
    th64 = rng.normal(size=(1024, P)) * 0.1
    th = jnp.asarray(th64, jnp.float32)
    th32 = np.asarray(th, np.float64)       # the f32-rounded values, in f64
    rsq64 = np.sum(th32 * th32, axis=1)
    D64 = rsq64[:, None] + rsq64[None, :] - 2.0 * th32 @ th32.T

    D_kernel = np.asarray(inkernel_D(th), np.float64)
    rsq = jnp.sum(th * th, axis=1)
    D_hi = np.asarray(
        rsq[:, None] + rsq[None, :]
        - 2.0 * jnp.matmul(th, th.T, precision=jax.lax.Precision.HIGHEST),
        np.float64,
    )
    scale = float(np.median(D64[D64 > 0]))
    emit(bench="inkernel_D_precision",
         max_err_kernel_vs_f64=float(np.abs(D_kernel - D64).max()),
         max_err_xla_highest_vs_f64=float(np.abs(D_hi - D64).max()),
         max_err_kernel_vs_highest=float(np.abs(D_kernel - D_hi).max()),
         med_D=scale)


# ---------------------------------------------- n=10240 phi variants

def phi_variants():
    from stein_tpu.ops.pallas_svgd import (
        pallas_svgd_phi,
        pallas_svgd_phi_sym,
    )

    rng = np.random.default_rng(0)
    theta0 = jnp.asarray(rng.normal(size=(N, P)) * 0.1, jnp.float32)
    grads0 = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    h2 = jnp.float32(1.0)
    K = 500
    ref = np.asarray(pallas_svgd_phi(theta0, grads0, h2, block_i=1024,
                                     block_j=1024))

    cases = [
        ("full_blk1024",
         lambda t: pallas_svgd_phi(t, grads0, h2, block_i=1024,
                                   block_j=1024)),
        ("full_blk512",
         lambda t: pallas_svgd_phi(t, grads0, h2, block_i=512,
                                   block_j=512)),
        ("sym_blk512",
         lambda t: pallas_svgd_phi_sym(t, grads0, h2, block=512)),
        ("sym_blk768",
         lambda t: pallas_svgd_phi_sym(t, grads0, h2, block=768)),
        ("sym_blk1024_expect_vmem",
         lambda t: pallas_svgd_phi_sym(t, grads0, h2, block=1024)),
    ]
    for name, fn in cases:
        try:
            out = np.asarray(fn(theta0))
            err = np.abs(out - ref).max() / np.abs(ref).max()

            def run(t, fn=fn):
                def body(tt, _):
                    return tt + 1e-6 * fn(tt), None
                tt, _ = jax.lax.scan(body, t, None, length=K)
                return tt
            run_j = jax.jit(run)
            dts = sorted(slope_time(run_j, theta0, K) for _ in range(3))
            emit(bench="phi10240", variant=name,
                 ms_med=round(dts[1] * 1e3, 4),
                 ms_all=[round(d * 1e3, 4) for d in dts],
                 rel_err_vs_shipped=float(err))
        except Exception as e:  # noqa: BLE001
            emit(bench="phi10240", variant=name, error=str(e)[:300])


# ---------------------------------------------- n=1000 full step

def step_variants():
    import bench as benchmod

    X, y, theta0 = benchmod.make_data(1000)
    for name, kw in [
        ("step_fused", dict(median="bisect", warm_median=True,
                            step_impl="fused", median_impl="fused")),
        ("step_fused_gram", dict(median="bisect", warm_median=True,
                                 step_impl="fused_gram",
                                 median_impl="fused")),
    ]:
        try:
            sampler, batch = benchmod.make_sampler(X, y, theta0, **kw)
            dts = sorted(
                benchmod.slope_time(sampler, batch, K=2000, R=4)
                for _ in range(3)
            )
            emit(bench="step1000", variant=name,
                 us_med=round(dts[1] * 1e6, 2),
                 us_all=[round(d * 1e6, 2) for d in dts])
        except Exception as e:  # noqa: BLE001
            emit(bench="step1000", variant=name, error=str(e)[:300])

    # Trajectory agreement on-chip: fused vs fused_gram over 50 steps.
    try:
        a, batch = benchmod.make_sampler(
            X, y, theta0, median="bisect", warm_median=True,
            step_impl="fused", median_impl="fused",
        )
        b, _ = benchmod.make_sampler(
            X, y, theta0, median="bisect", warm_median=True,
            step_impl="fused_gram", median_impl="fused",
        )
        a.run(batch, 50)
        b.run(batch, 50)
        sa, sb = a.samples, b.samples
        emit(bench="step1000_fidelity",
             rel_err=float(np.abs(sb - sa).max() / np.abs(sa).max()))
    except Exception as e:  # noqa: BLE001
        emit(bench="step1000_fidelity", error=str(e)[:300])


def main():
    emit(device=str(jax.devices()[0]))
    precision_audit()
    step_variants()
    phi_variants()


if __name__ == "__main__":
    main()
