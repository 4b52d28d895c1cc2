"""Pallas SVGD-tile variant experiments (n=10240 phi floor).

The shipped kernel (ops/pallas_svgd.py) measures ~0.45-0.48 ms at
n=10240/p=128 — 166 TF/s-equivalent, near the chip's f32 MXU rate. This
bench probes the remaining levers on a self-contained copy of the tile:

- dimension_semantics=("parallel", "arbitrary"): tells Mosaic the row
  grid axis is parallel (pipelining hint).
- exp2 instead of exp (K = 2^(D * -log2(e)/(2 h^2))) — same math, possibly
  a cheaper VPU path.
- tile size 2048 (VMEM pressure test; 1024 is the shipped default).

Winners get promoted into ops/pallas_svgd.py. Run on the TPU machine:
    python benchmarks/pallas_variants.py
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


def _tile_kernel(h2_ref, n_ref, rsq_i_ref, theta_i_ref, rsq_j_ref,
                 gt_j_ref, both_ref, ksum_ref, *, use_exp2,
                 use_recip=False, skip_mask=False):
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bj = gt_j_ref.shape[0]

    @pl.when(j == 0)
    def _():
        both_ref[:] = jnp.zeros_like(both_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    theta_i = theta_i_ref[:]
    p = theta_i.shape[1]
    theta_j = gt_j_ref[:, p:]
    D = (
        rsq_i_ref[:]
        + rsq_j_ref[:].reshape(1, bj)
        - 2.0 * jnp.dot(theta_i, theta_j.T,
                        preferred_element_type=jnp.float32)
    )
    if use_recip:
        # Fold 1/h2 into a per-tile SCALAR so the per-element path is a
        # single multiply before exp2 (no per-element division).
        c = (-1.4426950408889634 / 2.0) / h2_ref[0]
        K = jnp.exp2(D * c)
    elif use_exp2:
        c = -1.4426950408889634 / 2.0            # -log2(e)/2
        K = jnp.exp2(D / h2_ref[0] * c)
    else:
        K = jnp.exp(-D / h2_ref[0] / 2.0)
    if not skip_mask:
        col = j * bj + jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
        K = jnp.where(col < n_valid, K, 0.0)
    both_ref[:] += jnp.dot(K, gt_j_ref[:],
                           preferred_element_type=jnp.float32)
    ksum_ref[:] += jnp.sum(K, axis=1, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("block", "use_exp2", "semantics",
                                    "use_recip", "skip_mask"))
def variant_phi(theta, grads, h2, block=1024, use_exp2=False,
                semantics=False, use_recip=False, skip_mask=False):
    n, p = theta.shape
    f32 = jnp.float32
    bi = bj = block
    n_pad = -(-n // block) * block
    pad = n_pad - n
    theta_p = jnp.pad(theta, ((0, pad), (0, 0)))
    grads_p = jnp.pad(grads, ((0, pad), (0, 0)))
    gt = jnp.concatenate([grads_p, theta_p], axis=1)
    rsq = jnp.sum(theta_p * theta_p, axis=1, keepdims=True)
    grid = (n_pad // bi, n_pad // bj)
    kwargs = {}
    if semantics:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        )
    both, ksum = pl.pallas_call(
        functools.partial(_tile_kernel, use_exp2=use_exp2,
                          use_recip=use_recip, skip_mask=skip_mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bi, p), lambda i, j: (i, 0)),
            pl.BlockSpec((bj, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((bj, 2 * p), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bi, 2 * p), lambda i, j: (i, 0)),
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 2 * p), f32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
        ],
        **kwargs,
    )(jnp.asarray(h2, f32).reshape(1),
      jnp.asarray(n, jnp.int32).reshape(1), rsq, theta_p, rsq, gt)
    both = both[:n]
    ksum = ksum[:n]
    h2f = jnp.asarray(h2, f32)
    return (both[:, :p] + (ksum * theta - both[:, p:]) / h2f) / n


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


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(0)
    theta0 = jnp.asarray(rng.normal(size=(N, P)) * 0.1, jnp.float32)
    grads0 = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    h2 = jnp.float32(1.0)
    # Numerator rule (axon tunnel): (n_dispatch-1)*K*step must be >= ~0.4 s
    # or timings bounce +-25%.  At ~0.3 ms/step, K=500 with 6 dispatches
    # gives a ~0.75 s numerator.  batch9's K=20 run (33 ms numerator) showed
    # implausible spreads (0.08..0.69 ms for near-identical kernels).
    K = 500

    # Correctness cross-check target (shipped kernel).
    from stein_tpu.ops.pallas_svgd import pallas_svgd_phi
    ref = np.asarray(pallas_svgd_phi(theta0, grads0, h2))

    variants = [
        ("blk1024_exp2", dict(block=1024, use_exp2=True)),
        # VPU-op-count attack: the tile is exp/VPU-bound, so shave
        # per-element ops — fold 1/h2 into a per-tile scalar (drops a
        # per-element divide) and drop the padded-column mask when n is
        # block-aligned (iota + compare + select = 3 ops/element; n=10240
        # IS aligned to 1024).
        ("blk1024_recip", dict(block=1024, use_recip=True)),
        ("blk1024_nomask", dict(block=1024, use_exp2=True,
                                skip_mask=True)),
        ("blk1024_recip_nomask", dict(block=1024, use_recip=True,
                                      skip_mask=True)),
        # ("blk2048", dict(block=2048)) fails to compile on this chip:
        # remote_compile HTTP 500 (tpu_compile_helper exit 1) — VMEM
        # overflow for the 2048x2048 f32 tile + 2048x256 operands.
        # Earlier sweep (same harness): base-exp 0.478/0.481 ms,
        # semantics hint no effect, exp2 0.459/0.424 ms (adopted).
    ]
    for name, kw in variants:
        try:
            out = np.asarray(variant_phi(theta0, grads0, h2, **kw))
            err = np.abs(out - ref).max() / np.abs(ref).max()

            @jax.jit
            def run(theta, kw=kw):
                def body(t, _):
                    phi = variant_phi(t, grads0, h2, **kw)
                    return t + 1e-6 * phi, None
                t, _ = jax.lax.scan(body, theta, None, length=K)
                return t
            dt = slope_time(run, theta0, K)
            dt2 = slope_time(run, theta0, K)   # independent re-measure
            print(json.dumps({
                "bench": "pallas_variant", "variant": name,
                "ms": round(dt * 1e3, 4), "ms2": round(dt2 * 1e3, 4),
                "rel_err_vs_shipped": float(err),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 (VMEM overflow etc.)
            print(json.dumps({
                "bench": "pallas_variant", "variant": name,
                "error": str(e)[:200],
            }), flush=True)


if __name__ == "__main__":
    main()
