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
                 use_recip=False, skip_mask=False, ablate=None,
                 contract_bf16=False):
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bj = gt_j_ref.shape[0]

    @pl.when(j == 0)
    def _():
        both_ref[:] = jnp.zeros_like(both_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    theta_i = theta_i_ref[:]
    p = theta_i.shape[1]
    theta_j = gt_j_ref[:, p:].astype(jnp.float32)
    if ablate == "gram":
        # Diagnostic ONLY (wrong result): skip the Gram matmul to isolate
        # its share of the tile time.
        D = rsq_i_ref[:] + rsq_j_ref[:].reshape(1, bj)
    else:
        D = (
            rsq_i_ref[:]
            + rsq_j_ref[:].reshape(1, bj)
            - 2.0 * jnp.dot(theta_i, theta_j.T,
                            preferred_element_type=jnp.float32)
        )
    if ablate == "exp":
        # Diagnostic ONLY (wrong result): replace exp2 with a multiply to
        # isolate the transcendental's share.
        K = D * (1.0 / h2_ref[0])
    elif use_recip:
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
    if ablate == "contract":
        # Diagnostic ONLY (wrong result): drop the big contraction.
        both_ref[:] += K[:, :1] * gt_j_ref[:1, :].astype(jnp.float32)
    elif contract_bf16:
        # Mixed-precision candidate: Gram/D/exp stay f32, only the big
        # [B,B]x[B,2p] contraction drops input precision. NOTE: explicit
        # .astype(bfloat16) casts before the dot are FOLDED AWAY by
        # Mosaic (measured: bitwise-identical output and timing to the
        # f32 dot — 2026-08-17), so the request must go through the
        # dot's precision attribute instead.
        both_ref[:] += jax.lax.dot_general(
            K, gt_j_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
    else:
        both_ref[:] += jnp.dot(K, gt_j_ref[:],
                               preferred_element_type=jnp.float32)
    ksum_ref[:] += jnp.sum(K, axis=1, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("block", "use_exp2", "semantics",
                                    "use_recip", "skip_mask", "ablate",
                                    "contract_bf16"))
def variant_phi(theta, grads, h2, block=1024, use_exp2=False,
                semantics=False, use_recip=False, skip_mask=False,
                ablate=None, contract_bf16=False):
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
                          use_recip=use_recip, skip_mask=skip_mask,
                          ablate=ablate, contract_bf16=contract_bf16),
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
        # Component ablations (results are WRONG on purpose — they time
        # the tile with one stage removed to attribute the 0.45 ms):
        ("ablate_gram", dict(block=1024, use_exp2=True, ablate="gram")),
        ("ablate_exp", dict(block=1024, ablate="exp")),
        ("ablate_contract", dict(block=1024, use_exp2=True,
                                 ablate="contract")),
        # Mixed-precision candidate: ONLY the big contraction at
        # Precision.DEFAULT (1-pass bf16 inputs); Gram/D/exp stay f32.
        # (An earlier probe tried explicit bf16 casts before the dot —
        # Mosaic folded them away: bitwise-identical output + timing.)
        ("contract_prec_default", dict(block=1024, use_exp2=True,
                                       contract_bf16=True)),
        # Earlier sweeps (same harness):
        # - base-exp 0.478/0.481 ms; semantics hint no effect; exp2
        #   0.459/0.424 ms (adopted); blk2048 fails to compile (VMEM
        #   overflow, remote_compile HTTP 500).
        # - recip-hoist 0.490/0.482 (slower), nomask 0.457/0.454 (no
        #   effect), both 0.505/0.467 (no gain) — VPU op shaving doesn't
        #   move an exp-bound tile.
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
            # Three independent measures: the tunnel's run-to-run spread
            # reached 17% on one batch even at a ~1 s numerator, so single
            # readings cannot rank <10% differences.
            dts = sorted(slope_time(run, theta0, K) for _ in range(3))
            print(json.dumps({
                "bench": "pallas_variant", "variant": name,
                "ms_med": round(dts[1] * 1e3, 4),
                "ms_all": [round(d * 1e3, 4) for d in dts],
                "rel_err_vs_shipped": float(err),
            }), flush=True)
        except Exception as e:  # noqa: BLE001 (VMEM overflow etc.)
            print(json.dumps({
                "bench": "pallas_variant", "variant": name,
                "error": str(e)[:200],
            }), flush=True)


if __name__ == "__main__":
    main()
