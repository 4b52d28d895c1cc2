"""Same-session A/B of the streaming tile's column-operand layout:
one concatenated [n, 2p] (theta | u) input block vs two separate [n, p]
blocks. Cross-batch readings conflicted (concat 0.256 vs split 0.328 in
isolated probes, but the split batch's full bench read FASTER) — the
tunnel's batch-to-batch variance (memory: 2x outliers observed) makes
only same-session alternating measurements trustworthy.

Run on the TPU machine:  python benchmarks/tile_form_ab.py
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

N, P = 10240, 128


def _kernel(h2_ref, n_ref, rsq_i_ref, theta_i_ref, rsq_j_ref, *refs,
            split):
    if split:
        theta_j_ref, u_j_ref, ku_ref, ksum_ref = refs
    else:
        tu_j_ref, ku_ref, ksum_ref = refs
    j = pl.program_id(1)
    n_valid = n_ref[0]
    p = theta_i_ref.shape[1]
    if split:
        theta_j = theta_j_ref[:]
        u_j = u_j_ref[:]
    else:
        theta_j = tu_j_ref[:, :p]
        u_j = tu_j_ref[:, p:]
    bj = theta_j.shape[0]

    @pl.when(j == 0)
    def _():
        ku_ref[:] = jnp.zeros_like(ku_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    D = (rsq_i_ref[:] + rsq_j_ref[:].reshape(1, bj)
         - 2.0 * jnp.dot(theta_i_ref[:], theta_j.T,
                         preferred_element_type=jnp.float32))
    K = jnp.exp2(D / h2_ref[0] * (-1.4426950408889634 / 2.0))
    col = j * bj + jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
    K = jnp.where(col < n_valid, K, 0.0)
    ku_ref[:] += jnp.dot(K, u_j, preferred_element_type=jnp.float32)
    ksum_ref[:] += jnp.sum(K, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block", "split"))
def phi(theta, grads, h2, block=1024, split=False):
    n, p = theta.shape
    f32 = jnp.float32
    b = block
    n_pad = -(-n // b) * b
    pad = n_pad - n
    theta_p = jnp.pad(theta, ((0, pad), (0, 0)))
    grads_p = jnp.pad(grads, ((0, pad), (0, 0)))
    h2f = jnp.asarray(h2, f32)
    u = grads_p - theta_p / h2f
    rsq = jnp.sum(theta_p * theta_p, axis=1, keepdims=True)
    grid = (n_pad // b, n_pad // b)
    base_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((b, 1), lambda i, j: (i, 0)),
        pl.BlockSpec((b, p), lambda i, j: (i, 0)),
        pl.BlockSpec((b, 1), lambda i, j: (j, 0)),
    ]
    if split:
        in_specs = base_specs + [
            pl.BlockSpec((b, p), lambda i, j: (j, 0)),
            pl.BlockSpec((b, p), lambda i, j: (j, 0)),
        ]
        operands = (theta_p, u)
    else:
        in_specs = base_specs + [
            pl.BlockSpec((b, 2 * p), lambda i, j: (j, 0)),
        ]
        operands = (jnp.concatenate([theta_p, u], axis=1),)
    ku, ksum = pl.pallas_call(
        functools.partial(_kernel, split=split),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, p), lambda i, j: (i, 0)),
            pl.BlockSpec((b, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, p), f32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
        ],
    )(jnp.asarray(h2, f32).reshape(1),
      jnp.asarray(n, jnp.int32).reshape(1), rsq, theta_p, rsq, *operands)
    return (ku[:n] + ksum[:n] * theta / h2f) / n


def slope(fn, state, k, n_dispatch=6, reps=4):
    s = fn(state)
    np.asarray(s)

    def timed(n):
        best = float("inf")
        for _ in range(reps):
            x = state
            t0 = time.perf_counter()
            for _ in range(n):
                x = fn(x)
            np.asarray(x)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tn = timed(n_dispatch)
    return max(tn - t1, 1e-12) / ((n_dispatch - 1) * k)


def main():
    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    rng = np.random.default_rng(0)
    theta0 = jnp.asarray(rng.normal(size=(N, P)) * 0.1, jnp.float32)
    grads0 = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    h2 = jnp.float32(1.0)
    K = 500

    runners = {}
    for split in (False, True):
        def run(t, split=split):
            def body(tt, _):
                return tt + 1e-6 * phi(tt, grads0, h2, split=split), None
            tt, _ = jax.lax.scan(body, t, None, length=K)
            return tt
        runners[split] = jax.jit(run)
        # compile + correctness cross-check
        out = np.asarray(phi(theta0, grads0, h2, split=split))
        if split:
            err = np.abs(out - ref).max() / np.abs(ref).max()
            print(json.dumps({"split_vs_concat_rel_err": float(err)}),
                  flush=True)
        else:
            ref = out

    # Alternate measurements so slow drift affects both forms equally.
    times = {False: [], True: []}
    for _ in range(4):
        for split in (False, True):
            times[split].append(slope(runners[split], theta0, K))
    for split in (False, True):
        ts = sorted(times[split])
        print(json.dumps({
            "form": "split" if split else "concat",
            "ms_med": round(1e3 * ts[len(ts) // 2], 4),
            "ms_all": [round(1e3 * t, 4) for t in ts],
        }), flush=True)


if __name__ == "__main__":
    main()
