"""Probe: do GENUINELY-bf16 operand buffers unlock the bf16 MXU rate
inside Mosaic kernels?

Round-2 established two negatives (benchmarks/RESULTS.md, pallas_variants):
in-kernel ``.astype(bfloat16)`` casts are folded away, and the dot's
``precision=DEFAULT`` attribute is ignored — both produce bitwise-f32
output at f32 timing. The untried lever (r2 verdict item #2): pass the
operands as REAL bf16 arrays (HBM buffer dtype) and/or stage through a
bf16 VMEM scratch — a buffer's dtype cannot be constant-folded.

Four experiments, all self-contained:

1. rate_*: micro matmul rate by operand buffer dtype ([1024,1024] x
   [1024,256] repeated over a G-step grid; TF/s from the slope).
2. tile_bf16_*: the n=10240 SVGD tile with the [n, 2p] gt operand as a
   real bf16 buffer; K either dotted directly (f32 x bf16 mixed) or
   staged through a bf16 VMEM scratch. Reports time + rel err vs the
   shipped f32 tile.
3. split_gram: D from a 3-way bf16 split of theta (6 bf16 dots ~ XLA
   HIGHEST quality) computed IN-kernel from real bf16 buffers — the
   candidate for absorbing the n=1k XLA Gram head into the fused tail.
   Reports rate + max D error vs the XLA HIGHEST Gram.
4. upper_skip: diagnostic tile that skips all j < i tiles (WRONG result)
   — bounds the ceiling of any symmetric-traversal scheme before
   engineering its accumulation.

Run on the TPU machine:  python benchmarks/bf16_operand_probe.py
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


# --------------------------------------------------------------- probe 1

def _rate_kernel(a_ref, b_ref, o_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                        preferred_element_type=jnp.float32)


def _rate_kernel_scratch(a_ref, b_ref, o_ref, s_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # Genuine bf16 store (buffer dtype bf16): cannot be folded.
    s_ref[:] = a_ref[:].astype(jnp.bfloat16)
    o_ref[:] += jnp.dot(s_ref[:], b_ref[:],
                        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("g", "scratch"))
def rate_probe(a, b, g=256, scratch=False):
    m, k = a.shape
    n = b.shape[1]
    kwargs = {}
    kern = _rate_kernel
    if scratch:
        kern = _rate_kernel_scratch
        kwargs["scratch_shapes"] = [pltpu.VMEM((m, k), jnp.bfloat16)]
    return pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        **kwargs,
    )(a, b)


# --------------------------------------------------------------- probe 2

def _tile_kernel_bf16(h2_ref, n_ref, rsq_i_ref, theta_i_ref, rsq_j_ref,
                      theta_j_ref, gt_j_ref, both_ref, ksum_ref, *extra,
                      staged):
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bj = theta_j_ref.shape[0]

    @pl.when(j == 0)
    def _():
        both_ref[:] = jnp.zeros_like(both_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    # D in f32 exactly as shipped (theta_j stays an f32 buffer).
    D = (
        rsq_i_ref[:]
        + rsq_j_ref[:].reshape(1, bj)
        - 2.0 * jnp.dot(theta_i_ref[:], theta_j_ref[:].T,
                        preferred_element_type=jnp.float32)
    )
    K = jnp.exp2(D / h2_ref[0] * (-1.4426950408889634 / 2.0))
    col = j * bj + jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
    K = jnp.where(col < n_valid, K, 0.0)

    if staged:
        (k_scratch,) = extra
        k_scratch[:] = K.astype(jnp.bfloat16)
        both_ref[:] += jnp.dot(k_scratch[:], gt_j_ref[:],
                               preferred_element_type=jnp.float32)
    else:
        # Mixed dtype dot: f32 K x bf16 gt buffer.
        both_ref[:] += jnp.dot(K, gt_j_ref[:],
                               preferred_element_type=jnp.float32)
    ksum_ref[:] += jnp.sum(K, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block", "staged"))
def tile_bf16_phi(theta, grads, h2, block=1024, staged=True):
    n, p = theta.shape
    f32 = jnp.float32
    bi = bj = block
    n_pad = -(-n // block) * block
    pad = n_pad - n
    theta_p = jnp.pad(theta, ((0, pad), (0, 0)))
    grads_p = jnp.pad(grads, ((0, pad), (0, 0)))
    gt_bf16 = jnp.concatenate(
        [grads_p, theta_p], axis=1
    ).astype(jnp.bfloat16)                       # REAL bf16 HBM buffer
    rsq = jnp.sum(theta_p * theta_p, axis=1, keepdims=True)
    grid = (n_pad // bi, n_pad // bj)
    kwargs = {}
    if staged:
        kwargs["scratch_shapes"] = [pltpu.VMEM((bi, bj), jnp.bfloat16)]
    both, ksum = pl.pallas_call(
        functools.partial(_tile_kernel_bf16, staged=staged),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bi, p), lambda i, j: (i, 0)),
            pl.BlockSpec((bj, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((bj, p), lambda i, j: (j, 0)),
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
      jnp.asarray(n, jnp.int32).reshape(1), rsq, theta_p, rsq, theta_p,
      gt_bf16)
    both = both[:n]
    ksum = ksum[:n]
    h2f = jnp.asarray(h2, f32)
    return (both[:, :p] + (ksum * theta - both[:, p:]) / h2f) / n


# --------------------------------------------------------------- probe 3

def split3_bf16(x):
    """3-way bf16 split: x ~ hi + mid + lo captures the full f32
    mantissa (8 bits per component)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _split_gram_kernel(a_ref, b_ref, o_ref, *, terms):
    """Gram from 3-way-split bf16 buffers a = [hi|mid|lo] ([m, 3p]):
    sum of the ``terms`` highest-order component products (6 ~ XLA
    HIGHEST's bf16_6x class)."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = a_ref.shape[1] // 3
    pairs = [(0, 0), (0, 1), (1, 0), (0, 2), (2, 0), (1, 1),
             (1, 2), (2, 1), (2, 2)][:terms]
    acc = jnp.zeros_like(o_ref)
    for ia, ib in pairs:
        acc += jnp.dot(a_ref[:, ia * p:(ia + 1) * p],
                       b_ref[:, ib * p:(ib + 1) * p].T,
                       preferred_element_type=jnp.float32)
    o_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("g", "terms"))
def split_gram(theta_split, g=64, terms=6):
    m = theta_split.shape[0]
    return pl.pallas_call(
        functools.partial(_split_gram_kernel, terms=terms),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((m, theta_split.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((m, theta_split.shape[1]), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, m), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, m), jnp.float32),
    )(theta_split, theta_split)


# --------------------------------------------------------------- probe 4

def _tile_kernel_upper(h2_ref, n_ref, rsq_i_ref, theta_i_ref, rsq_j_ref,
                       gt_j_ref, both_ref, ksum_ref):
    """DIAGNOSTIC ONLY (wrong result): computes only j >= i tiles to
    bound the ceiling of a symmetric-traversal scheme."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bj = gt_j_ref.shape[0]

    @pl.when(j == 0)
    def _():
        both_ref[:] = jnp.zeros_like(both_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    @pl.when(j >= i)
    def _():
        D = (
            rsq_i_ref[:]
            + rsq_j_ref[:].reshape(1, bj)
            - 2.0 * jnp.dot(theta_i_ref[:], gt_j_ref[:, theta_i_ref.shape[1]:].T,
                            preferred_element_type=jnp.float32)
        )
        K = jnp.exp2(D / h2_ref[0] * (-1.4426950408889634 / 2.0))
        col = j * bj + jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
        K = jnp.where(col < n_valid, K, 0.0)
        both_ref[:] += jnp.dot(K, gt_j_ref[:],
                               preferred_element_type=jnp.float32)
        ksum_ref[:] += jnp.sum(K, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block",))
def tile_upper_phi(theta, grads, h2, block=1024):
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
    both, ksum = pl.pallas_call(
        _tile_kernel_upper,
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
    )(jnp.asarray(h2, f32).reshape(1),
      jnp.asarray(n, jnp.int32).reshape(1), rsq, theta_p, rsq, gt)
    both = both[:n]
    ksum = ksum[:n]
    h2f = jnp.asarray(h2, f32)
    return (both[:, :p] + (ksum * theta - both[:, p:]) / h2f) / n


# ------------------------------------------------------------- harness

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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    emit(device=str(jax.devices()[0]))
    rng = np.random.default_rng(0)

    # ---- probe 1: raw in-kernel dot rate by operand buffer dtype.
    m, k, n = 1024, 1024, 256
    a32 = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    b32 = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    G = 512
    flops_per_call = 2.0 * m * k * n * G
    cases = [
        ("rate_f32xf32", a32, b32, False),
        ("rate_bf16xbf16", a32.astype(jnp.bfloat16),
         b32.astype(jnp.bfloat16), False),
        ("rate_f32xbf16", a32, b32.astype(jnp.bfloat16), False),
        ("rate_scratchbf16xbf16", a32, b32.astype(jnp.bfloat16), True),
    ]
    for name, a, b, scr in cases:
        try:
            def run(x, a=a, b=b, scr=scr):
                def body(c, _):
                    out = rate_probe(a, b, g=G, scratch=scr)
                    return c + 1e-12 * out[0, 0], None
                c, _ = jax.lax.scan(body, x, None, length=2)
                return c
            run_j = jax.jit(run)
            dts = sorted(
                slope_time(run_j, jnp.float32(0.0), 2) for _ in range(3)
            )
            emit(bench="rate", variant=name, ms_med=round(dts[1] * 1e3, 3),
                 tf_s=round(flops_per_call / dts[1] / 1e12, 1),
                 ms_all=[round(d * 1e3, 3) for d in dts])
        except Exception as e:  # noqa: BLE001
            emit(bench="rate", variant=name, error=str(e)[:300])

    # ---- probes 2 & 4: full n=10240 tile variants vs shipped.
    theta0 = jnp.asarray(rng.normal(size=(N, P)) * 0.1, jnp.float32)
    grads0 = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    h2 = jnp.float32(1.0)
    from stein_tpu.ops.pallas_svgd import pallas_svgd_phi
    ref = np.asarray(pallas_svgd_phi(theta0, grads0, h2))
    K = 500

    tile_cases = [
        ("tile_shipped_f32",
         lambda t: pallas_svgd_phi(t, grads0, h2, block_i=1024,
                                   block_j=1024)),
        ("tile_bf16_mixed_dot",
         lambda t: tile_bf16_phi(t, grads0, h2, staged=False)),
        ("tile_bf16_staged_scratch",
         lambda t: tile_bf16_phi(t, grads0, h2, staged=True)),
        ("tile_upper_skip_DIAGNOSTIC",
         lambda t: tile_upper_phi(t, grads0, h2)),
    ]
    for name, phi_fn in tile_cases:
        try:
            out = np.asarray(phi_fn(theta0))
            err = np.abs(out - ref).max() / np.abs(ref).max()

            def run(t, phi_fn=phi_fn):
                def body(tt, _):
                    return tt + 1e-6 * phi_fn(tt), None
                tt, _ = jax.lax.scan(body, t, None, length=K)
                return tt
            run_j = jax.jit(run)
            dts = sorted(slope_time(run_j, theta0, K) for _ in range(3))
            emit(bench="tile", variant=name,
                 ms_med=round(dts[1] * 1e3, 4),
                 ms_all=[round(d * 1e3, 4) for d in dts],
                 rel_err_vs_shipped=float(err))
        except Exception as e:  # noqa: BLE001
            emit(bench="tile", variant=name, error=str(e)[:300])

    # ---- probe 3: split-bf16 Gram (n=1k head candidate).
    m1k = 1024
    th = jnp.asarray(rng.normal(size=(m1k, P)) * 0.1, jnp.float32)
    hi, mid, lo = split3_bf16(th)
    th_split = jnp.concatenate([hi, mid, lo], axis=1)  # [m, 3P] bf16
    D_ref = np.asarray(
        jnp.sum(th * th, 1)[:, None] + jnp.sum(th * th, 1)[None, :]
        - 2.0 * jnp.matmul(th, th.T,
                           precision=jax.lax.Precision.HIGHEST))
    rsq = jnp.sum(th * th, 1)
    G2 = 256
    for terms in (3, 6):
        try:
            gram = np.asarray(split_gram(th_split, g=G2, terms=terms)) / G2
            D_got = (np.asarray(rsq)[:, None] + np.asarray(rsq)[None, :]
                     - 2.0 * gram)
            scale = np.median(D_ref[D_ref > 0])
            err = np.abs(D_got - D_ref).max()

            def run(x, terms=terms):
                def body(c, _):
                    out = split_gram(th_split, g=G2, terms=terms)
                    return c + 1e-12 * out[0, 0], None
                c, _ = jax.lax.scan(body, x, None, length=2)
                return c
            run_j = jax.jit(run)
            dts = sorted(
                slope_time(run_j, jnp.float32(0.0), 2) for _ in range(3)
            )
            fl = 2.0 * m1k * m1k * P * terms * G2
            emit(bench="split_gram", terms=terms,
                 ms_med=round(dts[1] * 1e3, 3),
                 tf_s=round(fl / dts[1] / 1e12, 1),
                 max_abs_err=float(err), med_D=float(scale),
                 rel_err=float(err / scale))
        except Exception as e:  # noqa: BLE001
            emit(bench="split_gram", terms=terms, error=str(e)[:300])


if __name__ == "__main__":
    main()
