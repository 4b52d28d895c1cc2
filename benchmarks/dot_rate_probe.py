"""Probe: what actually limits the in-kernel Mosaic dot to ~177 TF/s?

The n=10240 streaming tile has been flat at ~0.47 ms for three rounds;
the repo's own calibration shows the same chip running an XLA DEFAULT
matmul at 930 TF/s while the in-kernel dot measured 177 TF/s
(benchmarks/RESULTS.md r2/r3) — a 5.3x rate gap that was never
decomposed. Two confounds in the r3 rate probe
(bf16_operand_probe.rate_probe):

1. ONE dot per grid step: a [1024,1024]x[1024,256] dot is 0.58 us of
   MXU work at the DEFAULT rate — if each grid step pays ~2 us of
   fixed sequencing overhead, the measurement reads ~180 TF/s no
   matter how fast the MXU is. Probe A repeats the dot R times
   INSIDE one grid step (fori_loop, per-iteration SMEM scale on the
   smaller operand so nothing is loop-invariant) to isolate the pure
   issue rate; probe B measures the same total FLOPs at 1 vs R dots
   per grid step — the difference IS the per-grid-step overhead.
2. One shape: the production contraction K@u is [B,B]x[B,128] —
   output only 128 lanes wide. If the MXU on this chip is wider than
   128 (the 930 TF/s calibration suggests v6e-class hardware), a
   128-wide output strands the array. Probe A sweeps M/K/N including
   the TRANSPOSED contraction u^T@K ([128,B]x[B,B] — output 1024
   lanes wide), which computes the same phi tile via
   phi^T[:, i] = sum_j u_j^T @ K_ji.

Probe C then runs full n=10240 tile variants end-to-end: the shipped
kernel, a transposed-accumulation (phiT) kernel, and a j-chunked
kernel (two column sub-tiles per grid step — halves the grid).

Run on the TPU machine:  python benchmarks/dot_rate_probe.py
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


# ------------------------------------------------------------- probe A/B

def _loop_rate_kernel(s_ref, a_ref, b_ref, o_ref, *, R, scale_side):
    """R dots inside ONE grid step; the ``scale_side`` operand is scaled
    by a per-iteration SMEM scalar so no dot is loop-invariant (the
    scale costs |operand| VPU ops/iter — choose the smaller side)."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a0 = a_ref[:]
    b0 = b_ref[:]

    def body(i, acc):
        sc = s_ref[i]
        a = a0 * sc if scale_side == "lhs" else a0
        b = b0 * sc if scale_side == "rhs" else b0
        return acc + jnp.dot(a, b, preferred_element_type=jnp.float32)

    o_ref[:] += jax.lax.fori_loop(0, R, body, jnp.zeros_like(o_ref))


@functools.partial(jax.jit, static_argnames=("g", "r", "scale_side"))
def loop_rate_probe(s, a, b, g=64, r=8, scale_side="rhs"):
    m, k = a.shape
    n = b.shape[1]
    return pl.pallas_call(
        functools.partial(_loop_rate_kernel, R=r, scale_side=scale_side),
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(s, a, b)


# --------------------------------------------------------------- probe C

def _phiT_tile_kernel(h2_ref, n_ref, rsq_i_ref, theta_i_ref, rsq_j_ref,
                      theta_j_ref, uT_j_ref, phiT_ref, ksum_ref):
    """Transposed-accumulation tile: computes K_ji = exp2 tile with j as
    ROWS, then phi^T[:, i-block] += u_j^T @ K_ji — the contraction's
    output is [p, bi] (bi lanes wide) instead of [bi, p] (p lanes).
    ksum arrives as a [1, bi] column-sum of K_ji accumulated over j."""
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bj = theta_j_ref.shape[0]
    bi = theta_i_ref.shape[0]

    @pl.when(j == 0)
    def _():
        phiT_ref[:] = jnp.zeros_like(phiT_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    D = (
        rsq_j_ref[:]                               # [bj, 1]
        + rsq_i_ref[:].reshape(1, bi)              # [1, bi]
        - 2.0 * jnp.dot(theta_j_ref[:], theta_i_ref[:].T,
                        preferred_element_type=jnp.float32)
    )                                              # [bj, bi]
    K = jnp.exp2(D / h2_ref[0] * (-1.4426950408889634 / 2.0))
    row = j * bj + jax.lax.broadcasted_iota(jnp.int32, K.shape, 0)
    K = jnp.where(row < n_valid, K, 0.0)

    phiT_ref[:] += jnp.dot(uT_j_ref[:], K,
                           preferred_element_type=jnp.float32)
    ksum_ref[:] += jnp.sum(K, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pallas_svgd_phiT(theta, grads, h2, block=1024, interpret=False):
    """phi via the transposed-accumulation tile — same math as
    pallas_svgd_phi up to accumulation order."""
    n, p = theta.shape
    f32 = jnp.float32
    b = min(block, max(8, n))
    n_pad = -(-n // b) * b
    center = jnp.mean(theta.astype(f32), axis=0, keepdims=True)
    th = jnp.pad(theta.astype(f32) - center, ((0, n_pad - n), (0, 0)))
    g = jnp.pad(grads.astype(f32), ((0, n_pad - n), (0, 0)))
    h2f = jnp.asarray(h2, f32)
    uT = (g - th / h2f).T                           # [p, n_pad]
    rsq = jnp.sum(th * th, axis=1, keepdims=True)

    grid = (n_pad // b, n_pad // b)
    phiT, ksum = pl.pallas_call(
        _phiT_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 1), lambda i, j: (i, 0)),   # rsq_i
            pl.BlockSpec((b, p), lambda i, j: (i, 0)),   # theta_i
            pl.BlockSpec((b, 1), lambda i, j: (j, 0)),   # rsq_j
            pl.BlockSpec((b, p), lambda i, j: (j, 0)),   # theta_j
            pl.BlockSpec((p, b), lambda i, j: (0, j)),   # uT_j
        ],
        out_specs=[
            pl.BlockSpec((p, b), lambda i, j: (0, i)),   # phiT
            pl.BlockSpec((1, b), lambda i, j: (0, i)),   # ksum
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, n_pad), f32),
            jax.ShapeDtypeStruct((1, n_pad), f32),
        ],
        interpret=interpret,
    )(jnp.asarray(h2, f32).reshape(1),
      jnp.asarray(n, jnp.int32).reshape(1), rsq, th, rsq, th, uT)

    phi = (phiT.T[:n] + ksum.T[:n] * (theta.astype(f32) - center) / h2f) / n
    return phi.astype(theta.dtype)


def _jchunk_tile_kernel(h2_ref, n_ref, rsq_i_ref, theta_i_ref, rsq_j_ref,
                        theta_j_ref, u_j_ref, ku_ref, ksum_ref, *,
                        chunks):
    """Shipped-form tile but with ``chunks`` column sub-tiles computed
    inside one grid step (the j block is ``chunks`` x wider): halves/
    quarters the grid-step count without growing the [bi, bj/chunks]
    D/K temporaries."""
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bj_full = theta_j_ref.shape[0]
    bc = bj_full // chunks

    @pl.when(j == 0)
    def _():
        ku_ref[:] = jnp.zeros_like(ku_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    theta_i = theta_i_ref[:]
    ku = jnp.zeros_like(ku_ref)
    ksum = jnp.zeros_like(ksum_ref)
    for c in range(chunks):
        sl = pl.ds(c * bc, bc)
        theta_j = theta_j_ref[sl, :]
        D = (
            rsq_i_ref[:]
            + rsq_j_ref[sl, :].reshape(1, bc)
            - 2.0 * jnp.dot(theta_i, theta_j.T,
                            preferred_element_type=jnp.float32)
        )
        K = jnp.exp2(D / h2_ref[0] * (-1.4426950408889634 / 2.0))
        col = (j * bj_full + c * bc
               + jax.lax.broadcasted_iota(jnp.int32, K.shape, 1))
        K = jnp.where(col < n_valid, K, 0.0)
        ku = ku + jnp.dot(K, u_j_ref[sl, :],
                          preferred_element_type=jnp.float32)
        ksum = ksum + jnp.sum(K, axis=1, keepdims=True)
    ku_ref[:] += ku
    ksum_ref[:] += ksum


@functools.partial(jax.jit, static_argnames=("block_i", "block_j",
                                             "chunks"))
def pallas_svgd_phi_jchunk(theta, grads, h2, block_i=1024, block_j=2048,
                           chunks=2):
    n, p = theta.shape
    f32 = jnp.float32
    bi = min(block_i, max(8, n))
    bj = min(block_j, max(8, n))
    n_pad_i = -(-n // bi) * bi
    n_pad_j = -(-n // bj) * bj
    n_pad = max(n_pad_i, n_pad_j)
    center = jnp.mean(theta.astype(f32), axis=0, keepdims=True)
    th = jnp.pad(theta.astype(f32) - center, ((0, n_pad - n), (0, 0)))
    g = jnp.pad(grads.astype(f32), ((0, n_pad - n), (0, 0)))
    h2f = jnp.asarray(h2, f32)
    u = g - th / h2f
    rsq = jnp.sum(th * th, axis=1, keepdims=True)

    grid = (n_pad // bi, n_pad // bj)
    ku, ksum = pl.pallas_call(
        functools.partial(_jchunk_tile_kernel, chunks=chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bi, p), lambda i, j: (i, 0)),
            pl.BlockSpec((bj, 1), lambda i, j: (j, 0)),
            pl.BlockSpec((bj, p), lambda i, j: (j, 0)),
            pl.BlockSpec((bj, p), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bi, p), lambda i, j: (i, 0)),
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, p), f32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
        ],
    )(jnp.asarray(h2, f32).reshape(1),
      jnp.asarray(n, jnp.int32).reshape(1), rsq, th, rsq, th, u)

    phi = (ku[:n] + ksum[:n] * (theta.astype(f32) - center) / h2f) / n
    return phi.astype(theta.dtype)


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


def rate_case(name, m, k, n, r, g, scale_side, reps=2):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(max(r, 1),)), jnp.float32)
    try:
        def run(x):
            def body(c, _):
                out = loop_rate_probe(s, a, b, g=g, r=r,
                                      scale_side=scale_side)
                return c + 1e-12 * out[0, 0], None
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return c
        run_j = jax.jit(run)
        dts = sorted(
            slope_time(run_j, jnp.float32(0.0), reps) for _ in range(3)
        )
        flops = 2.0 * m * k * n * g * r
        emit(bench="loop_rate", variant=name, m=m, k=k, n=n, r=r, g=g,
             ms_med=round(dts[1] * 1e3, 3),
             tf_s=round(flops / dts[1] / 1e12, 1),
             us_per_dot=round(dts[1] / (g * r) * 1e6, 3),
             ms_all=[round(d * 1e3, 3) for d in dts])
    except Exception as e:  # noqa: BLE001
        emit(bench="loop_rate", variant=name, error=str(e)[:300])


def main():
    emit(device=str(jax.devices()[0]))

    # ---- Probe A: in-kernel dot rate by shape, R dots per grid step.
    # Budget per case ~0.4-1 s numerators (g*r tuned per FLOP count).
    cases = [
        # name,                  m,    k,    n,   r,  g, scale
        ("contract_1024x128",  1024, 1024,  128, 16, 64, "rhs"),
        ("contract_512x128",    512,  512,  128, 32, 128, "rhs"),
        ("transposed_128xB",    128, 1024, 1024, 16, 64, "lhs"),
        ("gram_k128",          1024,  128, 1024, 16, 64, "lhs"),
        ("wide_n256",          1024, 1024,  256, 16, 48, "rhs"),
        ("wide_n512",          1024, 1024,  512, 12, 32, "rhs"),
        ("square_1024",        1024, 1024, 1024,  8, 24, "rhs"),
    ]
    for name, m, k, n, r, g, side in cases:
        rate_case(name, m, k, n, r, g, side)

    # ---- Probe B: grid-step overhead — same total dots, 1/dot/step vs
    # 16 dots/step at the production contraction shape.
    rate_case("gridstep_1dot", 1024, 1024, 128, 1, 1024, "rhs")
    rate_case("gridstep_16dot", 1024, 1024, 128, 16, 64, "rhs")

    # ---- Probe C: full n=10240 tile variants.
    rng = np.random.default_rng(1)
    theta0 = jnp.asarray(rng.normal(size=(N, P)) * 0.1, jnp.float32)
    grads0 = jnp.asarray(rng.normal(size=(N, P)), jnp.float32)
    h2 = jnp.float32(1.0)
    from stein_tpu.ops.pallas_svgd import pallas_svgd_phi
    ref = np.asarray(pallas_svgd_phi(theta0, grads0, h2, block_i=1024,
                                     block_j=1024))
    K = 500

    tile_cases = [
        ("tile_shipped_blk1024",
         lambda t: pallas_svgd_phi(t, grads0, h2, block_i=1024,
                                   block_j=1024)),
        ("tile_phiT_blk1024",
         lambda t: pallas_svgd_phiT(t, grads0, h2, block=1024)),
        ("tile_phiT_blk512",
         lambda t: pallas_svgd_phiT(t, grads0, h2, block=512)),
        ("tile_jchunk_2x1024",
         lambda t: pallas_svgd_phi_jchunk(t, grads0, h2, block_i=1024,
                                          block_j=2048, chunks=2)),
        ("tile_jchunk_4x512",
         lambda t: pallas_svgd_phi_jchunk(t, grads0, h2, block_i=512,
                                          block_j=2048, chunks=4)),
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
            flops = 2.0 * 2 * N * N * P  # Gram + contraction
            emit(bench="tile", variant=name,
                 ms_med=round(dts[1] * 1e3, 4),
                 tf_s=round(flops / dts[1] / 1e12, 1),
                 ms_all=[round(d * 1e3, 4) for d in dts],
                 rel_err_vs_shipped=float(err))
        except Exception as e:  # noqa: BLE001
            emit(bench="tile", variant=name, error=str(e)[:300])


if __name__ == "__main__":
    main()
