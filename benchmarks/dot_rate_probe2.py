"""Probe (part 2): complete the dot-rate-ceiling decomposition.

dot_rate_probe.py established that the Mosaic in-kernel dot runs at a
flat ~140-180 TF/s across shapes (1 dot/grid-step = 177 TF/s, so grid
sequencing is NOT the limiter) while XLA DEFAULT hits 930 TF/s on a
[10240,10240]x[10240,256] matmul. Two confounds remain:

A. Contraction DEPTH: the calibration matmul had k=10240; the in-kernel
   dots have k<=1024. If the MXU one-pass rate needs deep k to amortize
   pipeline fill, a k-sweep shows rate rising with k — and the tile
   could restructure (accumulate K column-chunks into one deep dot).

B. Toolchain vs size: run XLA itself at the TILE's dot shape
   ([1024,1024]x[1024,128], DEFAULT precision, scan-carried so nothing
   hoists). If XLA at this shape also reads ~180 TF/s, the ceiling is
   the SHAPE (pipeline fill), not Mosaic — and no Mosaic restructuring
   can beat it. If XLA reads >>180, Mosaic leaves rate on the table.

Run on the TPU machine:  python benchmarks/dot_rate_probe2.py
(--xla-only skips the deep-dot sweep, superseded by probe 3's clean
numerators.)

MEASURED (see RESULTS.md r5): the first run's xla_case consumed only
out[:, :1], which XLA slice-sinks into a single-column dot — the
apparent 608 TF/s was inflated 128x. With the full output consumed,
XLA DEFAULT at the tile's dot shape reads 132.7 TF/s — SLOWER than the
Mosaic in-kernel dot (177). The 930 TF/s one-pass rate exists only at
huge deep-k operands (the r2 calibration, which carry-consumes fully).
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


# ---- Probe A: in-kernel dot rate vs contraction depth k.
# One dot per grid step (the 177 TF/s regime), k swept; the lhs block
# is scaled by a per-step SMEM value derived from program_id so nothing
# is loop-invariant across grid steps.

def _deep_kernel(s_ref, a_ref, b_ref, o_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    sc = s_ref[g]
    o_ref[:] += jnp.dot(a_ref[:] * sc, b_ref[:],
                        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("g",))
def deep_dot(s, a, b, g=64):
    m, k = a.shape
    n = b.shape[1]
    return pl.pallas_call(
        _deep_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, n), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(s, a, b)


def deep_case(name, m, k, n, g):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(g,)), jnp.float32)
    try:
        def run(x):
            def body(c, _):
                out = deep_dot(s, a, b, g=g)
                return c + 1e-12 * out[0, 0], None
            c, _ = jax.lax.scan(body, x, None, length=4)
            return c
        run_j = jax.jit(run)
        dts = sorted(slope_time(run_j, jnp.float32(0.0), 4)
                     for _ in range(3))
        flops = 2.0 * m * k * n * g
        emit(bench="deep_dot", variant=name, m=m, k=k, n=n, g=g,
             ms_med=round(dts[1] * 1e3, 3),
             tf_s=round(flops / dts[1] / 1e12, 1),
             us_per_dot=round(dts[1] / g * 1e6, 3),
             ms_all=[round(d * 1e3, 3) for d in dts])
    except Exception as e:  # noqa: BLE001
        emit(bench="deep_dot", variant=name, error=str(e)[:200])


# ---- Probe B: XLA DEFAULT rate at small shapes, scan-carried.

def xla_case(name, m, k, n, length, precision):
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.normal(size=(m, k)) * 0.01, jnp.float32)
    b = jnp.asarray(rng.normal(size=(k, n)) * 0.01, jnp.float32)

    @jax.jit
    def run(a):
        def body(c, _):
            # Carry feeds the next dot's lhs so nothing hoists, and the
            # FULL [m, n] output is consumed (added into the carry's
            # first n columns) — consuming only out[:, :1] would let
            # XLA's slice-sinking rewrite the dot to a single column
            # and inflate the rate 128x.
            out = jnp.matmul(c, b, precision=precision)
            w = min(n, k)
            upd = c[:, :w] + 1e-6 * out[:, :w]
            if n > w:  # consume the tail columns via a VPU row-sum
                upd = upd + 1e-6 * jnp.sum(out[:, w:], axis=1,
                                           keepdims=True)
            c2 = jax.lax.dynamic_update_slice(c, upd, (0, 0))
            return c2, None
        c, _ = jax.lax.scan(body, a, None, length=length)
        return c

    dts = sorted(slope_time(run, a0, length) for _ in range(3))
    flops = 2.0 * m * k * n
    emit(bench="xla_dot", variant=name, m=m, k=k, n=n,
         precision=str(precision),
         us_per_dot=round(dts[1] * 1e6, 3),
         tf_s=round(flops / dts[1] / 1e12, 1),
         ms_all=[round(d * 1e3, 4) for d in dts])


def main():
    emit(device=str(jax.devices()[0]))
    xla_only = "--xla-only" in sys.argv

    # A: depth sweep at the production output width (n=128) and m=1024,
    # plus n=256 at depth. VMEM: [1024,8192] f32 = 32 MB -> too big;
    # cap k at 4096 for m=512 (10 MB + out) and 2048 for m=1024.
    # (Superseded by dot_rate_probe3.py's clean-numerator k-sweep.)
    for name, m, k, n, g in [] if xla_only else [
        ("k512_m1024n128", 1024, 512, 128, 128),
        ("k1024_m1024n128", 1024, 1024, 128, 64),
        ("k2048_m1024n128", 1024, 2048, 128, 32),
        ("k2048_m512n128", 512, 2048, 128, 64),
        ("k4096_m512n128", 512, 4096, 128, 32),
        ("k4096_m256n256", 256, 4096, 256, 32),
        ("k8192_m256n128", 256, 8192, 128, 16),
    ]:
        deep_case(name, m, k, n, g)

    # B: XLA at the tile's dot shapes, DEFAULT (the 930 TF/s tier) and
    # HIGH, scan length sized for >=0.3 s numerators at the expected
    # rates.
    P = jax.lax.Precision
    xla_case("xla_default_1024x1024x128", 1024, 1024, 128, 4000, P.DEFAULT)
    xla_case("xla_high_1024x1024x128", 1024, 1024, 128, 2000, P.HIGH)
    xla_case("xla_default_1024x128x1024", 1024, 128, 1024, 4000, P.DEFAULT)
    xla_case("xla_default_2048x2048x128", 2048, 2048, 128, 2000, P.DEFAULT)
    xla_case("xla_default_10240x10240x128", 10240, 10240, 128, 24,
             P.DEFAULT)
    xla_case("xla_default_10240x10240x256", 10240, 10240, 256, 16,
             P.DEFAULT)


if __name__ == "__main__":
    main()
