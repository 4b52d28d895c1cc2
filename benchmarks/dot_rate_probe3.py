"""Probe (part 3): the Mosaic dot rate vs contraction depth k, with
numerators that respect the >=0.3 s slope rule (probe 2's deep_dot rows
had ~0.3 ms numerators — below the tunnel's RTT variance; its spreads
[0.035..0.109] ms were noise). If the rate rises materially with k, the
streaming tile can restructure: stage bf16 K column-chunks in a VMEM
scratch (bitwise-free — Mosaic truncates dot inputs to bf16 anyway,
RESULTS.md r3) and issue ONE deep-k contraction per 4 chunks.

Run on the TPU machine:  python benchmarks/dot_rate_probe3.py
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


def _deep_kernel(s_ref, a_ref, b_ref, o_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    sc = s_ref[g]
    o_ref[:] += jnp.dot(a_ref[:] * sc, b_ref[:],
                        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("g",))
def deep_dot(s, a, b, g):
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


def slope_time(fn, state, k_inner, n_dispatch=6, reps=3):
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


def case(name, m, k, n, g, length):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(g,)), jnp.float32)
    try:
        def run(x):
            def body(c, _):
                out = deep_dot(s, a, b, g)
                return c + 1e-12 * out[0, 0], None
            c, _ = jax.lax.scan(body, x, None, length=length)
            return c
        run_j = jax.jit(run)
        dts = sorted(slope_time(run_j, jnp.float32(0.0), length * g)
                     for _ in range(3))
        flops = 2.0 * m * k * n
        numer_s = dts[1] * length * g * 5
        emit(bench="deep_dot3", variant=name, m=m, k=k, n=n, g=g,
             length=length,
             us_per_dot=round(dts[1] * 1e6, 3),
             tf_s=round(flops / dts[1] / 1e12, 1),
             numerator_s=round(numer_s, 2),
             us_all=[round(d * 1e6, 3) for d in dts])
    except Exception as e:  # noqa: BLE001
        emit(bench="deep_dot3", variant=name, error=str(e)[:200])


def main():
    emit(device=str(jax.devices()[0]))
    # m=512, n=128 family (the production contraction's output width);
    # g*length sized for >=0.3 s numerators at ~180 TF/s.
    case("m512_k512", 512, 512, 128, 512, 120)
    case("m512_k1024", 512, 1024, 128, 512, 80)
    case("m512_k2048", 512, 2048, 128, 512, 50)
    case("m512_k4096", 512, 4096, 128, 512, 30)
    case("m256_k8192", 256, 8192, 128, 512, 30)
    # anchors at the shipped tile's dot shapes
    case("m1024_k1024", 1024, 1024, 128, 512, 40)
    case("gram_m1024_k128", 1024, 128, 1024, 512, 40)
    case("gram_m512_k128_n1024", 512, 128, 1024, 512, 60)


if __name__ == "__main__":
    main()
