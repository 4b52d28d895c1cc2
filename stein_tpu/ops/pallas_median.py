"""Single-kernel Pallas warm-median search.

The warm bisect median (ops/median._warm_search) is 1 bracket pass +
ceil(warm_passes/2) quad-ary rounds; in XLA each pass is a separate
sequential kernel that re-reads the [m, n] distance block from HBM and
pays a dispatch. At n=1000 those 4-5 sequential kernels measure ~23 us of
a ~55 us step (benchmarks/step_breakdown.py) — pure latency, since each
count is a few-microsecond VPU reduction.

This kernel runs the ENTIRE search — range + bracket counts + all quad-ary
rounds — inside one Pallas invocation with the distance block resident in
VMEM: one dispatch, one HBM read of the block, sequential rounds as an
in-kernel fori_loop with scalar carries.

Bitwise equality with the XLA search: every count is an integer (sum of a
predicate — reduction-order independent), min/max are order-independent,
and the interval arithmetic is the same scalar f32 expression tree, so the
result is exactly `_warm_search(D_sub, med_prev, ...)` for the same block
(tests/test_pallas_median.py asserts exact equality).

Semantics target: reference stein/utilities/compute_median.py:4-16 via the
warm-bracket search's documented error bound (see ops/median.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_block_ok(m, n):
    """Whether the fused single-kernel search applies to an [m, n] block:
    in the quad-ary regime (> 100k entries — below that the XLA search
    uses the dual-rank binary path with different results), int32-safe
    counts, and small enough to sit in VMEM next to the kernel's few
    scalar/reduction temporaries (~12 MiB of a 16 MiB/core budget).
    Callers fall back to the XLA search otherwise — bitwise the same
    result, so the fallback is safe, not a silent semantics change."""
    total = m * n
    return 100_000 < total < 2 ** 31 and 4 * total <= 12 * 2 ** 20


def warm_search_on_value(D, med_prev, *, k, rounds, bracket, bracket_wide):
    """The warm-bracket search as in-kernel value code: D is a loaded
    (VMEM-resident) block, med_prev a scalar. Shared by the standalone
    fused-median kernel below and the fully-fused small-n step kernel
    (ops/pallas_step.py). Bitwise-equal to ops/median._warm_search on the
    same block (integer counts, order-independent min/max, identical
    scalar interval arithmetic)."""
    k_c = jnp.int32(k)

    def count_le(t):
        return jnp.sum((D <= t).astype(jnp.int32))

    # Bracket pass: global range + the four candidate endpoint counts
    # (ops/median._warm_search pass 1 — here all six reductions happen on
    # the VMEM-resident block with no extra dispatches).
    a1 = bracket[0] * med_prev
    b1 = bracket[1] * med_prev
    a2 = bracket_wide[0] * med_prev
    b2 = bracket_wide[1] * med_prev
    lo_full = jnp.minimum(jnp.min(D), 0.0)
    hi_full = jnp.max(D)
    c_a1 = count_le(a1)
    c_b1 = count_le(b1)
    c_a2 = count_le(a2)
    c_b2 = count_le(b2)

    have_hint = med_prev > 0
    valid1 = have_hint & (c_a1 < k_c) & (c_b1 >= k_c)
    valid2 = have_hint & (c_a2 < k_c) & (c_b2 >= k_c)
    lo0 = jnp.where(valid1, a1, jnp.where(valid2, a2, lo_full))
    hi0 = jnp.where(valid1, b1, jnp.where(valid2, b2, hi_full))

    def body(_, carry):
        lo, hi = carry
        w = 0.25 * (hi - lo)
        c1 = count_le(lo + w)
        c2 = count_le(lo + 2.0 * w)
        c3 = count_le(lo + 3.0 * w)
        b = ((c1 < k_c).astype(lo.dtype) + (c2 < k_c).astype(lo.dtype)
             + (c3 < k_c).astype(lo.dtype))
        lo_new = lo + b * w
        return lo_new, lo_new + w

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo0, hi0))
    return 0.5 * (lo + hi)


def _warm_kernel(med_ref, D_ref, out_ref, *, k, rounds, bracket,
                 bracket_wide):
    out_ref[0] = warm_search_on_value(
        D_ref[:], med_ref[0], k=k, rounds=rounds, bracket=bracket,
        bracket_wide=bracket_wide,
    )


@functools.partial(
    jax.jit,
    static_argnames=("warm_passes", "bracket", "bracket_wide", "interpret"),
)
def fused_warm_median_rows(D_sub, med_prev, warm_passes=8,
                           bracket=(0.92, 1.09), bracket_wide=(0.25, 4.0),
                           interpret=False):
    """Warm median of the (already row-subsampled) distance block in ONE
    Pallas kernel. Drop-in, bitwise-equal replacement for
    ``ops.median._warm_search(D_sub, med_prev, warm_passes, ...)`` on a
    single device.

    D_sub must fit VMEM (~16 MB/core): [512, n<=4096] or [128, n<=16384]
    f32 blocks do comfortably; callers pick max_rows accordingly (the
    existing row-subsample policy already does).

    f32 only: the TPU has no f64, and silently casting would break the
    bitwise-equality contract with the XLA search — non-f32 callers (the
    x64 golden-test regime) use median_impl="xla".
    """
    m, n = D_sub.shape
    total = m * n
    if total >= 2 ** 31:
        raise ValueError(
            f"fused warm median: {m}x{n} block exceeds int32 counts"
        )
    if D_sub.dtype != jnp.float32:
        raise TypeError(
            f"fused warm median is f32-only (got {D_sub.dtype}); use the "
            "XLA warm search for other dtypes"
        )
    k = (total + 1) // 2
    rounds = (warm_passes + 1) // 2
    f32 = jnp.float32
    med = jnp.asarray(med_prev).astype(f32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_warm_kernel, k=k, rounds=rounds,
                          bracket=bracket, bracket_wide=bracket_wide),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # med_prev
            pl.BlockSpec(memory_space=pltpu.VMEM),   # D_sub
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), f32),
        interpret=interpret,
    )(med, D_sub)
    return out[0]
