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

from .median import DEFAULT_BRACKETS, select_bracket


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


def warm_search_on_value(D, med_prev, *, k, rounds, brackets):
    """The warm-bracket search as in-kernel value code: D is a loaded
    (VMEM-resident) block, med_prev a scalar. Shared by the standalone
    fused-median kernel below and the fully-fused small-n step kernel
    (ops/pallas_step.py). Bitwise-equal to ops/median._warm_search on the
    same block (integer counts, order-independent min/max, identical
    scalar interval arithmetic)."""
    k_c = jnp.int32(k)

    def count_le(t):
        return jnp.sum((D <= t).astype(jnp.int32))

    # Bracket pass: global range + every candidate endpoint count
    # (ops/median._warm_search pass 1 — here all the reductions happen on
    # the VMEM-resident block with no extra dispatches).
    ends = [(lo * med_prev, hi * med_prev) for lo, hi in brackets]
    lo_full = jnp.minimum(jnp.min(D), 0.0)
    hi_full = jnp.max(D)
    cnts = [(count_le(a), count_le(b)) for a, b in ends]
    # THE shared select (ops/median.select_bracket) — one copy, so the
    # kernel cannot drift out of its bitwise contract with the XLA search.
    lo0, hi0 = select_bracket(med_prev, ends, cnts, k_c, lo_full, hi_full)

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


def _warm_kernel(med_ref, D_ref, out_ref, *, k, rounds, brackets):
    out_ref[0] = warm_search_on_value(
        D_ref[:], med_ref[0], k=k, rounds=rounds, brackets=brackets,
    )


def _bracket_gram_kernel(med_ref, center_ref, rows_ref, cols_ref,
                         d_ref, mm_ref, cnt_ref, *, brackets):
    """Local half of the SHARDED warm search's pass 1, fused with the
    median block's Gram: centered D_sub = r + r^T - 2 R C^T from the
    in-kernel dot (bf16-class inputs / f32 accumulation — the
    fused_gram numerics class, mean-centered for off-origin robustness
    like ops/pallas_step._tail_kernel), plus the block range and every
    candidate bracket endpoint's count, all in ONE kernel invocation.
    The collectives the sharded search needs (psum of counts, pmax of
    range) CANNOT live inside the kernel — the caller psums these
    outputs and runs the quad-ary rounds on the emitted D_sub
    (ops/median.sharded_warm_from_bracket)."""
    c = center_ref[:]
    rows = rows_ref[:] - c
    cols = cols_ref[:] - c
    rsq_r = jnp.sum(rows * rows, axis=1, keepdims=True)
    rsq_c = jnp.sum(cols * cols, axis=1, keepdims=True)
    D = (rsq_r + rsq_c.reshape(1, cols.shape[0])
         - 2.0 * jnp.dot(rows, cols.T,
                         preferred_element_type=jnp.float32))
    d_ref[:] = D
    med_prev = med_ref[0]
    # Range as [-lo, hi] so the caller's cross-shard reduce is ONE pmax.
    mm_ref[0] = -jnp.minimum(jnp.min(D), 0.0)
    mm_ref[1] = jnp.max(D)
    for i, (lo_m, hi_m) in enumerate(brackets):
        cnt_ref[2 * i] = jnp.sum(
            (D <= lo_m * med_prev).astype(jnp.int32))
        cnt_ref[2 * i + 1] = jnp.sum(
            (D <= hi_m * med_prev).astype(jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("brackets", "interpret"),
)
def fused_bracket_pass(rows, cols, med_prev, center,
                       brackets=DEFAULT_BRACKETS, interpret=False):
    """One-kernel bracket pass for the sharded warm median: computes the
    shard's [m, n] centered distance block IN-KERNEL (no XLA Gram stage,
    no separate reduction kernels) and returns

      (D_sub [m, n] f32, mm [2] f32 = [-min(D,0), max(D)],
       cnts [2 * n_brackets] int32)

    for the caller to pmax/psum across the particle axis before
    ops/median.sharded_warm_from_bracket finishes the search on D_sub.
    f32 only; the block plus both operand matrices must fit VMEM —
    callers gate with ``bracket_pass_fits``."""
    m, p = rows.shape
    n = cols.shape[0]
    if rows.dtype != jnp.float32 or cols.dtype != jnp.float32:
        raise TypeError(
            f"fused bracket pass is f32-only (got rows={rows.dtype}, "
            f"cols={cols.dtype})"
        )
    if m * n >= 2 ** 31:
        raise ValueError(
            f"fused bracket pass: {m}x{n} block exceeds int32 counts"
        )
    f32 = jnp.float32
    med = jnp.asarray(med_prev).astype(f32).reshape(1)
    c = jnp.asarray(center, f32).reshape(1, p)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    D, mm, cnts = pl.pallas_call(
        functools.partial(_bracket_gram_kernel, brackets=brackets),
        in_specs=[smem, vmem, vmem, vmem],
        out_specs=[vmem, smem, smem],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), f32),
            jax.ShapeDtypeStruct((2,), f32),
            jax.ShapeDtypeStruct((2 * len(brackets),), jnp.int32),
        ],
        interpret=interpret,
    )(med, c, rows, cols)
    return D, mm, cnts


def bracket_pass_fits(m, n, p):
    """VMEM gate for fused_bracket_pass: the [m, n] block, the [m, p] and
    [n, p] operands, and reduction temporaries (~1.5x the block for the
    compare masks) within ~12 MiB of the 16 MiB/core budget."""
    return 4 * (int(m) * n + (m + n) * p) * 5 // 2 <= 12 * 2 ** 20


def grid_edges(med_prev, hi_bound, brackets, g1):
    """Threshold grids for the O(1)-collective warm search: for every
    candidate bracket (multiples of ``med_prev``) PLUS the always-valid
    full-range fallback [~0, hi_bound], the g1+1 uniform edge values.
    Returns a flat list of (n_brackets + 1) * (g1 + 1) scalars, bracket-
    major, tightest bracket first, fallback last. ONE copy shared by the
    in-kernel grid pass and the XLA reference (ops/median.py) so the two
    count bitwise the same thresholds. ``hi_bound`` must upper-bound
    every D entry (callers derive 4 * max centered row-norm^2 from the
    gathered particles — exact algebra |a-b|^2 <= 4 max |x|^2 — plus an
    fp headroom factor); the fallback's lo sits just below zero to admit
    fp-negative in-kernel distances (cf. binned_median's lo0)."""
    cands = [(lo * med_prev, hi * med_prev) for lo, hi in brackets]
    lo_f = jnp.asarray(-1e-6, jnp.float32) * (1.0 + hi_bound)
    cands.append((lo_f, hi_bound))
    edges = []
    for lo, hi in cands:
        w = (hi - lo) / g1
        edges.extend(lo + t * w for t in range(g1 + 1))
    return edges


def _bracket_grid_kernel(med_ref, hib_ref, center_ref, rows_ref, cols_ref,
                         d_ref, cnt_ref, *, brackets, g1):
    """fused_bracket_pass with the first refinement ROUND fused in: the
    centered in-kernel D block plus counts at a (g1+1)-point uniform grid
    over EVERY candidate bracket and the full-range fallback — so ONE
    psum of the emitted counts both selects the tightest verified bracket
    AND locates the median's g1-ary sub-bin (ops/median.
    sharded_warm_from_grid), replacing the bracket psum + pmax + one
    quad-ary round chain. No min/max emission: the fallback range comes
    from the caller's hi_bound (derivable shard-identically from the
    gathered particles), which removes the pmax collective entirely."""
    c = center_ref[:]
    rows = rows_ref[:] - c
    cols = cols_ref[:] - c
    rsq_r = jnp.sum(rows * rows, axis=1, keepdims=True)
    rsq_c = jnp.sum(cols * cols, axis=1, keepdims=True)
    D = (rsq_r + rsq_c.reshape(1, cols.shape[0])
         - 2.0 * jnp.dot(rows, cols.T,
                         preferred_element_type=jnp.float32))
    d_ref[:] = D
    edges = grid_edges(med_ref[0], hib_ref[0], brackets, g1)
    for i, t in enumerate(edges):
        cnt_ref[i] = jnp.sum((D <= t).astype(jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("brackets", "g1", "interpret"),
)
def fused_bracket_grid_pass(rows, cols, med_prev, center, hi_bound,
                            brackets=DEFAULT_BRACKETS, g1=16,
                            interpret=False):
    """One-kernel GRID bracket pass for the O(1)-collective sharded warm
    median: the shard's [m, n] centered distance block IN-KERNEL plus
    counts at every candidate bracket's (g1+1)-point grid and the
    full-range fallback grid. Returns

      (D_sub [m, n] f32, cnts [(n_brackets + 1) * (g1 + 1)] int32)

    for the caller to psum ONCE before ops/median.sharded_warm_from_grid
    finishes the search (one more batched count psum). Same VMEM gate
    (``bracket_pass_fits``) and f32-only contract as fused_bracket_pass;
    same numerics class (the in-kernel centered Gram feeds the counts)."""
    m, p = rows.shape
    n = cols.shape[0]
    if rows.dtype != jnp.float32 or cols.dtype != jnp.float32:
        raise TypeError(
            f"fused grid bracket pass is f32-only (got rows={rows.dtype}, "
            f"cols={cols.dtype})"
        )
    if m * n >= 2 ** 31:
        raise ValueError(
            f"fused grid bracket pass: {m}x{n} block exceeds int32 counts"
        )
    f32 = jnp.float32
    med = jnp.asarray(med_prev).astype(f32).reshape(1)
    hib = jnp.asarray(hi_bound).astype(f32).reshape(1)
    c = jnp.asarray(center, f32).reshape(1, p)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_cnt = (len(brackets) + 1) * (g1 + 1)
    D, cnts = pl.pallas_call(
        functools.partial(_bracket_grid_kernel, brackets=brackets, g1=g1),
        in_specs=[smem, smem, vmem, vmem, vmem],
        out_specs=[vmem, smem],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), f32),
            jax.ShapeDtypeStruct((n_cnt,), jnp.int32),
        ],
        interpret=interpret,
    )(med, hib, c, rows, cols)
    return D, cnts


def _dist_block_kernel(center_ref, rows_ref, cols_ref, out_ref):
    c = center_ref[:]
    rows = rows_ref[:] - c
    cols = cols_ref[:] - c
    rsq_r = jnp.sum(rows * rows, axis=1, keepdims=True)
    rsq_c = jnp.sum(cols * cols, axis=1, keepdims=True)
    out_ref[:] = (rsq_r + rsq_c.reshape(1, cols.shape[0])
                  - 2.0 * jnp.dot(rows, cols.T,
                                  preferred_element_type=jnp.float32))


@functools.partial(
    jax.jit, static_argnames=("block_j", "interpret"),
)
def pallas_dist_block(rows, cols, center, block_j=1024, interpret=False):
    """[m, n] centered squared-distance block via the in-kernel dot,
    gridded over column tiles — the LARGE-n half of
    median_impl='fused_gram', where the whole-block from-theta kernel
    exceeds its VMEM gate but the emitted block still fits the fused
    rows search (fused_block_ok). Replaces the XLA HIGHEST Gram that
    costs ~28 us of the n=10240 step (in-kernel dot: ~5x the rate;
    same fused_gram numerics class, same mean-centering guard).
    Padded columns are trimmed before return (they would otherwise
    enter the median counts)."""
    m, p = rows.shape
    n = cols.shape[0]
    f32 = jnp.float32
    bj = min(block_j, max(8, n))
    n_pad = -(-n // bj) * bj
    cols_p = jnp.pad(cols.astype(f32), ((0, n_pad - n), (0, 0))) \
        if n_pad != n else cols.astype(f32)
    out = pl.pallas_call(
        _dist_block_kernel,
        grid=(n_pad // bj,),
        in_specs=[
            pl.BlockSpec((1, p), lambda j: (0, 0)),      # center
            pl.BlockSpec((m, p), lambda j: (0, 0)),      # rows
            pl.BlockSpec((bj, p), lambda j: (j, 0)),     # cols tile
        ],
        out_specs=pl.BlockSpec((m, bj), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n_pad), f32),
        interpret=interpret,
    )(jnp.asarray(center, f32).reshape(1, p), rows.astype(f32), cols_p)
    return out[:, :n]


def _warm_from_theta_kernel(med_ref, center_ref, rows_ref, cols_ref,
                            out_ref, *, k, rounds, brackets):
    c = center_ref[:]
    rows = rows_ref[:] - c
    cols = cols_ref[:] - c
    rsq_r = jnp.sum(rows * rows, axis=1, keepdims=True)
    rsq_c = jnp.sum(cols * cols, axis=1, keepdims=True)
    D = (rsq_r + rsq_c.reshape(1, cols.shape[0])
         - 2.0 * jnp.dot(rows, cols.T,
                         preferred_element_type=jnp.float32))
    out_ref[0] = warm_search_on_value(
        D, med_ref[0], k=k, rounds=rounds, brackets=brackets,
    )


@functools.partial(
    jax.jit, static_argnames=("warm_passes", "brackets", "interpret"),
)
def fused_warm_median_from_theta(rows, cols, med_prev, center,
                                 warm_passes=8,
                                 brackets=DEFAULT_BRACKETS,
                                 interpret=False):
    """The ENTIRE single-device warm median — the [m, n] distance block's
    Gram AND the bracket+quad-ary search — in ONE Pallas kernel, with D
    never leaving VMEM (median_impl='fused_gram').

    Why: `fused_warm_median_rows` takes D_sub precomputed by an XLA
    Precision.HIGHEST Gram, which at large p dominates the whole step —
    at the Bayesian-NN shape (m=512, n=1000, p=303) that 6-pass Gram is
    ~50 us of an ~90 us step while the kernels it feeds total ~15 us.
    The in-kernel dot runs ~5x the HIGHEST rate (RESULTS.md r3) at
    bf16-class input precision, so the median moves to the fused_gram
    numerics class: NOT bitwise-equal to the XLA search (the counts see
    a ~2e-3-relative D), the same class as step_impl='fused_gram''s
    in-kernel median block — a heuristic-bandwidth tolerance pinned by
    the statistical posterior suites. Mean-CENTERED like every in-kernel
    Gram (off-origin robustness, benchmarks/centering_probe.py); pass
    the particle mean as ``center`` ([1, p]).

    f32 only; gate shapes with ``bracket_pass_fits(m, n, p)`` (the
    caller falls back to the HIGHEST-Gram path above it — strictly MORE
    accurate, never silently worse)."""
    m, p = rows.shape
    n = cols.shape[0]
    if rows.dtype != jnp.float32 or cols.dtype != jnp.float32:
        raise TypeError(
            f"fused_warm_median_from_theta is f32-only (got "
            f"rows={rows.dtype}, cols={cols.dtype})"
        )
    total = m * n
    if total >= 2 ** 31:
        raise ValueError(
            f"fused warm median: {m}x{n} block exceeds int32 counts"
        )
    f32 = jnp.float32
    med = jnp.asarray(med_prev).astype(f32).reshape(1)
    c = jnp.asarray(center, f32).reshape(1, p)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _warm_from_theta_kernel, k=(total + 1) // 2,
            rounds=(warm_passes + 1) // 2, brackets=brackets,
        ),
        in_specs=[smem, vmem, vmem, vmem],
        out_specs=smem,
        out_shape=jax.ShapeDtypeStruct((1,), f32),
        interpret=interpret,
    )(med, c, rows, cols)
    return out[0]


@functools.partial(
    jax.jit,
    static_argnames=("warm_passes", "brackets", "interpret"),
)
def fused_warm_median_rows(D_sub, med_prev, warm_passes=8,
                           brackets=DEFAULT_BRACKETS, interpret=False):
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
                          brackets=brackets),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # med_prev
            pl.BlockSpec(memory_space=pltpu.VMEM),   # D_sub
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), f32),
        interpret=interpret,
    )(med, D_sub)
    return out[0]
