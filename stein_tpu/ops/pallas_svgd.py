"""Blocked Pallas TPU kernel for the fused SVGD direction.

The hot op of SVGD at large n is the n x n RBF kernel applied to the
gradient and particle matrices (SURVEY.md §5: "blockwise tiling of the
pairwise-distance + kernel matrix"). The XLA path (ops/rbf.py) materialises
K (and D) in HBM: ~3 full n^2 arrays of traffic per step (write D, write K,
read K). At n=10k/fp32 that is >1 GB of HBM traffic per step for ~100 MFLOP
of matmul — bandwidth-bound by 10x.

This kernel streams [BI x BJ] tiles flash-attention-style: each tile
computes the squared distances D = r_i + r_j - 2*theta_i@theta_j^T on the
MXU, exponentiates in VMEM, and immediately contracts K_tile against the
regrouped operand u = grads - theta/h^2 (one [BI,BJ]x[BJ,p] MXU pass —
see _svgd_tile_kernel; r3 halved the historic [BJ,2p] contraction) while
accumulating the kernel row-sums — K never touches HBM. HBM traffic drops
to O(n*p) per tile-row instead of O(n^2).

The bandwidth h^2 is computed beforehand (subsampled or histogram median,
ops/median.py) since the kernel needs it inside the tile.

Semantics match ops/rbf.svgd_phi (same reference citations) to matmul
reduction order plus the tile's exp2 evaluation of the exponential
(~2.7e-7 max rel diff vs jnp.exp — see the note in _svgd_tile_kernel):
  phi_i = ( sum_j K_ij g_j + (sum_j K_ij theta_i - sum_j K_ij theta_j)/h^2 ) / n
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _svgd_tile_kernel(h2_ref, n_ref, rsq_i_ref, theta_i_ref, rsq_j_ref,
                      theta_j_ref, u_j_ref, ku_ref, ksum_ref, *,
                      mxu_dtype):
    """One (i, j) tile: D -> K -> [K@u, row-sums], accumulated over j.

    ``u = grads - theta / h^2`` rides in as a SEPARATE input block from
    theta_j (a same-session A/B measured the split form ~6% faster than
    a concatenated [n, 2p] operand and bitwise-identical —
    benchmarks/tile_form_ab.py): since the
    bandwidth is known BEFORE the tile runs, the SVGD direction
    phi_i = (sum_j K_ij g_j + sum_j K_ij (theta_i - theta_j)/h^2)/n
    regroups to (sum_j K_ij u_j + ksum_i theta_i / h^2)/n — ONE
    [B,B]x[B,p] contraction instead of the historic [B,B]x[B,2p]
    K@[G|T], HALVING the tile's dominant MXU work (the contraction was
    ~50% of tile time — RESULTS.md attribution; measured r3: 0.456 ->
    0.316 ms at n=10240/p=128). Same tolerance class (different matmul
    grouping of the same sum).

    mxu_dtype is a measured NO-OP on the deployed toolchain (Mosaic
    truncates dot inputs to bf16-class regardless — RESULTS.md r3);
    kept for toolchains that honour operand dtypes."""
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bj = theta_j_ref.shape[0]

    @pl.when(j == 0)
    def _():
        ku_ref[:] = jnp.zeros_like(ku_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    theta_i = theta_i_ref[:]                      # [BI, p]
    # Distance tile: r_i + r_j^T - 2 theta_i theta_j^T
    # (reference abstract_kernel.py:33-35).
    theta_j = theta_j_ref[:]                      # [BJ, p]
    D = (
        rsq_i_ref[:]                              # [BI, 1]
        + rsq_j_ref[:].reshape(1, bj)             # [1, BJ]
        - 2.0 * jnp.dot(theta_i.astype(mxu_dtype),
                        theta_j.T.astype(mxu_dtype),
                        preferred_element_type=jnp.float32)
    )
    # exp via the VPU's native base-2 path: exp(-D/(2 h^2)) =
    # 2^(D * -log2(e)/2 / h^2). Mathematically identical (2.7e-7 max rel
    # diff vs jnp.exp at n=10240); measured 0.44 vs 0.48 ms mean at
    # n=10240/p=128 (~5%, within-run spreads up to 8% — never slower).
    # See benchmarks/pallas_variants.py.
    K = jnp.exp2(D / h2_ref[0] * (-1.4426950408889634 / 2.0))  # [BI, BJ]
    # Mask padded columns (rows j*BJ + c >= n are zero-padding, not
    # particles; their K contribution must vanish).
    col = j * bj + jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
    K = jnp.where(col < n_valid, K, 0.0)

    ku_ref[:] += jnp.dot(K.astype(mxu_dtype),
                         u_j_ref[:].astype(mxu_dtype),
                         preferred_element_type=jnp.float32)
    ksum_ref[:] += jnp.sum(K, axis=1, keepdims=True)


def _pad_rows(x, rows):
    if rows == 0:
        return x
    return jnp.pad(x, ((0, rows), (0, 0)))


@functools.partial(
    jax.jit,
    static_argnames=("block_i", "block_j", "interpret", "precision"),
)
def pallas_svgd_both_ksum(theta_rows, theta_cols, grads_cols, h2,
                          center, block_i=512, block_j=512,
                          interpret=False, precision="f32"):
    """Raw streaming-tile accumulators for an [m, p] row block against
    [n, p] column particles/gradients: ``ku = K @ (grads - theta_c/h^2)``
    ([m, p] — the regrouped single contraction, see _svgd_tile_kernel)
    and ``ksum`` ([m, 1]) — the pallas_call portion of
    ``pallas_svgd_phi_rect`` without the final phi combine
    (phi = (ku + ksum * (theta_rows - center) / h^2) / n_total), so
    callers that accumulate tiles across several column blocks (the
    ring sharded step, parallel/sharded.py comm='ring') can sum partial
    (ku, ksum) pairs before combining once (h^2 and center are fixed
    across blocks).

    ``center`` ([1, p]) is subtracted from theta before the in-kernel
    Gram: D is translation-invariant, but the bf16-class in-kernel dot's
    error scales with ||theta||^2 — uncentered, phi degraded to 33% rel
    error at ||mean||/spread ~ 280 and NaN at ~2800 (measured,
    benchmarks/centering_probe.py); centered at the particle mean the
    error is flat ~3.5e-4 at EVERY shift. phi itself is exactly
    translation-invariant (the repulsive term only sees differences),
    so callers must use the SAME center in the combine; pass the global
    particle mean (identical on every shard)."""
    m, p = theta_rows.shape
    n = theta_cols.shape[0]
    f32 = jnp.float32
    bi = min(block_i, max(8, m))
    bj = min(block_j, max(8, n))
    m_pad = -(-m // bi) * bi
    n_pad = -(-n // bj) * bj

    h2f = jnp.asarray(h2, f32)
    c = jnp.asarray(center, f32).reshape(1, p)
    rows_p = _pad_rows(theta_rows.astype(f32) - c, m_pad - m)
    cols_p = _pad_rows(theta_cols.astype(f32) - c, n_pad - n)
    grads_p = _pad_rows(grads_cols.astype(f32), n_pad - n)
    u = grads_p - cols_p / h2f
    rsq_i = jnp.sum(rows_p * rows_p, axis=1, keepdims=True)  # [m_pad, 1]
    rsq_j = jnp.sum(cols_p * cols_p, axis=1, keepdims=True)  # [n_pad, 1]

    grid = (m_pad // bi, n_pad // bj)
    h2_arr = h2f.reshape(1)
    n_arr = jnp.asarray(n, jnp.int32).reshape(1)

    mxu_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    ku, ksum = pl.pallas_call(
        functools.partial(_svgd_tile_kernel, mxu_dtype=mxu_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # h2
            pl.BlockSpec(memory_space=pltpu.SMEM),             # n
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),        # rsq_i
            pl.BlockSpec((bi, p), lambda i, j: (i, 0)),        # theta_i
            pl.BlockSpec((bj, 1), lambda i, j: (j, 0)),        # rsq_j
            pl.BlockSpec((bj, p), lambda i, j: (j, 0)),        # theta_j
            pl.BlockSpec((bj, p), lambda i, j: (j, 0)),        # u_j
        ],
        out_specs=[
            pl.BlockSpec((bi, p), lambda i, j: (i, 0)),        # ku
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),        # ksum
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, p), f32),
            jax.ShapeDtypeStruct((m_pad, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * 2 * p,
            bytes_accessed=4 * (m_pad * p + n_pad * p * 2
                                + m_pad * n_pad // 64),
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(h2_arr, n_arr, rsq_i, rows_p, rsq_j, cols_p, u)

    return ku[:m], ksum[:m]


@functools.partial(
    jax.jit,
    static_argnames=("n_total", "block_i", "block_j", "interpret",
                     "precision"),
)
def pallas_svgd_phi_rect(theta_rows, theta_cols, grads_cols, h2,
                         n_total=None, block_i=512, block_j=512,
                         interpret=False, precision="f32"):
    """Rectangular fused SVGD tile: phi for an [m, p] row block of
    particles against [n, p] column particles/gradients.

    The m == n case is the single-chip path (``pallas_svgd_phi``); the
    m < n case is one shard of the particle-sharded step
    (parallel/sharded.py with kernel_impl='pallas'), where each device
    streams its local rows against the all-gathered global columns —
    the [m, n] distance/kernel tiles never touch HBM, exactly as on a
    single chip. ``n_total`` is the global particle count dividing phi
    (reference abstract_stein_sampler.py:105); it defaults to n.
    """
    n = theta_cols.shape[0]
    if n_total is None:
        n_total = n
    dtype = theta_rows.dtype
    f32 = jnp.float32
    # Mean-center before the in-kernel Gram (off-origin robustness —
    # see pallas_svgd_both_ksum); computed from the columns so every
    # shard of the all-gather sharded step derives the identical value.
    center = jnp.mean(theta_cols.astype(f32), axis=0, keepdims=True)
    ku, ksum = pallas_svgd_both_ksum(
        theta_rows, theta_cols, grads_cols, h2, center, block_i=block_i,
        block_j=block_j, interpret=interpret, precision=precision,
    )
    h2f = jnp.asarray(h2, f32)
    phi = (ku + ksum * (theta_rows.astype(f32) - center) / h2f) / n_total
    return phi.astype(dtype)


def _svgd_on_d_tile_kernel(h2_ref, n_ref, d_ref, u_j_ref, ku_ref,
                           ksum_ref):
    """One (i, j) tile of the on-D variant: the [bi, bj] distance block
    comes in as an INPUT (the 2-D mesh materialises D_rows anyway — its
    model-axis psum requires it); the kernel fuses exp2 + masking + the
    contraction + row-sums so K never touches HBM."""
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bj = u_j_ref.shape[0]

    @pl.when(j == 0)
    def _():
        ku_ref[:] = jnp.zeros_like(ku_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    K = jnp.exp2(d_ref[:] * (-1.4426950408889634 / 2.0) / h2_ref[0])
    col = j * bj + jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
    K = jnp.where(col < n_valid, K, 0.0)
    ku_ref[:] += jnp.dot(K, u_j_ref[:],
                           preferred_element_type=jnp.float32)
    ksum_ref[:] += jnp.sum(K, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("block_i", "block_j", "interpret"),
)
def pallas_svgd_both_ksum_on_D(D_rows, u_cols, h2, block_i=512,
                               block_j=512, interpret=False):
    """Streaming (ku, ksum) accumulators from an already-materialised
    [m, n] distance-row block — the 2-D (particles x model) mesh path,
    where D_rows exists by construction (psum'd partial Grams,
    parallel/sharded2d._d_rows_2d) and the win is keeping the [m, n] K
    out of HBM. ``u_cols`` is the p-sharded [n, p_loc] regrouped
    operand u = grads - theta/h^2 (see _svgd_tile_kernel: phi =
    (K@u + ksum*theta/h^2)/n — one contraction instead of two).
    f32 compute (inputs cast in, outputs f32)."""
    m, n = D_rows.shape
    p_loc = u_cols.shape[1]
    f32 = jnp.float32
    bi = min(block_i, max(8, m))
    bj = min(block_j, max(8, n))
    m_pad = -(-m // bi) * bi
    n_pad = -(-n // bj) * bj

    D_p = jnp.pad(D_rows.astype(f32),
                  ((0, m_pad - m), (0, n_pad - n)))
    u_p = _pad_rows(u_cols.astype(f32), n_pad - n)

    grid = (m_pad // bi, n_pad // bj)
    both, ksum = pl.pallas_call(
        _svgd_on_d_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # h2
            pl.BlockSpec(memory_space=pltpu.SMEM),             # n
            pl.BlockSpec((bi, bj), lambda i, j: (i, j)),       # D tile
            pl.BlockSpec((bj, p_loc), lambda i, j: (j, 0)),    # u_j
        ],
        out_specs=[
            pl.BlockSpec((bi, p_loc), lambda i, j: (i, 0)),
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, p_loc), f32),
            jax.ShapeDtypeStruct((m_pad, 1), f32),
        ],
        interpret=interpret,
    )(jnp.asarray(h2, f32).reshape(1),
      jnp.asarray(n, jnp.int32).reshape(1), D_p, u_p)
    return both[:m], ksum[:m]


def _svgd_sym_tile_kernel(h2_ref, n_ref, rsq_i_ref, theta_i_ref, rsq_j_ref,
                          gt_j_ref, gt_i_ref, row_both_ref, row_ksum_ref,
                          col_both_ref, col_ksum_ref):
    """Symmetric-traversal tile: only j >= i tiles compute; each strictly-
    upper tile contributes K @ gt_j to its ROW block (per-i output) and
    K^T @ gt_i to its COLUMN rows inside a whole-array VMEM-resident
    accumulator (constant-index output block) — exploiting D's symmetry
    (abstract_kernel.py:33-35: D = r + r^T - 2TT^T, so K_ji = K_ij^T)
    to skip the j < i distance/exp/mask work entirely. The contraction
    FLOPs are NOT redundant (each pair (i, j) feeds one MAC of K@[G|T]
    either way); the win is the ~half of tile time that is NOT the big
    contraction (measured: benchmarks/bf16_operand_probe.py upper-skip
    diagnostic, RESULTS.md round 3)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bi = theta_i_ref.shape[0]
    bj = gt_j_ref.shape[0]
    p = theta_i_ref.shape[1]

    @pl.when(j == 0)
    def _():
        row_both_ref[:] = jnp.zeros_like(row_both_ref)
        row_ksum_ref[:] = jnp.zeros_like(row_ksum_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        col_both_ref[:] = jnp.zeros_like(col_both_ref)
        col_ksum_ref[:] = jnp.zeros_like(col_ksum_ref)

    @pl.when(j >= i)
    def _():
        theta_i = theta_i_ref[:]
        theta_j = gt_j_ref[:, p:]
        D = (
            rsq_i_ref[:]
            + rsq_j_ref[:].reshape(1, bj)
            - 2.0 * jnp.dot(theta_i, theta_j.T,
                            preferred_element_type=jnp.float32)
        )
        K = jnp.exp2(D / h2_ref[0] * (-1.4426950408889634 / 2.0))
        # Mask padded columns AND padded rows: the transpose-side column
        # sums would otherwise absorb K values from zero-padded rows
        # (their gt is zero, so the matmuls are safe — the sums are not).
        col = j * bj + jax.lax.broadcasted_iota(jnp.int32, K.shape, 1)
        row = i * bi + jax.lax.broadcasted_iota(jnp.int32, K.shape, 0)
        K = jnp.where((col < n_valid) & (row < n_valid), K, 0.0)

        row_both_ref[:] += jnp.dot(K, gt_j_ref[:],
                                   preferred_element_type=jnp.float32)
        row_ksum_ref[:] += jnp.sum(K, axis=1, keepdims=True)

        @pl.when(j > i)
        def _():
            kt_gt = jax.lax.dot_general(
                K, gt_i_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                           # K^T @ gt_i [bj, 2p]
            csum = jnp.sum(K, axis=0)[:, None]          # [bj, 1]
            sl = pl.ds(j * bj, bj)
            col_both_ref[sl, :] += kt_gt
            col_ksum_ref[sl, :] += csum


@functools.partial(
    jax.jit, static_argnames=("block", "interpret"),
)
def pallas_svgd_phi_sym(theta, grads, h2, block=512, interpret=False):
    """Symmetric-traversal fused SVGD direction for [n, p] particles:
    computes only the j >= i tiles of the streaming kernel, accumulating
    each strictly-upper tile into both its row block and (via a VMEM-
    resident whole-array accumulator) its column block. Semantically
    identical to ``pallas_svgd_phi`` up to accumulation order (same exp2
    kernel evaluation, same masking — the kernel_impl='pallas' tolerance
    class; equivalence tested in tests/test_pallas.py).

    **MEASURED NEGATIVE — kept as the documented artifact, not used by
    any production path** (benchmarks/sym_and_gram_bench.py, RESULTS.md
    round 3): at n=10240/p=128 the best symmetric variant (block=1024,
    0.460 ms) only TIES the full-grid kernel (0.456 ms); block 512/768
    are ~14% slower. The contraction FLOPs are conserved under symmetry
    (only D/exp/mask halve), and the transpose-side lhs-contracted
    dot_general plus the whole-array accumulator update eat exactly that
    saving."""
    n, p = theta.shape
    f32 = jnp.float32
    dtype = theta.dtype
    b = min(block, max(8, n))
    n_pad = -(-n // b) * b

    theta_p = _pad_rows(theta.astype(f32), n_pad - n)
    grads_p = _pad_rows(grads.astype(f32), n_pad - n)
    gt = jnp.concatenate([grads_p, theta_p], axis=1)        # [n_pad, 2p]
    rsq = jnp.sum(theta_p * theta_p, axis=1, keepdims=True)

    grid = (n_pad // b, n_pad // b)
    h2_arr = jnp.asarray(h2, f32).reshape(1)
    n_arr = jnp.asarray(n, jnp.int32).reshape(1)

    row_both, row_ksum, col_both, col_ksum = pl.pallas_call(
        _svgd_sym_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # h2
            pl.BlockSpec(memory_space=pltpu.SMEM),             # n
            pl.BlockSpec((b, 1), lambda i, j: (i, 0)),         # rsq_i
            pl.BlockSpec((b, p), lambda i, j: (i, 0)),         # theta_i
            pl.BlockSpec((b, 1), lambda i, j: (j, 0)),         # rsq_j
            pl.BlockSpec((b, 2 * p), lambda i, j: (j, 0)),     # gt_j
            pl.BlockSpec((b, 2 * p), lambda i, j: (i, 0)),     # gt_i
        ],
        out_specs=[
            pl.BlockSpec((b, 2 * p), lambda i, j: (i, 0)),     # row_both
            pl.BlockSpec((b, 1), lambda i, j: (i, 0)),         # row_ksum
            pl.BlockSpec((n_pad, 2 * p), lambda i, j: (0, 0)),  # col_both
            pl.BlockSpec((n_pad, 1), lambda i, j: (0, 0)),     # col_ksum
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 2 * p), f32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
            jax.ShapeDtypeStruct((n_pad, 2 * p), f32),
            jax.ShapeDtypeStruct((n_pad, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * 3 * p,
            bytes_accessed=4 * (3 * n_pad * p * 2 + n_pad * n_pad // 64),
            transcendentals=n_pad * n_pad // 2,
        ),
        interpret=interpret,
    )(h2_arr, n_arr, rsq, theta_p, rsq, gt, gt)

    both = (row_both + col_both)[:n]
    ksum = (row_ksum + col_ksum)[:n]
    attract = both[:, :p]
    ktheta = both[:, p:]
    h2f = jnp.asarray(h2, f32)
    phi = (
        attract + (ksum * theta.astype(f32) - ktheta) / h2f
    ) / n
    return phi.astype(dtype)


def pallas_svgd_phi(theta, grads, h2, block_i=512, block_j=512,
                    interpret=False, precision="f32"):
    """Fused SVGD direction phi for [n, p] particles/gradients.

    Matches ops/rbf.svgd_phi's output up to matmul reduction order and
    the tile's exp2 exponential (~2.7e-7 rel, see _svgd_tile_kernel).
    precision='bf16' requests bfloat16 matmul inputs but is a measured
    NO-OP on the deployed toolchain (Mosaic folds the casts — bitwise
    equal to 'f32'); see _svgd_tile_kernel. n and p are unconstrained
    (rows are zero-padded to the block size and masked inside the
    kernel; Mosaic handles non-128 p).
    """
    n = theta.shape[0]
    # Reproduce the historic square-path block choice exactly: both block
    # dims clamp to [8, n] and then snap to their common maximum.
    b = max(min(block_i, max(8, n)), min(block_j, max(8, n)))
    return pallas_svgd_phi_rect(
        theta, theta, grads, h2, block_i=b, block_j=b,
        interpret=interpret, precision=precision,
    )
