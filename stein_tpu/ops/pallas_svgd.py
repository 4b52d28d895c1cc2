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
concatenated [grads | theta] block (one [BI,BJ]x[BJ,2p] MXU pass) while
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
                      gt_j_ref, both_ref, ksum_ref, *, mxu_dtype):
    """One (i, j) tile: D -> K -> [K@[G|T], row-sums], accumulated over j.

    mxu_dtype was meant to control matmul input precision (bfloat16 for
    ~3x MXU rate), but on the deployed toolchain Mosaic FOLDS the casts
    away: precision='bf16' measured BITWISE-identical output to 'f32'
    (2026-08-17), so the option is a no-op here; kept for toolchains
    that honour operand dtypes. The r1 "bf16 slower by 11%" reading was
    tunnel noise between identical programs."""
    j = pl.program_id(1)
    n_valid = n_ref[0]
    bj = gt_j_ref.shape[0]

    @pl.when(j == 0)
    def _():
        both_ref[:] = jnp.zeros_like(both_ref)
        ksum_ref[:] = jnp.zeros_like(ksum_ref)

    theta_i = theta_i_ref[:]                      # [BI, p]
    # Distance tile: r_i + r_j^T - 2 theta_i theta_j^T
    # (reference abstract_kernel.py:33-35). gt_j = [grads_j | theta_j].
    p = theta_i.shape[1]
    theta_j = gt_j_ref[:, p:]                     # [BJ, p]
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

    both_ref[:] += jnp.dot(K.astype(mxu_dtype),
                           gt_j_ref[:].astype(mxu_dtype),
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
                          block_i=512, block_j=512, interpret=False,
                          precision="f32"):
    """Raw streaming-tile accumulators for an [m, p] row block against
    [n, p] column particles/gradients: ``both = K @ [grads | theta_cols]``
    ([m, 2p]) and ``ksum`` ([m, 1]) — the pallas_call portion of
    ``pallas_svgd_phi_rect`` without the final phi combine, so callers
    that accumulate tiles across several column blocks (the ring sharded
    step, parallel/sharded.py comm='ring') can sum partial (both, ksum)
    pairs before combining once."""
    m, p = theta_rows.shape
    n = theta_cols.shape[0]
    f32 = jnp.float32
    bi = min(block_i, max(8, m))
    bj = min(block_j, max(8, n))
    m_pad = -(-m // bi) * bi
    n_pad = -(-n // bj) * bj

    rows_p = _pad_rows(theta_rows.astype(f32), m_pad - m)
    cols_p = _pad_rows(theta_cols.astype(f32), n_pad - n)
    grads_p = _pad_rows(grads_cols.astype(f32), n_pad - n)
    gt = jnp.concatenate([grads_p, cols_p], axis=1)        # [n_pad, 2p]
    rsq_i = jnp.sum(rows_p * rows_p, axis=1, keepdims=True)  # [m_pad, 1]
    rsq_j = jnp.sum(cols_p * cols_p, axis=1, keepdims=True)  # [n_pad, 1]

    grid = (m_pad // bi, n_pad // bj)
    h2_arr = jnp.asarray(h2, f32).reshape(1)
    n_arr = jnp.asarray(n, jnp.int32).reshape(1)

    mxu_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    both, ksum = pl.pallas_call(
        functools.partial(_svgd_tile_kernel, mxu_dtype=mxu_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),             # h2
            pl.BlockSpec(memory_space=pltpu.SMEM),             # n
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),        # rsq_i
            pl.BlockSpec((bi, p), lambda i, j: (i, 0)),        # theta_i
            pl.BlockSpec((bj, 1), lambda i, j: (j, 0)),        # rsq_j
            pl.BlockSpec((bj, 2 * p), lambda i, j: (j, 0)),    # gt_j
        ],
        out_specs=[
            pl.BlockSpec((bi, 2 * p), lambda i, j: (i, 0)),    # both
            pl.BlockSpec((bi, 1), lambda i, j: (i, 0)),        # ksum
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, 2 * p), f32),
            jax.ShapeDtypeStruct((m_pad, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * 3 * p,
            bytes_accessed=4 * (m_pad * p + n_pad * p * 2
                                + m_pad * n_pad // 64),
            transcendentals=m_pad * n_pad,
        ),
        interpret=interpret,
    )(h2_arr, n_arr, rsq_i, rows_p, rsq_j, gt)

    return both[:m], ksum[:m]


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
    p = theta_rows.shape[1]
    n = theta_cols.shape[0]
    if n_total is None:
        n_total = n
    dtype = theta_rows.dtype
    f32 = jnp.float32
    both, ksum = pallas_svgd_both_ksum(
        theta_rows, theta_cols, grads_cols, h2, block_i=block_i,
        block_j=block_j, interpret=interpret, precision=precision,
    )
    attract = both[:, :p]
    ktheta = both[:, p:]
    h2f = jnp.asarray(h2, f32)
    phi = (
        attract + (ksum * theta_rows.astype(f32) - ktheta) / h2f
    ) / n_total
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
