"""Convergence diagnostics: kernel Stein discrepancy (KSD).

The reference offers no convergence measure beyond eyeballing posterior
predictions (SURVEY.md §5). KSD is the natural one for SVGD: it measures
how far the particle ensemble is from stationarity of the target using
exactly the quantities the sampler already computes (particles, scores,
kernel). For the RBF kernel k = exp(-||x-y||^2 / (2 h^2)):

    u(x_i, x_j) = k_ij [ s_i . s_j
                         + (s_i - s_j) . (x_i - x_j) / h^2
                         + p / h^2 - D_ij / h^4 ]

with s_i = grad log p(x_i), and KSD^2 = mean_ij u_ij (V-statistic) or the
off-diagonal mean (U-statistic). Everything is a handful of [n, n] / [n, p]
MXU contractions.
"""

import jax
import jax.numpy as jnp

from . import rbf
from .median import bisect_median


def ksd_rbf(theta, grads, h2=None, u_statistic=False):
    """KSD^2 of the particle set w.r.t. the target whose scores are
    ``grads`` ([n, p] = grad log p per particle), under the RBF kernel
    with bandwidth^2 ``h2`` (sort-free bisect median heuristic if None —
    the exact median's n^2 sort would cost more than an SVGD step).

    Returns a scalar; >= 0 up to fp error for the V-statistic.
    """
    n, p = theta.shape
    D = rbf.pairwise_sq_dists(theta)
    if h2 is None:
        h2 = rbf.bandwidth_sq_from_median(bisect_median(theta), n)
    K = jnp.exp(-D / h2 / 2.0)

    # HIGHEST: the cross term cancels like D does (d_i + d_j - ST - ST^T);
    # bf16-input contractions (TPU default) would swamp small KSD values.
    _hi = jax.lax.Precision.HIGHEST
    SS = jnp.matmul(grads, grads.T, precision=_hi)   # s_i . s_j
    ST = jnp.matmul(grads, theta.T, precision=_hi)   # s_i . x_j
    d = jnp.sum(grads * theta, axis=1)         # s_i . x_i
    # (s_i - s_j).(x_i - x_j) = d_i + d_j - ST_ij - ST_ji
    cross = d[:, None] + d[None, :] - ST - ST.T

    U = K * (SS + cross / h2 + p / h2 - D / (h2 * h2))
    if u_statistic:
        total = jnp.sum(U) - jnp.sum(jnp.diagonal(U))
        return total / (n * (n - 1))
    return jnp.mean(U)
