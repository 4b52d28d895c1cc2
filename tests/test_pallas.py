"""Pallas fused SVGD kernel vs the jnp reference path, in interpret mode
(SURVEY.md §4(e): Pallas kernels tested against their jnp references)."""

import numpy as np
import jax.numpy as jnp
import pytest

from stein_tpu.ops import rbf
from stein_tpu.ops.median import exact_median
from stein_tpu.ops.pallas_svgd import pallas_svgd_phi


@pytest.mark.parametrize("n,p,bi", [
    (64, 16, 32),     # multiple blocks
    (100, 7, 32),     # n not divisible by block, odd p
    (32, 130, 32),    # p > 128
    (16, 3, 64),      # single block larger than n
])
def test_pallas_matches_jnp(n, p, bi):
    rng = np.random.default_rng(n * 1000 + p)
    theta = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)

    D = rbf.pairwise_sq_dists(theta)
    h2 = rbf.bandwidth_sq_from_median(exact_median(D), n)
    phi_ref, _ = rbf.svgd_phi(theta, grads)
    phi_pallas = pallas_svgd_phi(
        theta, grads, h2, block_i=bi, block_j=bi, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(phi_pallas), np.asarray(phi_ref), rtol=2e-5, atol=1e-6
    )


def test_pallas_f64_input_roundtrip():
    """float64 inputs (CPU tests) compute in f32 inside but return f64."""
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=(32, 5)))
    grads = jnp.asarray(rng.normal(size=(32, 5)))
    h2 = rbf.bandwidth_sq_from_median(
        exact_median(rbf.pairwise_sq_dists(theta)), 32
    )
    phi = pallas_svgd_phi(theta, grads, h2, block_i=32, block_j=32,
                          interpret=True)
    assert phi.dtype == theta.dtype
    phi_ref, _ = rbf.svgd_phi(theta, grads)
    np.testing.assert_allclose(
        np.asarray(phi), np.asarray(phi_ref), rtol=1e-4, atol=1e-6
    )


def test_sampler_with_pallas_kernel_impl():
    """SVGDSampler(kernel_impl='pallas') end-to-end (interpret mode) tracks
    the xla-impl sampler closely (subsampled median == exact at this n)."""
    import jax
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(4)
    X = rng.normal(size=(40, 3))
    y = X @ rng.normal(size=(3, 1))
    model = LinearRegressionModel(3)
    batch = {"X": jnp.asarray(X, jnp.float32), "y": jnp.asarray(y, jnp.float32)}
    theta0 = jnp.asarray(rng.normal(size=(16, 3)) * 0.01, jnp.float32)
    common = dict(
        n_particles=16, log_p=model.log_p,
        param_template=model.template(), gd=Adam(learning_rate=1e-1),
        theta=theta0, dtype=jnp.float32,
    )
    a = SVGDSampler(kernel_impl="xla", **common)
    b = SVGDSampler(kernel_impl="pallas", median="subsample",
                    pallas_block=16, pallas_interpret=True, **common)
    for _ in range(5):
        a.train_on_batch(batch)
        b.train_on_batch(batch)
    np.testing.assert_allclose(b.samples, a.samples, rtol=2e-4, atol=1e-6)


def test_pallas_bf16_precision_close():
    rng = np.random.default_rng(6)
    n, p = 64, 16
    theta = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    from stein_tpu.ops.median import exact_median
    h2 = rbf.bandwidth_sq_from_median(
        exact_median(rbf.pairwise_sq_dists(theta)), n
    )
    phi_ref, _ = rbf.svgd_phi(theta, grads)
    phi_bf16 = pallas_svgd_phi(theta, grads, h2, block_i=32, block_j=32,
                               interpret=True, precision="bf16")
    # bf16 Gram: ~1e-2 relative tolerance.
    np.testing.assert_allclose(
        np.asarray(phi_bf16), np.asarray(phi_ref), rtol=0.05, atol=5e-3
    )


def test_sym_kernel_matches_full_grid():
    """pallas_svgd_phi_sym (the measured-negative symmetric traversal —
    kept as a documented artifact, RESULTS.md round 3) must still be
    CORRECT: equivalent to the full-grid kernel up to accumulation
    order, across padding shapes."""
    import numpy as np
    from stein_tpu.ops.pallas_svgd import (
        pallas_svgd_phi,
        pallas_svgd_phi_sym,
    )

    rng = np.random.default_rng(7)
    for n, p, b in [(40, 8, 16), (64, 8, 16), (100, 5, 32)]:
        theta = jnp.asarray(rng.normal(size=(n, p)) * 0.3, jnp.float32)
        grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
        h2 = jnp.float32(0.7)
        ref = np.asarray(pallas_svgd_phi(
            theta, grads, h2, block_i=b, block_j=b, interpret=True))
        got = np.asarray(pallas_svgd_phi_sym(
            theta, grads, h2, block=b, interpret=True))
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 1e-5, (n, p, b, err)


def test_on_d_kernel_matches_xla():
    """pallas_svgd_both_ksum_on_D (the 2-D mesh tile: exp2 + contraction
    over a materialised D block) vs the plain jnp computation."""
    import numpy as np
    from stein_tpu.ops.pallas_svgd import pallas_svgd_both_ksum_on_D

    rng = np.random.default_rng(8)
    m, n, p = 24, 56, 6
    theta = rng.normal(size=(n, p)).astype(np.float32)
    rows = theta[:m]
    rsq_r = np.sum(rows * rows, 1)
    rsq = np.sum(theta * theta, 1)
    D = (rsq_r[:, None] + rsq[None, :] - 2.0 * rows @ theta.T)
    gt = rng.normal(size=(n, 2 * p)).astype(np.float32)
    h2 = 0.9
    both, ksum = pallas_svgd_both_ksum_on_D(
        jnp.asarray(D), jnp.asarray(gt), jnp.float32(h2),
        block_i=16, block_j=16, interpret=True,
    )
    K = np.exp(-D / h2 / 2.0)
    np.testing.assert_allclose(np.asarray(both), K @ gt, rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ksum), K.sum(axis=1, keepdims=True), rtol=2e-5,
    )
