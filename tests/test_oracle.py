"""Self-consistency tests for the NumPy oracle (baselines/numpy_svgd.py).

These pin the oracle to the reference's exact semantics: the closed-form
repulsive term must equal -0.5 * (autodiff of sum(K) w.r.t. the particles,
which double-counts via K's symmetry), and the median formula must equal the
reference's top_k construction (compute_median.py:4-16).
"""

import numpy as np
import jax
import jax.numpy as jnp

from baselines import numpy_svgd


def _reference_topk_median(values):
    """Reference compute_median.py:4-16 semantics, in NumPy."""
    v = np.sort(values.ravel())[::-1]  # descending, like tf.nn.top_k
    dim = v.size
    m = dim // 2 + 1
    if dim % 2 == 0:
        return np.mean(v[m - 2:m])
    return v[m - 1]


def test_median_matches_reference_topk_formula():
    rng = np.random.default_rng(0)
    for n in [3, 4, 7, 10]:
        D = rng.normal(size=(n, n))
        D = D + D.T
        np.fill_diagonal(D, 0.0)
        assert np.isclose(
            np.median(D.ravel()), _reference_topk_median(D)
        )


def test_repulsive_closed_form_equals_half_autodiff():
    """dK_i == -0.5 * d/dtheta_i [ sum_{j,l} K_{jl} ], the reference's
    squared_exponential_kernel.py:25-35 computation."""
    rng = np.random.default_rng(1)
    n, p = 8, 5
    theta = rng.normal(size=(n, p))

    K, dK, h2 = numpy_svgd.rbf_kernel_and_repulse(theta)

    def sum_K(th):
        r = jnp.sum(th * th, axis=1, keepdims=True)
        D = r + th @ th.T * (-2.0) + r.T
        # bandwidth is stop_gradient'ed in the reference
        # (abstract_kernel.py:40), so treat h2 as a constant here.
        return jnp.sum(jnp.exp(-D / h2 / 2.0))

    autodiff = jax.grad(sum_K)(jnp.asarray(theta))
    np.testing.assert_allclose(dK, -0.5 * np.asarray(autodiff), rtol=1e-9)


def test_phi_direction_small_case():
    """phi = (K@grads + dK)/n on a tiny case, elementwise vs direct formula."""
    rng = np.random.default_rng(2)
    n, p = 6, 3
    theta = rng.normal(size=(n, p))
    grads = rng.normal(size=(n, p))
    phi, h2 = numpy_svgd.compute_phi(theta, grads)

    # Direct per-pair formula.
    D = np.array([
        [np.sum((theta[i] - theta[j]) ** 2) for j in range(n)]
        for i in range(n)
    ])
    med = np.median(
        (numpy_svgd.pairwise_sq_dists(theta)).ravel()
    )
    h2_direct = med / np.log(n)
    K = np.exp(-D / h2_direct / 2.0)
    expect = np.zeros((n, p))
    for i in range(n):
        for j in range(n):
            expect[i] += K[i, j] * grads[j]
            expect[i] += K[i, j] * (theta[i] - theta[j]) / h2_direct
    expect /= n
    np.testing.assert_allclose(phi, expect, rtol=1e-7)
    np.testing.assert_allclose(h2, h2_direct, rtol=1e-7)


def test_clip():
    phi = np.ones((4, 4)) * 100.0
    clipped = numpy_svgd.clip_phi(phi)
    assert np.isclose(np.linalg.norm(clipped), 10.0)
    small = np.ones((2, 2)) * 0.1
    np.testing.assert_allclose(numpy_svgd.clip_phi(small), small)
