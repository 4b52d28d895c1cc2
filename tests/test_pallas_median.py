"""Fused (single-kernel) Pallas warm median == the XLA warm search,
exactly: integer counts and order-independent min/max make the two
implementations bitwise-equal on the same distance block."""

import jax.numpy as jnp
import numpy as np
import pytest

from stein_tpu.ops.median import (
    _strided_rows,
    _warm_search,
    warm_bisect_median_on_D,
)
from stein_tpu.ops.pallas_median import fused_warm_median_rows


def _block(n, m, seed=0):
    rng = np.random.default_rng(seed)
    theta = rng.normal(size=(n, 16))
    D = ((theta[:, None, :] - theta[None, :, :]) ** 2).sum(-1)
    return jnp.asarray(_strided_rows(jnp.asarray(D, jnp.float32), m))


@pytest.mark.parametrize("n,m", [(64, 64), (200, 64), (1000, 512)])
@pytest.mark.parametrize("warm_passes", [8, 6, 4])
def test_fused_equals_xla_warm_search(n, m, warm_passes):
    D_sub = _block(n, m)
    ref_med = float(_warm_search(
        D_sub, jnp.float32(0.0), warm_passes,
    ))
    # Hints chosen to land in EVERY bracket regime: exact (tight),
    # 0.8x / 1.25x (mid — the fast-shrink band), 0.5x (wide), 10x
    # (full-range fallback), 0.0 (cold).
    for med_prev in (0.0, ref_med, 0.8 * ref_med, 1.25 * ref_med,
                     0.5 * ref_med, 10.0 * ref_med):
        want = float(_warm_search(
            D_sub, jnp.float32(med_prev), warm_passes,
        ))
        got = float(fused_warm_median_rows(
            D_sub, jnp.float32(med_prev), warm_passes=warm_passes,
            interpret=True,
        ))
        assert got == want, (med_prev, got, want)


def test_fused_matches_on_D_entry_point():
    """Equality against the public on-D entry (same strided subsample)."""
    rng = np.random.default_rng(3)
    theta = rng.normal(size=(300, 8))
    D = jnp.asarray(
        ((theta[:, None, :] - theta[None, :, :]) ** 2).sum(-1), jnp.float32
    )
    med_prev = jnp.float32(float(jnp.median(D)))
    want = float(warm_bisect_median_on_D(D, med_prev, max_rows=128,
                                         warm_passes=6))
    got = float(fused_warm_median_rows(_strided_rows(D, 128), med_prev,
                                       warm_passes=6, interpret=True))
    assert got == want


def test_sampler_fused_median_matches_xla_trajectory():
    """SVGDSampler(median_impl='fused') reproduces the XLA warm-median
    trajectory exactly (same medians -> same bandwidths -> same steps).
    n chosen so the [n, n] block is INSIDE the fused envelope (> 100k
    entries) — the kernel really runs, not the small-block fallback."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(0)
    n, p = 330, 6
    X = rng.normal(size=(80, p))
    y = X @ rng.normal(size=(p, 1))
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}

    def make(median_impl):
        return SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(), gd=Adam(learning_rate=1e-1),
            theta=theta0, median="bisect", warm_median=True,
            warm_passes=6, median_impl=median_impl, pallas_interpret=True,
        )

    a, b = make("xla"), make("fused")
    aux_a = a.run(batch, 6)
    aux_b = b.run(batch, 6)
    np.testing.assert_array_equal(
        np.asarray(aux_a["median"]), np.asarray(aux_b["median"])
    )
    np.testing.assert_array_equal(a.samples, b.samples)


def test_fused_requires_bisect():
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    model = LinearRegressionModel(3)
    with pytest.raises(ValueError, match="bisect"):
        SVGDSampler(
            n_particles=8, log_p=model.log_p,
            param_template=model.template(), gd=Adam(learning_rate=1e-1),
            median="exact", median_impl="fused",
        )


def test_sampler_fused_cold_bisect_matches_xla():
    """Without warm_median, median_impl='fused' runs the COLD quad-ary
    search in one kernel — bitwise-equal to the XLA bisect (the cold
    search is the warm search with no hint) once the block is in the
    quad-ary regime (> 100k entries)."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(5)
    n, p = 400, 4      # 400x400 block = 160k entries > 100k
    X = rng.normal(size=(60, p))
    y = X @ rng.normal(size=(p, 1))
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}

    def make(median_impl):
        return SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(), gd=Adam(learning_rate=1e-1),
            theta=theta0, median="bisect", median_passes=16,
            median_impl=median_impl, pallas_interpret=True,
        )

    a, b = make("xla"), make("fused")
    aux_a = a.run(batch, 3)
    aux_b = b.run(batch, 3)
    np.testing.assert_array_equal(
        np.asarray(aux_a["median"]), np.asarray(aux_b["median"])
    )
    np.testing.assert_array_equal(a.samples, b.samples)


def test_fused_rejects_mesh():
    import jax
    from jax.sharding import Mesh
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    model = LinearRegressionModel(3)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("particles",))
    with pytest.raises(ValueError, match="single-device"):
        SVGDSampler(
            n_particles=8, log_p=model.log_p,
            param_template=model.template(), gd=Adam(learning_rate=1e-1),
            median="bisect", warm_median=True, median_impl="fused",
            mesh=mesh,
        )


def test_fused_rejects_int32_overflow():
    import jax

    big = jax.ShapeDtypeStruct((65536, 65536), jnp.float32)
    with pytest.raises(ValueError, match="int32"):
        jax.eval_shape(
            lambda d: fused_warm_median_rows(d, 1.0, interpret=True), big
        )


def test_fused_block_envelope():
    """The fused kernel applies only in the quad-ary regime AND inside
    VMEM; outside, callers fall back to the bitwise-equal XLA search."""
    from stein_tpu.ops.pallas_median import fused_block_ok

    assert not fused_block_ok(512, 100)       # dual-rank regime (<=100k)
    assert fused_block_ok(512, 1000)          # bench n=1k block (2 MB)
    assert fused_block_ok(128, 10240)         # bench n=10k block (5.2 MB)
    assert not fused_block_ok(512, 10240)     # 20 MB > VMEM
    assert not fused_block_ok(65536, 65536)   # int32 overflow


def test_fused_small_block_falls_back_to_xla():
    """Below the quad-ary regime, median_impl='fused' silently takes the
    XLA dual-rank search — identical to median_impl='xla' by
    construction; pin that the sampler wiring doesn't force the kernel."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(6)
    n, p = 120, 4     # 120x120 block = 14.4k entries < 100k
    X = rng.normal(size=(40, p))
    y = X @ rng.normal(size=(p, 1))
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}

    def make(median_impl):
        return SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(), gd=Adam(learning_rate=1e-1),
            theta=theta0, median="bisect", median_impl=median_impl,
            pallas_interpret=True,
        )

    a, b = make("xla"), make("fused")
    a.run(batch, 3)
    b.run(batch, 3)
    np.testing.assert_array_equal(a.samples, b.samples)


def test_fused_warm_median_from_theta_matches_reference():
    """median_impl='fused_gram''s kernel (Gram + whole warm search in
    ONE invocation): in interpret mode the in-kernel dot is exact f32,
    so the result must equal the XLA warm search run on the same
    CENTERED distance block (centering is the kernel's documented
    off-origin guard; D is translation-invariant up to fp)."""
    from stein_tpu.ops.median import (
        _warm_search,
        row_subsample_block,
        subsample_rows,
    )
    from stein_tpu.ops.pallas_median import fused_warm_median_from_theta

    rng = np.random.default_rng(0)
    n, p, m_rows = 600, 8, 512
    theta = jnp.asarray(rng.normal(size=(n, p)) * 0.7 + 3.0, jnp.float32)
    med_prev = jnp.float32(0.0)
    center = jnp.mean(theta, axis=0, keepdims=True)
    got = fused_warm_median_from_theta(
        subsample_rows(theta, m_rows) if n > m_rows else theta,
        theta, med_prev, center, warm_passes=16, interpret=True,
    )
    tc = theta - center
    want = _warm_search(
        row_subsample_block(tc, m_rows), med_prev, 16
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    # And it's a faithful median: compare to the exact subsample median.
    exact = float(jnp.median(row_subsample_block(theta, m_rows)))
    np.testing.assert_allclose(float(got), exact, rtol=2e-2)


def test_sampler_fused_gram_median_tracks_fused():
    """The whole sampler at median_impl='fused_gram' (interpret mode:
    exact f32 dots) tracks median_impl='fused' — the only differences
    are the centered Gram's fp order, so trajectories agree to f32
    class over a few steps; both scan (run) and cold (train_on_batch)
    paths."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(3)
    n, p = 512, 8
    X = rng.normal(size=(64, p))
    y = X @ rng.normal(size=(p, 1))
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}

    def make(median_impl):
        return SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(), gd=Adam(learning_rate=1e-1),
            theta=theta0, median="bisect", warm_median=True,
            kernel_impl="pallas", median_impl=median_impl,
            pallas_interpret=True,
        )

    a, b = make("fused"), make("fused_gram")
    a.run(batch, 5)
    b.run(batch, 5)
    np.testing.assert_allclose(b.samples, a.samples, rtol=1e-4,
                               atol=1e-7)
    c = make("fused_gram")
    for _ in range(3):
        c.train_on_batch(batch)
    assert np.isfinite(np.asarray(c.samples)).all()


def test_fused_gram_requires_pallas_kernel():
    """median_impl='fused_gram' with kernel_impl='xla' is refused: the
    XLA step materialises D at HIGHEST anyway, so recomputing the
    median block in-kernel would change its numerics for no win."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    model = LinearRegressionModel(4)
    with pytest.raises(ValueError, match="fused_gram"):
        SVGDSampler(
            n_particles=64, log_p=model.log_p,
            param_template=model.template(), gd=Adam(learning_rate=1e-1),
            median="bisect", median_impl="fused_gram",
        )


def test_fused_gram_small_or_large_falls_back():
    """Shapes outside the from-theta kernel's envelope (below the
    quad-ary regime, or blocks past the VMEM gate) take the
    HIGHEST-Gram 'fused' path — strictly more accurate, bitwise equal
    to median_impl='fused' by construction."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(6)
    n, p = 120, 4     # 120x120 = 14.4k entries < 100k: below the regime
    X = rng.normal(size=(40, p))
    y = X @ rng.normal(size=(p, 1))
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}

    def make(median_impl):
        return SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(), gd=Adam(learning_rate=1e-1),
            theta=theta0, median="bisect", warm_median=True,
            kernel_impl="pallas", median_impl=median_impl,
            pallas_interpret=True,
        )

    a, b = make("fused"), make("fused_gram")
    a.run(batch, 3)
    b.run(batch, 3)
    np.testing.assert_array_equal(a.samples, b.samples)


def test_fused_gram_large_block_path():
    """median_impl='fused_gram' above the one-kernel gate takes the
    tiled pallas_dist_block + fused rows search (the large-n half;
    measured negative at n=10240 so not a default — RESULTS.md r4 —
    but the spelling must stay correct). Interpret mode: exact f32, so
    it matches the 'fused' (HIGHEST-Gram) trajectory to centered-fp
    tolerance, including a non-tile-multiple n (column padding must be
    trimmed before the counts)."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel
    from stein_tpu.ops.median import subsample_rows
    from stein_tpu.ops.pallas_median import (
        bracket_pass_fits,
        pallas_dist_block,
        fused_warm_median_rows,
    )
    from stein_tpu.ops.median import row_subsample_block, _warm_search

    rng = np.random.default_rng(5)
    n, p, m = 3000, 640, 128  # past the one-kernel gate; n % 512 != 0
    assert not bracket_pass_fits(m, n, p)
    theta = jnp.asarray(rng.normal(size=(n, p)) + 2.0, jnp.float32)
    rows = subsample_rows(theta, m)
    center = jnp.mean(theta, axis=0, keepdims=True)
    D = pallas_dist_block(rows, theta, center, block_j=512,
                          interpret=True)
    got = fused_warm_median_rows(D, jnp.float32(0.0), warm_passes=16,
                                 interpret=True)
    want = _warm_search(
        row_subsample_block(theta - center, m), jnp.float32(0.0), 16
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    # End-to-end through the sampler dispatch (the fused_gram spelling
    # at a large-block shape).
    X = rng.normal(size=(64, p))
    y = X @ rng.normal(size=(p, 1))
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}

    import jax

    def make(median_impl):
        return SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(), gd=Adam(learning_rate=1e-1),
            key=jax.random.PRNGKey(0), median="bisect", warm_median=True,
            kernel_impl="pallas", median_impl=median_impl,
            median_max_rows=m, pallas_interpret=True,
        )

    a, b = make("fused"), make("fused_gram")
    a.run(batch, 3)
    b.run(batch, 3)
    np.testing.assert_allclose(b.samples, a.samples, rtol=1e-4,
                               atol=1e-7)


def test_fused_bracket_grid_pass_matches_xla_counts():
    """The r5 GRID bracket kernel (the O(1)-collective mesh median's
    pass 1): its in-kernel centered D block must equal the XLA centered
    distance block bitwise-in-interpret, and its per-edge counts must
    equal XLA counting at the SAME grid_edges thresholds — the contract
    ops/median.sharded_warm_from_grid relies on to finish the search
    with two psums."""
    from stein_tpu.ops.median import DEFAULT_BRACKETS
    from stein_tpu.ops.pallas_median import (
        fused_bracket_grid_pass,
        grid_edges,
    )

    rng = np.random.default_rng(7)
    theta = rng.normal(size=(96, 16)).astype(np.float32) + 3.0
    rows = jnp.asarray(theta[:32])
    cols = jnp.asarray(theta)
    center = jnp.mean(cols, axis=0, keepdims=True)
    rsq = jnp.sum((cols - center) ** 2, axis=1)
    hi_bound = 4.0 * jnp.max(rsq) * 1.0001 + 1e-30

    rc = rows - center
    cc = cols - center
    D_want = (
        jnp.sum(rc * rc, axis=1, keepdims=True)
        + jnp.sum(cc * cc, axis=1)[None, :]
        - 2.0 * rc @ cc.T
    )
    med_prev = jnp.float32(float(jnp.median(D_want)))

    for hint in (med_prev, jnp.float32(0.0), 10.0 * med_prev):
        D, cnts = fused_bracket_grid_pass(
            rows, cols, hint, center, hi_bound, interpret=True,
        )
        # D vs the XLA comparator: same f32 math, different dot
        # association -> tight allclose, not bitwise.
        np.testing.assert_allclose(
            np.asarray(D), np.asarray(D_want), rtol=1e-5, atol=1e-4,
        )
        # Counts vs the kernel's OWN block at the shared grid_edges:
        # BITWISE (this is the contract sharded_warm_from_grid needs —
        # psum'd counts consistent with the emitted D).
        edges = grid_edges(hint, hi_bound, DEFAULT_BRACKETS, 16)
        want = np.asarray(
            [int(jnp.sum(D <= t)) for t in edges], np.int32
        )
        np.testing.assert_array_equal(np.asarray(cnts), want)
    # The fallback grid's last edge must bound every entry (the
    # "always valid" contract).
    assert float(hi_bound) >= float(jnp.max(D_want))


def test_fused_bracket_grid_pass_guards():
    """f32-only and int32-count guards fail loudly (same contract as
    fused_bracket_pass)."""
    from stein_tpu.ops.pallas_median import fused_bracket_grid_pass

    r64 = jnp.zeros((4, 8), jnp.float64)
    c32 = jnp.zeros((4, 8), jnp.float32)
    with pytest.raises(TypeError, match="f32-only"):
        fused_bracket_grid_pass(r64, c32, 1.0, jnp.zeros((1, 8)), 1.0,
                                interpret=True)
