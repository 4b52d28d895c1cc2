"""Fully-fused small-n step tail (step_impl='fused'): the one-kernel
warm-median -> K -> contraction -> clip -> optimizer tail must reproduce
the XLA warm path's trajectory.

Equality structure:
- median at step 1: BITWISE (identical input particles -> identical
  strided block -> the same integer counts and interval arithmetic);
- everything after: tolerance-equal only — the contraction's matmul
  reduction order and the exp2 kernel evaluation differ from XLA
  (the kernel_impl='pallas' tolerance class), so from step 2 the
  trajectories (and hence the medians, computed on different particle
  sets) diverge chaotically within that tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stein_tpu import Adagrad, Adam, SVGDSampler
from stein_tpu.models import LinearRegressionModel


def _problem(n=48, p=6, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(80, p))
    y = X @ rng.normal(size=(p, 1))
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    return model, batch, theta0


def _make(model, theta0, gd, step_impl, **kw):
    return SVGDSampler(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(), gd=gd, theta=theta0,
        median="bisect", warm_median=True, warm_passes=6,
        step_impl=step_impl, pallas_interpret=True, **kw,
    )


@pytest.mark.parametrize("gd_factory", [
    lambda: Adam(learning_rate=1e-1, decay=0.999),
    lambda: Adagrad(learning_rate=5e-2),
])
def test_fused_step_matches_xla_warm_trajectory(gd_factory):
    model, batch, theta0 = _problem()
    a = _make(model, theta0, gd_factory(), "xla")
    b = _make(model, theta0, gd_factory(), "fused")
    aux_a = a.run(batch, 15)
    aux_b = b.run(batch, 15)
    med_a = np.asarray(aux_a["median"])
    med_b = np.asarray(aux_b["median"])
    # Step 1 runs both searches on IDENTICAL particles: bitwise.
    assert med_b[0] == med_a[0], (med_b[0], med_a[0])
    # Later steps run on (tolerance-)diverged particles: close, not equal.
    np.testing.assert_allclose(med_b, med_a, rtol=5e-3)
    np.testing.assert_allclose(
        b.samples, a.samples, rtol=2e-4, atol=1e-6,
        err_msg="fused-tail trajectory diverged beyond matmul-order "
                "tolerance",
    )
    np.testing.assert_allclose(
        np.asarray(aux_b["phi_norm"]), np.asarray(aux_a["phi_norm"]),
        rtol=1e-4,
    )


def test_fused_step_optimizer_state_roundtrip():
    """The in-kernel gd.update must carry the full optimizer state
    (count, decayed lr, moments) identically to the XLA step."""
    model, batch, theta0 = _problem(seed=1)
    a = _make(model, theta0, Adam(learning_rate=1e-1, decay=0.99), "xla")
    b = _make(model, theta0, Adam(learning_rate=1e-1, decay=0.99), "fused")
    a.run(batch, 7)
    b.run(batch, 7)
    assert int(a.state.opt_state.count) == int(b.state.opt_state.count)
    np.testing.assert_allclose(
        float(b.state.opt_state.learning_rate),
        float(a.state.opt_state.learning_rate), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(b.state.opt_state.mu), np.asarray(a.state.opt_state.mu),
        rtol=2e-4, atol=1e-7,
    )


def test_fused_step_guards():
    model, batch, theta0 = _problem()
    gd = Adam(learning_rate=1e-1)
    with pytest.raises(ValueError, match="warm_median"):
        SVGDSampler(
            n_particles=48, log_p=model.log_p,
            param_template=model.template(), gd=gd, theta=theta0,
            median="bisect", step_impl="fused",
        )
    with pytest.raises(ValueError, match="kernel"):
        _make(model, theta0, gd, "fused", kernel_impl="pallas")
    with pytest.raises(ValueError, match="VMEM"):
        LR = LinearRegressionModel(128)
        SVGDSampler(
            n_particles=20000, log_p=LR.log_p,
            param_template=LR.template(), gd=gd,
            median="bisect", warm_median=True, step_impl="fused",
        )
    with pytest.raises(ValueError, match="unknown step_impl"):
        _make(model, theta0, gd, "bogus")


def test_fused_tail_rejects_inconsistent_d_arguments():
    """A precomputed D alongside gram_in_kernel=True would be silently
    discarded (the kernel recomputes D at the in-kernel numerics class);
    theta_sub alongside a precomputed D would be silently ignored. Both
    must be loud errors, not silent numerics changes."""
    from stein_tpu.ops.pallas_step import fused_warm_step_tail
    from stein_tpu.ops.rbf import pairwise_sq_dists

    n, p = 16, 4
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    D = pairwise_sq_dists(theta)
    gd = Adam(learning_rate=1e-1)
    state = gd.init((n, p), jnp.float32)
    with pytest.raises(ValueError, match="computes D inside"):
        fused_warm_step_tail(
            theta, grads, D, D, jnp.float32(0.0), state, gd,
            interpret=True, gram_in_kernel=True,
        )
    with pytest.raises(ValueError, match="theta_sub"):
        fused_warm_step_tail(
            theta, grads, D, D, jnp.float32(0.0), state, gd,
            interpret=True, theta_sub=theta[::2],
        )


def test_fused_tail_rejects_structure_changing_optimizer():
    """Regression (r2 advisor): the tail kernel's positional state
    write-back would silently truncate if gd.update returned a pytree
    with a different structure — it must raise at trace time instead."""
    import jax

    class BadGD:
        def init(self, shape, dtype):
            return {"m": jnp.zeros(shape, dtype)}

        def update(self, state, phi):
            # Returns an EXTRA leaf: structure differs from the input.
            return phi, {"m": state["m"] + phi, "extra": jnp.float32(0)}

    from stein_tpu.ops.pallas_step import fused_warm_step_tail

    n, p = 16, 4
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    from stein_tpu.ops.rbf import pairwise_sq_dists
    D = pairwise_sq_dists(theta)
    gd = BadGD()
    with pytest.raises(ValueError, match="structure-preserving"):
        fused_warm_step_tail(
            theta, grads, D, D, jnp.float32(0.0),
            gd.init((n, p), jnp.float32), gd, interpret=True,
        )


def test_fused_step_fits_calibration():
    """FUSED_STEP_VMEM_BUDGET is calibrated to the largest shape measured
    to compile (n=1024/p=128/m=512, the n=1k bench config): that shape
    must pass and a clearly-larger one must be refused."""
    from stein_tpu.ops.pallas_step import (
        FUSED_STEP_VMEM_BUDGET,
        fused_step_fits,
        fused_step_vmem_bytes,
    )

    assert fused_step_fits(1024, 128, 512)
    assert fused_step_vmem_bytes(1024, 128, 512) == FUSED_STEP_VMEM_BUDGET
    assert not fused_step_fits(2048, 128, 512)


@pytest.mark.parametrize("gd_factory", [
    lambda: Adam(learning_rate=1e-1, decay=0.999),
    lambda: Adagrad(learning_rate=5e-2),
])
def test_fused_gram_step_matches_xla_warm_trajectory(gd_factory):
    """step_impl='fused_gram' (D computed IN-kernel): same trajectory
    class as step_impl='fused' — on CPU interpret the in-kernel dot is
    exact f32, so it tracks the XLA warm path to the Pallas tolerance."""
    model, batch, theta0 = _problem()
    a = _make(model, theta0, gd_factory(), "xla")
    b = _make(model, theta0, gd_factory(), "fused_gram")
    aux_a = a.run(batch, 15)
    aux_b = b.run(batch, 15)
    np.testing.assert_allclose(
        np.asarray(aux_b["median"]), np.asarray(aux_a["median"]),
        rtol=5e-3,
    )
    np.testing.assert_allclose(
        b.samples, a.samples, rtol=2e-4, atol=1e-6,
    )


def test_fused_gram_subsampled_median_path():
    """n > median_max_rows exercises the theta_sub input (the strided
    median block computed by a second in-kernel dot): must track the XLA
    warm path with the same subsample policy."""
    model, batch, theta0 = _problem(n=48)
    kw = dict(median_max_rows=16)
    a = _make(model, theta0, Adam(learning_rate=1e-1), "xla", **kw)
    b = _make(model, theta0, Adam(learning_rate=1e-1), "fused_gram", **kw)
    aux_a = a.run(batch, 10)
    aux_b = b.run(batch, 10)
    np.testing.assert_allclose(
        np.asarray(aux_b["median"]), np.asarray(aux_a["median"]),
        rtol=5e-3,
    )
    np.testing.assert_allclose(
        b.samples, a.samples, rtol=2e-4, atol=1e-6,
    )


def test_fused_gram_mesh_guard():
    """step_impl='fused_gram' refuses meshes like 'fused' does."""
    import jax
    from stein_tpu.parallel import particle_mesh
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    model, batch, theta0 = _problem()
    with pytest.raises(ValueError, match="single-device"):
        SVGDSampler(
            n_particles=theta0.shape[0], log_p=model.log_p,
            param_template=model.template(), gd=Adam(), theta=theta0,
            median="bisect", warm_median=True, step_impl="fused_gram",
            mesh=particle_mesh(jax.devices()[:2]),
        )


@pytest.mark.parametrize("gd_factory", [
    lambda: Adam(learning_rate=1e-1, decay=0.999),
    lambda: Adagrad(learning_rate=5e-2),
])
def test_fused_glm_step_matches_xla_warm_trajectory(gd_factory):
    """step_impl='fused_glm': the whole step (gradients from the
    quadratic form, median, K, contractions, clip, optimizer) in ONE
    kernel must track the XLA warm path running log_p autodiff on the
    same sufficient-statistics batch (identical math, different op
    order) — for both step rules."""
    model, batch, theta0 = _problem()
    suff = model.sufficient_batch(batch)
    a = _make(model, theta0, gd_factory(), "xla")
    b = SVGDSampler(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(), gd=gd_factory(),
        theta=theta0, median="bisect", warm_median=True, warm_passes=6,
        step_impl="fused_glm", quadratic_form=model.quadratic_form,
        pallas_interpret=True,
    )
    aux_a = a.run(suff, 15)
    aux_b = b.run(suff, 15)
    np.testing.assert_allclose(
        np.asarray(aux_b["median"]), np.asarray(aux_a["median"]),
        rtol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(aux_b["log_p_mean"]), np.asarray(aux_a["log_p_mean"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(b.samples, a.samples, rtol=2e-4,
                               atol=1e-6)


def test_fused_glm_guards():
    model, batch, theta0 = _problem()
    common = dict(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(), gd=Adam(), theta=theta0,
        median="bisect", warm_median=True,
    )
    with pytest.raises(ValueError, match="quadratic_form"):
        SVGDSampler(**common, step_impl="fused_glm")
    with pytest.raises(ValueError, match="fused_glm"):
        SVGDSampler(**common, step_impl="fused",
                    quadratic_form=model.quadratic_form)


@pytest.mark.parametrize("gd_factory", [
    lambda: Adam(learning_rate=1e-1, decay=0.999),
    lambda: Adagrad(learning_rate=5e-2),
])
def test_epilogue_step_matches_pallas_warm_trajectory(gd_factory):
    """step_impl='epilogue' keeps the tile and warm median bitwise-equal
    to the plain kernel_impl='pallas' warm path and only re-expresses
    the tail (phi combine + clip + optimizer) as one gridded kernel —
    so unlike the fused_gram tests, the trajectories here must match to
    optimizer-reformulation tolerance (Adam's in-kernel exp/log pow),
    not the Pallas D tolerance class."""
    model, batch, theta0 = _problem()
    a = _make(model, theta0, gd_factory(), "xla", kernel_impl="pallas")
    b = _make(model, theta0, gd_factory(), "epilogue",
              kernel_impl="pallas")
    aux_a = a.run(batch, 15)
    aux_b = b.run(batch, 15)
    med_a = np.asarray(aux_a["median"])
    med_b = np.asarray(aux_b["median"])
    # Identical tile + identical median machinery: step 1 is bitwise.
    assert med_b[0] == med_a[0], (med_b[0], med_a[0])
    np.testing.assert_allclose(med_b, med_a, rtol=1e-5)
    np.testing.assert_allclose(b.samples, a.samples, rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(aux_b["phi_norm"]), np.asarray(aux_a["phi_norm"]),
        rtol=1e-5,
    )


def test_fused_epilogue_unit_vs_manual():
    """fused_epilogue == phi combine -> clip -> gd.update, including a
    row count NOT divisible by the block (zero-padding must not leak
    into outputs or the scalar state)."""
    from stein_tpu.ops.pallas_step import fused_epilogue

    n, p = 40, 6
    rng = np.random.default_rng(3)
    theta = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    ku = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    ksum = jnp.asarray(rng.uniform(1.0, 2.0, size=(n, 1)), jnp.float32)
    center = jnp.mean(theta, axis=0, keepdims=True)
    h2 = jnp.float32(0.7)
    gd = Adam(learning_rate=1e-1)
    opt_state = gd.init((n, p), jnp.float32)

    phi = (ku + ksum * (theta - center) / h2) / n
    norm = jnp.sqrt(jnp.sum(phi * phi))
    c = jnp.float32(10.0)
    phi_c = phi * (c / jnp.maximum(c, norm))
    delta, want_state = gd.update(opt_state, phi_c)
    want_theta = theta + delta

    for block_rows in (16, None):  # 16 pads 40 -> 48; None = one block
        got_theta, got_state = fused_epilogue(
            ku, ksum, theta, center, h2, norm, opt_state, gd,
            max_phi_norm=10.0, block_rows=block_rows, interpret=True,
        )
        np.testing.assert_allclose(got_theta, want_theta, rtol=2e-6,
                                   atol=1e-7)
        for got, want in zip(
            jax.tree_util.tree_leaves(got_state),
            jax.tree_util.tree_leaves(want_state),
        ):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-6, atol=1e-7)


def test_fused_epilogue_rejects_structure_changing_optimizer():
    from stein_tpu.ops.pallas_step import fused_epilogue

    class BadGD:
        def init(self, shape, dtype):
            return {"m": jnp.zeros(shape, dtype)}

        def update(self, state, phi):
            return phi, {"m": state["m"] + phi, "extra": jnp.float32(0)}

    n, p = 16, 4
    rng = np.random.default_rng(0)
    theta = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    ku = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    ksum = jnp.ones((n, 1), jnp.float32)
    gd = BadGD()
    with pytest.raises(ValueError, match="structure-preserving"):
        fused_epilogue(
            ku, ksum, theta, jnp.zeros((1, p), jnp.float32),
            jnp.float32(1.0), jnp.float32(1.0),
            gd.init((n, p), jnp.float32), gd, interpret=True,
        )


def test_epilogue_guards():
    model, batch, theta0 = _problem()
    gd = Adam(learning_rate=1e-1)
    with pytest.raises(ValueError, match="warm_median"):
        SVGDSampler(
            n_particles=48, log_p=model.log_p,
            param_template=model.template(), gd=gd, theta=theta0,
            median="bisect", kernel_impl="pallas", step_impl="epilogue",
        )
    with pytest.raises(ValueError, match="kernel_impl='pallas'"):
        _make(model, theta0, gd, "epilogue")  # default kernel_impl=xla


def _logreg_problem(n=48, d=6, n_obs=20, seed=1):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_obs, d))
    w_true = rng.normal(size=(d, 1))
    y = (X @ w_true > 0).astype(np.float64).reshape(n_obs, 1)
    from stein_tpu.models import LogisticRegressionModel
    model = LogisticRegressionModel(d, n_train=200, n_batch=n_obs)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    theta0 = jnp.asarray(rng.normal(size=(n, d + 1)) * 0.1, jnp.float32)
    return model, batch, theta0


def test_logreg_inkernel_grad_matches_autodiff():
    """LogisticRegressionModel.inkernel_model's hand-derived gradients
    and log_p values must equal vmap(value_and_grad(log_p)) to f32
    rounding when evaluated OUTSIDE the kernel (exact algebra; the
    in-kernel dot precision class is a separate, on-chip concern)."""
    from stein_tpu.utils.ravel import template_unraveler

    model, batch, theta0 = _logreg_problem()
    _, unravel = template_unraveler(model.template())
    ikm = model.inkernel_model(batch)
    grads_k, logp_mean_k = ikm.grad_fn(theta0, *ikm.operands)

    def lp(row):
        return model.log_p(unravel(row), batch)

    vals, grads_a = jax.vmap(jax.value_and_grad(lp))(theta0)
    scale_g = float(jnp.max(jnp.abs(grads_a)))
    np.testing.assert_allclose(np.asarray(grads_k), np.asarray(grads_a),
                               atol=2e-6 * scale_g)
    np.testing.assert_allclose(
        float(logp_mean_k + ikm.const), float(jnp.mean(vals)), rtol=1e-6
    )


@pytest.mark.parametrize("gd_factory", [
    lambda: Adam(learning_rate=1e-1, decay=0.999),
    lambda: Adagrad(learning_rate=5e-2),
])
def test_fused_model_logreg_matches_xla_warm_trajectory(gd_factory):
    """step_impl='fused_model' + LogisticRegressionModel.inkernel_model:
    the whole hierarchical-logistic step (sigmoid-likelihood gradients,
    median, K, contractions, clip, optimizer) in ONE kernel must track
    the XLA warm path running log_p autodiff — for both step rules."""
    model, batch, theta0 = _logreg_problem()
    common = dict(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(), theta=theta0,
        median="bisect", warm_median=True, warm_passes=6,
    )
    a = SVGDSampler(gd=gd_factory(), step_impl="xla", **common)
    b = SVGDSampler(gd=gd_factory(), step_impl="fused_model",
                    inkernel_model=model.inkernel_model,
                    pallas_interpret=True, **common)
    aux_a = a.run(batch, 15)
    aux_b = b.run(batch, 15)
    med_a = np.asarray(aux_a["median"])
    med_b = np.asarray(aux_b["median"])
    # Step 1 runs both searches on IDENTICAL particles: bitwise.
    assert med_b[0] == med_a[0], (med_b[0], med_a[0])
    np.testing.assert_allclose(med_b, med_a, rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(aux_b["log_p_mean"]), np.asarray(aux_a["log_p_mean"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(b.samples, a.samples, rtol=2e-4,
                               atol=1e-6)


def test_fused_model_guards():
    model, batch, theta0 = _logreg_problem()
    common = dict(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(), gd=Adam(), theta=theta0,
        median="bisect", warm_median=True,
    )
    with pytest.raises(ValueError, match="inkernel_model"):
        SVGDSampler(**common, step_impl="fused_model")
    with pytest.raises(ValueError, match="fused_model"):
        SVGDSampler(**common, step_impl="fused_gram",
                    inkernel_model=model.inkernel_model)


def test_fused_model_vmem_gate():
    """An in-kernel model whose operands/temporaries blow the VMEM
    budget must be refused at trace time with a clear error, not die in
    the remote Mosaic compile."""
    from stein_tpu.ops.pallas_step import InKernelModel

    model, batch, theta0 = _logreg_problem()
    base = model.inkernel_model(batch)
    fat = lambda b: InKernelModel(
        operands=base.operands, grad_fn=base.grad_fn, const=base.const,
        vmem_bytes=lambda n: 1 << 30,
    )
    s = SVGDSampler(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(), gd=Adam(), theta=theta0,
        median="bisect", warm_median=True, step_impl="fused_model",
        inkernel_model=fat, pallas_interpret=True,
    )
    with pytest.raises(ValueError, match="VMEM"):
        s.run(batch, 2)


def test_fused_pblock_matches_fused_gram_tail():
    """The p-BLOCKED fused tail (fused_warm_step_pblock — D/K resident,
    theta/grads/moments streamed in p-tiles through a 3-phase grid;
    admits shapes past the all-at-once tail's VMEM gate, e.g. the NN's
    p=303) reproduces the fused_gram tail on the same inputs to fp
    order in interpret mode (both use the full-D median — no row
    subsample — and the same centered in-kernel Gram). MEASURED
    NEGATIVE on-chip at the NN shape (37.3 us vs the ~26 us unfused
    median+tile+XLA chain: the full-n^2 median counts dominate —
    RESULTS.md r4), kept as the documented artifact."""
    from stein_tpu.ops.pallas_step import (
        fused_warm_step_pblock,
        fused_warm_step_tail,
    )
    from stein_tpu.ops.optimizers import Adagrad

    rng = np.random.default_rng(0)
    n, p = 256, 300
    theta = jnp.asarray(rng.normal(size=(n, p)) * 0.5 + 1.0, jnp.float32)
    grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    med0 = jnp.float32(0.0)
    for gd in (Adam(learning_rate=1e-1, decay=0.999),
               Adagrad(learning_rate=1e-1)):
        st = gd.init((n, p), jnp.float32)
        th_a, opt_a, (med_a, norm_a, h2_a) = fused_warm_step_tail(
            theta, grads, None, None, med0, st, gd, warm_passes=16,
            interpret=True, gram_in_kernel=True, theta_sub=None,
        )
        th_b, opt_b, (med_b, norm_b, h2_b) = fused_warm_step_pblock(
            theta, grads, med0, st, gd, warm_passes=16, p_tile=128,
            interpret=True,
        )
        # Adam divides by sqrt(nu): near-zero-phi coordinates amplify
        # the two kernels' fp-order differences (measured max 4.5e-4 =
        # ~1.4% of the lr*0.316 first step on 0.06% of coords) — the
        # same ambiguity class the tests_tpu trajectory tests document.
        np.testing.assert_allclose(np.asarray(th_b), np.asarray(th_a),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(float(med_b), float(med_a),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(norm_b), float(norm_a),
                                   rtol=1e-5)
        for la, lb in zip(jax.tree_util.tree_leaves(opt_a),
                          jax.tree_util.tree_leaves(opt_b)):
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=1e-3, atol=1e-3)


def test_step_impl_cross_parity_random_shapes():
    """Property sweep: RANDOM (n, p, n_obs) shapes — deliberately odd
    (non-multiples of 8/128 exercise every padding path) — through all
    single-device step configurations, asserting the warm scan
    trajectories agree across implementations: the HIGHEST-D impls
    (xla, 'fused') to fp order, the in-kernel-D impls ('fused_gram',
    'fused_glm', pallas tile + fused/fused_gram medians) to their
    documented class (exact in interpret mode up to centering/tile fp
    order)."""
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel
    from stein_tpu.ops.pallas_step import fused_step_fits

    rng = np.random.default_rng(123)
    for trial in range(3):
        n = int(rng.integers(33, 260))
        p = int(rng.integers(3, 37))
        n_obs = int(rng.integers(p + 1, 90))
        X = rng.normal(size=(n_obs, p))
        y = X @ rng.normal(size=(p, 1))
        model = LinearRegressionModel(p)
        raw = {"X": jnp.asarray(X, jnp.float32),
               "y": jnp.asarray(y, jnp.float32)}
        suff = model.sufficient_batch(raw)
        theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
        assert fused_step_fits(n, p)

        def run(batch, **kw):
            s = SVGDSampler(
                n_particles=n, log_p=model.log_p,
                param_template=model.template(),
                gd=Adam(learning_rate=1e-1), theta=theta0,
                median="bisect", warm_median=True,
                pallas_interpret=True, **kw,
            )
            s.run(batch, 3)
            return np.asarray(s.samples)

        base = run(suff)
        configs = [
            ("fused", dict(step_impl="fused", median_impl="fused")),
            ("fused_gram", dict(step_impl="fused_gram",
                                median_impl="fused")),
            ("fused_glm", dict(step_impl="fused_glm",
                               quadratic_form=model.quadratic_form,
                               median_impl="fused")),
            ("pallas", dict(kernel_impl="pallas", median_impl="fused")),
            ("pallas+fg", dict(kernel_impl="pallas",
                               median_impl="fused_gram")),
        ]
        for name, kw in configs:
            out = run(suff, **kw)
            np.testing.assert_allclose(
                out, base, rtol=1e-3, atol=1e-5,
                err_msg=f"trial {trial} n={n} p={p} impl={name}",
            )
