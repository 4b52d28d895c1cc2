"""Deployed-numerics fidelity: the REAL f32 TPU step vs the f64 NumPy
oracle (VERDICT r1 item 1 — previously all golden tests forced CPU+x64 and
nobody had measured how far the deployed TPU step deviates).

What the first measurement round (2026-08-17, v5e via axon) established:

- phi itself is f32-faithful: relative error ~1e-5 of the direction's
  scale (see test_phi_direction_fidelity).
- D = r + r^T - 2 T T^T loses digits to CANCELLATION in f32 — with
  particle separations 1e-3 at norms ~8, the error is ~0.1 x max(D),
  which is the inherent f32-FORMULA bound eps_f32 * ||theta||^2 / max(D)
  (the reference's own TF1 f32 graph has the same loss). bf16-input
  matmuls (the TPU DEFAULT precision) would instead give ~6000 x max(D)
  — catastrophic. ops/rbf.py pins Precision.HIGHEST; the cancellation
  test below distinguishes these regimes (measured 0.16, asserts < 1).
- Trajectory max-error after 5 steps is NOT a clean fidelity metric:
  Adam's first-iter update is +-lr*0.316 per coordinate with the sign of
  phi, so an f32-rounding-induced sign flip on a near-zero phi coordinate
  contributes a full 2*lr*0.316 = 0.063 absolute difference (measured
  max errs 5e-3..7e-2 across paths = 0..1 flips). The trajectory tests
  therefore compute the oracle's sign-ambiguity mask (coordinates whose
  clipped phi came within 3e-4 of zero relative to the step's phi scale)
  and assert: unambiguous coordinates match to f32 rounding (<1e-3), and
  even ambiguous ones stay within a 2-flip bound.

Reference semantics matched: stein/kernels/squared_exponential_kernel.py:22
and abstract_kernel.py:33-35 at the precision actually deployed (f32;
HIGHEST Gram matmuls where D's cancellation demands true f32 products,
HIGH — bf16_3x, ~f32-accurate — contractions and model matmuls).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

on_accelerator = jax.devices()[0].platform != "cpu"
pytestmark = pytest.mark.skipif(
    not on_accelerator, reason="needs a real accelerator (TPU)"
)

# One f32-induced Adam sign flip on a near-zero phi coordinate moves that
# coordinate by 2 * lr * (1/(1-b1)) / sqrt(1/(1-b2)) = 2 * 0.1 * 0.316
# per step; allow up to 2 flips' worth across 5 steps.
FLIP_BOUND = 2 * 2 * 0.1 * 0.3163


def _linreg_problem(seed=0, n_particles=64, n_feats=16, n_obs=128):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_obs, n_feats))
    w_true = rng.normal(size=(n_feats, 1))
    y = X @ w_true + rng.normal(size=(n_obs, 1)) * 0.3
    theta0 = rng.normal(size=(n_particles, n_feats)) * 0.01
    return X, y, theta0


def _numpy_grads(X, y, theta):
    """d/dw [ -0.5||Xw-y||^2 - 0.5||w||^2 ] rows, f64."""
    return (y.T - theta @ X.T) @ X - theta


def _oracle_trajectory(X, y, theta0, k_steps, lr=1e-1, amb_tol=3e-4):
    """f64 oracle trajectory + the sign-ambiguity mask: a coordinate is
    ambiguous if at any step its clipped phi was within ``amb_tol`` of
    zero relative to that step's phi scale — there the f32 engine's
    rounding can legitimately flip Adam's +-lr*0.316 update sign, which
    is an artefact of elementwise comparison, not an engine error.
    amb_tol is ~30x the measured phi noise of the path under test:
    3e-4 for the XLA engine (noise ~1e-5), 3e-3 for Pallas (noise ~1e-4
    — tile-blocked reduction order + separate f32 accumulators)."""
    from baselines.numpy_svgd import compute_phi, clip_phi, NumpyAdam

    theta = np.array(theta0, dtype=np.float64)
    gd = NumpyAdam(learning_rate=lr)
    ambiguous = np.zeros(theta.shape, dtype=bool)
    for _ in range(k_steps):
        grads = _numpy_grads(X, y, theta)
        phi, _ = compute_phi(theta, grads)
        phi = clip_phi(phi)
        ambiguous |= np.abs(phi) < amb_tol * np.abs(phi).max()
        theta = theta + gd.update(phi)
    return theta, ambiguous


def _tpu_trajectory(X, y, theta0, k_steps, lr=1e-1, **sampler_kwargs):
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel

    model = LinearRegressionModel(X.shape[1])
    sampler = SVGDSampler(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(), gd=Adam(learning_rate=lr),
        theta=jnp.asarray(theta0, jnp.float32), **sampler_kwargs,
    )
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    sampler.run(batch, k_steps)
    return sampler.samples


def _assert_trajectory_close(got, ref, ambiguous, label, bound=1e-3):
    """Unambiguous coordinates must match to the path's rounding noise
    (``bound`` ~ 30x the measured per-step phi noise, Adam-amplified over
    5 steps: 1e-3 for the XLA engine at ~1e-5 phi noise, 5e-3 for Pallas
    at ~1e-4); larger errors may appear ONLY at oracle-identified
    sign-ambiguous coordinates and are bounded by a couple of flipped
    Adam updates."""
    err = np.abs(got - ref)
    err_clean = err[~ambiguous]
    bad_clean = err_clean.max() if err_clean.size else 0.0
    print(f"[fidelity] {label}: max {err.max():.3e} "
          f"max-unambiguous {bad_clean:.3e} "
          f"ambiguous-frac {ambiguous.mean():.4f}")
    assert bad_clean < bound, (
        f"{label}: unambiguous-coordinate error {bad_clean:.3e} > "
        f"{bound:g} — the deployed f32 step deviates beyond rounding "
        "where Adam's sign is well-determined"
    )
    assert err.max() < FLIP_BOUND, (
        f"{label}: max err {err.max():.3e} exceeds the {FLIP_BOUND:.3f} "
        "bound of 2 Adam sign-flip events"
    )


def test_phi_engine_fidelity():
    """The f32 SVGD ENGINE (median + kernel + direction), isolated from
    gradient computation: identical f64-computed grads are fed to the
    device phi and the oracle phi. This is the framework's core numeric
    guarantee — measured ~1e-5 of the direction's scale."""
    from stein_tpu.api import make_phi_fn
    from baselines.numpy_svgd import compute_phi

    X, y, theta0 = _linreg_problem()
    theta, _ = _oracle_trajectory(X, y, theta0, 3)   # realistic mid-run
    grads64 = _numpy_grads(X, y, theta)

    phi_fn = make_phi_fn(theta.shape[0], median="exact", kernel_impl="xla")
    got = np.asarray(jax.jit(lambda t, g: phi_fn(t, g)[0])(
        jnp.asarray(theta, jnp.float32), jnp.asarray(grads64, jnp.float32)
    ))
    ref, _ = compute_phi(theta, grads64)
    scale = np.abs(ref).max()
    rel = np.abs(got - ref).max() / scale
    print(f"[fidelity] phi ENGINE rel err: {rel:.3e}")
    assert rel < 1e-4, f"engine phi deviates by {rel:.2e} of its scale"
    # Clip-norm agreement (global norm, abstract_stein_sampler.py:125).
    assert abs(np.linalg.norm(got) - np.linalg.norm(ref)) \
        / np.linalg.norm(ref) < 1e-5


def test_phi_direction_fidelity():
    """End-to-end f32 phi INCLUDING on-device model gradients (the
    shipped models pin their data matmuls to Precision.HIGH; with default
    precision the bf16 gradient error pushed this to 6e-4)."""
    from stein_tpu.api import make_phi_fn
    from stein_tpu.models import LinearRegressionModel
    from stein_tpu.utils.ravel import template_unraveler
    from baselines.numpy_svgd import compute_phi

    X, y, theta0 = _linreg_problem()
    theta, _ = _oracle_trajectory(X, y, theta0, 3)

    model = LinearRegressionModel(X.shape[1])
    _, unravel = template_unraveler(model.template())
    phi_fn = make_phi_fn(theta.shape[0], median="exact", kernel_impl="xla")

    def tpu_phi(th, Xj, yj):
        grads = jax.vmap(
            jax.grad(lambda row, b: model.log_p(unravel(row), b)),
            in_axes=(0, None),
        )(th, {"X": Xj, "y": yj})
        phi, _ = phi_fn(th, grads)
        return phi

    got = np.asarray(jax.jit(tpu_phi)(
        jnp.asarray(theta, jnp.float32),
        jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
    ))
    grads64 = _numpy_grads(X, y, theta)
    ref, _ = compute_phi(theta, grads64)
    scale = np.abs(ref).max()
    rel = np.abs(got - ref).max() / scale
    print(f"[fidelity] phi end-to-end rel err: {rel:.3e}")
    assert rel < 1e-4, f"phi deviates by {rel:.2e} of its scale"


def test_f32_xla_step_matches_f64_oracle():
    """5 deployed f32 XLA steps (exact median) vs the f64 oracle."""
    X, y, theta0 = _linreg_problem()
    ref, amb = _oracle_trajectory(X, y, theta0, 5)
    got = _tpu_trajectory(X, y, theta0, 5, median="exact",
                          kernel_impl="xla")
    _assert_trajectory_close(got, ref, amb, "xla exact-median")


def test_f32_bisect_step_matches_f64_oracle():
    """The sort-free bisect median path (the bench configuration)."""
    X, y, theta0 = _linreg_problem(seed=1)
    ref, amb = _oracle_trajectory(X, y, theta0, 5)
    got = _tpu_trajectory(X, y, theta0, 5, median="bisect",
                          median_passes=40, kernel_impl="xla")
    _assert_trajectory_close(got, ref, amb, "xla bisect")


def test_f32_pallas_step_matches_f64_oracle():
    """The Pallas streaming-tile path (the large-n configuration)."""
    X, y, theta0 = _linreg_problem(seed=2, n_particles=256, n_feats=128)
    ref, amb = _oracle_trajectory(X, y, theta0, 5, amb_tol=3e-3)
    got = _tpu_trajectory(X, y, theta0, 5, median="bisect",
                          median_passes=40, kernel_impl="pallas",
                          pallas_block=128)
    _assert_trajectory_close(got, ref, amb, "pallas", bound=5e-3)


def test_sharded_pallas_bitwise_vs_single_chip():
    """The Mosaic-COMPILED sharded Pallas path (kernel_impl='pallas'
    inside shard_map) on a 1-device mesh must be bitwise identical to
    the single-chip Pallas step — identical tile shapes and traversal
    order — both cold and warm. (The multi-device layouts are pinned by
    the CPU interpret-mode equality tests; this covers the compiled
    kernel-in-shard_map path the interpreter cannot.)"""
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel
    from stein_tpu.parallel import particle_mesh

    X, y, theta0 = _linreg_problem(seed=2, n_particles=256, n_feats=128)
    model = LinearRegressionModel(X.shape[1])
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}

    for warm in (False, True):
        common = dict(
            n_particles=theta0.shape[0], log_p=model.log_p,
            param_template=model.template(), median="bisect",
            median_passes=40, kernel_impl="pallas", pallas_block=128,
            theta=jnp.asarray(theta0, jnp.float32),
            warm_median=warm,
        )
        single = SVGDSampler(gd=Adam(learning_rate=1e-1), **common)
        sharded = SVGDSampler(
            gd=Adam(learning_rate=1e-1),
            mesh=particle_mesh(jax.devices()[:1]), **common,
        )
        single.run(batch, 4)
        sharded.run(batch, 4)
        err = np.max(np.abs(sharded.samples - single.samples))
        label = "warm" if warm else "cold"
        print(f"[fidelity] sharded-pallas-{label}: max abs {err:.3e}")
        assert err == 0.0, (
            f"sharded {label} Pallas step deviates from single-chip by "
            f"{err:.3e} on a 1-device mesh (expected bitwise identity)"
        )


def _numpy_sq_dists(theta):
    r = np.sum(theta * theta, axis=1, keepdims=True)
    return r + r.T - 2.0 * theta @ theta.T


def test_gram_cancellation_precision():
    """pairwise_sq_dists must be in the f32-formula regime, not the bf16
    one: particles separated by ~1e-3 with norms ~8 make max(D) ~ 1e-4
    while the Gram terms are ~64, so

      f32 formula (Precision.HIGHEST):  err ~ eps_f32 * 64 / 1e-4 ~ 0.1 x
      bf16 inputs (TPU DEFAULT):        err ~ 0.004 * 64 / 1e-4 ~ 6000 x

    of max(D). Measured 0.16 on v5e with HIGHEST; assert < 1 (three
    orders below the bf16 failure) and within 4x of the host-f32 formula
    error (same dtype, different accumulation order)."""
    from stein_tpu.ops.rbf import pairwise_sq_dists

    rng = np.random.default_rng(3)
    base = rng.normal(size=(1, 64))
    theta = base + rng.normal(size=(128, 64)) * 1e-3
    D_ref = _numpy_sq_dists(theta)              # f64
    scale = D_ref.max()

    D_tpu = np.asarray(
        jax.jit(pairwise_sq_dists)(jnp.asarray(theta, jnp.float32))
    )
    err_tpu = np.abs(D_tpu - D_ref).max() / scale

    t32 = theta.astype(np.float32)
    r32 = np.sum(t32 * t32, axis=1, keepdims=True, dtype=np.float32)
    D_host32 = r32 + r32.T - np.float32(2.0) * (t32 @ t32.T)
    err_host = np.abs(D_host32 - D_ref).max() / scale

    print(f"[fidelity] gram cancellation: tpu {err_tpu:.3e} "
          f"host-f32 {err_host:.3e} (bf16 regime would be ~6e3)")
    assert err_tpu < 1.0, (
        f"D error {err_tpu:.2e} x max(D) — Gram matmul is NOT running at "
        "f32-effective precision (bf16 regime)"
    )
    assert err_tpu < 4.0 * err_host + 1e-6, (
        f"TPU D error {err_tpu:.2e} far exceeds the host f32 formula "
        f"error {err_host:.2e}"
    )


def test_ksd_precision():
    """KSD's cross terms cancel like D does; the deployed f32 KSD must
    track the f64 value (measured: agreement to 6 significant digits)."""
    from stein_tpu.ops.diagnostics import ksd_rbf

    rng = np.random.default_rng(4)
    theta = rng.normal(size=(128, 32)) * 0.1
    grads = -theta * 25.0      # score of N(0, 0.2^2 I)
    got = float(jax.jit(ksd_rbf)(
        jnp.asarray(theta, jnp.float32), jnp.asarray(grads, jnp.float32)
    ))
    D = _numpy_sq_dists(theta)
    n, p = theta.shape
    h2 = np.median(D) / np.log(n)
    K = np.exp(-D / h2 / 2.0)
    SS = grads @ grads.T
    ST = grads @ theta.T
    d = np.sum(grads * theta, axis=1)
    cross = d[:, None] + d[None, :] - ST - ST.T
    ref = float(np.mean(K * (SS + cross / h2 + p / h2 - D / (h2 * h2))))
    print(f"[fidelity] ksd f32 {got:.6g} vs f64 {ref:.6g}")
    assert abs(got - ref) < 1e-3 * max(1.0, abs(ref)), (got, ref)


def test_fused_warm_median_bitwise_on_tpu():
    """The single-kernel Mosaic warm median == the XLA warm search on the
    REAL chip, bitwise (integer counts + order-independent min/max + the
    same scalar interval arithmetic — tests/test_pallas_median.py proves
    this in interpret mode; this pins the compiled Mosaic kernel)."""
    from stein_tpu.ops.median import _strided_rows, _warm_search
    from stein_tpu.ops.pallas_median import fused_warm_median_rows

    rng = np.random.default_rng(7)
    for n, m, wp in ((1000, 512, 6), (4096, 128, 8), (777, 512, 4)):
        theta = rng.normal(size=(n, 32)) * rng.uniform(0.01, 10.0)
        th = jnp.asarray(theta, jnp.float32)
        rsq = jnp.sum(th * th, axis=1)
        D = (rsq[:, None] + rsq[None, :]
             - 2.0 * jnp.matmul(th, th.T,
                                precision=jax.lax.Precision.HIGHEST))
        D_sub = _strided_rows(D, m)
        approx = float(jnp.median(D_sub))
        for med_prev in (0.0, approx, 0.8 * approx, 1.25 * approx,
                         0.3 * approx, 5.0 * approx):
            want = float(_warm_search(
                D_sub, jnp.float32(med_prev), wp,
            ))
            got = float(fused_warm_median_rows(
                D_sub, jnp.float32(med_prev), warm_passes=wp
            ))
            assert got == want, (n, m, wp, med_prev, got, want)


def test_f32_fused_step_matches_f64_oracle():
    """The fully-fused step tail (step_impl='fused' — warm median, K,
    contractions, clip, Adam in one Mosaic kernel; bench.py's n=1k
    configuration) vs the f64 oracle. Same tolerance class as the Pallas
    streaming path (in-kernel matmul reduction order + exp2)."""
    X, y, theta0 = _linreg_problem(seed=3, n_particles=384, n_feats=64)
    ref, amb = _oracle_trajectory(X, y, theta0, 5, amb_tol=3e-3)
    got = _tpu_trajectory(X, y, theta0, 5, median="bisect",
                          median_passes=40, warm_median=True,
                          warm_passes=16, step_impl="fused")
    _assert_trajectory_close(got, ref, amb, "fused step tail", bound=5e-3)


def test_f32_fused_gram_step_matches_f64_oracle():
    """step_impl='fused_gram' (D computed by the IN-KERNEL dot —
    bf16-class inputs, ~2e-3 rel on D, the same class as the Pallas
    streaming tile; benchmarks/sym_and_gram_bench.py precision audit)
    vs the f64 oracle at the Pallas-class tolerances."""
    X, y, theta0 = _linreg_problem(seed=5, n_particles=384, n_feats=64)
    ref, amb = _oracle_trajectory(X, y, theta0, 5, amb_tol=3e-3)
    got = _tpu_trajectory(X, y, theta0, 5, median="bisect",
                          median_passes=40, warm_median=True,
                          warm_passes=16, step_impl="fused_gram")
    _assert_trajectory_close(got, ref, amb, "fused_gram step tail",
                             bound=5e-3)


def test_fused_step_matches_xla_warm_on_chip():
    """The compiled fused tail vs the XLA warm path on the REAL chip — a
    gross-miscompile guard (wrong optimizer state, wrong contraction,
    wrong median would derail EVERY coordinate). Almost all coordinates
    must agree to Pallas-class tolerance; a small fraction legitimately
    diverges by whole Adam steps (an f32 rounding difference flips
    Adam's sign on a near-zero phi coordinate, ±2*lr*0.316 per event,
    then compounds — measured 8/24576 = 0.03% here). The rigorous
    fidelity bound for the fused tail is the f64-oracle test above,
    which masks oracle-identified sign-ambiguous coordinates."""
    X, y, theta0 = _linreg_problem(seed=4, n_particles=384, n_feats=64)
    kw = dict(median="bisect", warm_median=True, warm_passes=6)
    a = _tpu_trajectory(X, y, theta0, 5, **kw)
    b = _tpu_trajectory(X, y, theta0, 5, step_impl="fused", **kw)
    frac_bad = float(np.mean(~np.isclose(b, a, rtol=3e-3, atol=3e-3)))
    print(f"[fidelity] fused-vs-xla flip fraction {frac_bad:.5f}")
    assert frac_bad < 0.005, (
        f"{frac_bad:.2%} of coordinates diverged — beyond what isolated "
        "Adam sign-flip events explain; suspect a real fused-tail bug"
    )


def test_fused_step_posterior_statistics_on_chip():
    """End-to-end statistical correctness of the PRODUCTION config
    (throughput_config -> fused step tail) on the real chip: 1500 steps
    of Bayesian linear regression must land on the conjugate posterior
    (the 5-step trajectory tests above pin numerics; this pins that the
    deployed fast path actually SAMPLES correctly)."""
    from stein_tpu import Adam, SVGDSampler, throughput_config
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(11)
    n, p, n_obs = 512, 8, 256
    X = rng.normal(size=(n_obs, p))
    w_true = rng.normal(size=(p, 1))
    y = X @ w_true + rng.normal(size=(n_obs, 1)) * 0.5

    cfg = throughput_config(n, p)
    assert cfg["step_impl"] == "fused_gram"   # the config under test
    model = LinearRegressionModel(p)
    s = SVGDSampler(
        n_particles=n, log_p=model.log_p, param_template=model.template(),
        gd=Adam(learning_rate=5e-2), key=jax.random.PRNGKey(0), **cfg,
    )
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    s.run(batch, 1500)
    samples = s.samples

    # Conjugate posterior: A = X^T X + I, mean = A^-1 X^T y, cov = A^-1.
    A = X.T @ X + np.eye(p)
    cov = np.linalg.inv(A)
    mean = cov @ (X.T @ y)
    mc = np.sqrt(np.diag(cov) / n)
    err = np.abs(samples.mean(axis=0) - mean.ravel())
    print(f"[fidelity] fused-step posterior: mean max err {err.max():.2e} "
          f"(MC scale {mc.max():.2e}); "
          f"var ratio {(samples.var(axis=0) / np.diag(cov)).round(2)}")
    assert err.max() < 6 * mc.max(), (err.max(), mc.max())
    ratio = samples.var(axis=0) / np.diag(cov)
    assert np.all(ratio > 0.5) and np.all(ratio < 1.6), ratio


def test_ring_layout_bitwise_vs_single_chip():
    """The compiled ring layout (comm='ring' + bisect/warm median +
    Pallas tiles, production-parity since r3) on a 1-device mesh must
    match the single-chip Pallas step bitwise: the ring-assembled
    median block holds the same entries (order-invariant counts) and
    the degenerate single-rotation tile is the same kernel call."""
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel
    from stein_tpu.parallel import particle_mesh

    X, y, theta0 = _linreg_problem(seed=6, n_particles=256, n_feats=128)
    model = LinearRegressionModel(X.shape[1])
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}

    for warm in (False, True):
        common = dict(
            n_particles=theta0.shape[0], log_p=model.log_p,
            param_template=model.template(), median="bisect",
            median_passes=40, kernel_impl="pallas", pallas_block=128,
            theta=jnp.asarray(theta0, jnp.float32), warm_median=warm,
        )
        single = SVGDSampler(gd=Adam(learning_rate=1e-1), **common)
        ring = SVGDSampler(
            gd=Adam(learning_rate=1e-1),
            mesh=particle_mesh(jax.devices()[:1]), comm="ring", **common,
        )
        single.run(batch, 4)
        ring.run(batch, 4)
        err = np.max(np.abs(ring.samples - single.samples))
        label = "warm" if warm else "cold"
        print(f"[fidelity] ring-{label}: max abs {err:.3e}")
        assert err == 0.0, (
            f"ring {label} step deviates from single-chip by {err:.3e} "
            "on a 1-device mesh (expected bitwise identity)"
        )


def test_streaming_ksd_at_scale_on_chip():
    """ksd() at n=10240 runs the streaming row-blocked form (r2 verdict
    item #8: the dense form materialised ~1.2 GB of HIGHEST matrices).
    Pin that it executes on-chip at scale, is finite, and agrees with a
    dense KSD on a strided subsample of the same particles to the
    f32 tolerance expected of the estimator's scale."""
    import time
    from stein_tpu.ops.diagnostics import ksd_rbf

    rng = np.random.default_rng(9)
    n, p = 10240, 64
    theta = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    h2 = jnp.float32(1.3)
    val = float(ksd_rbf(theta, grads, h2=h2))      # compiles + runs
    assert np.isfinite(val)
    t0 = time.perf_counter()
    for _ in range(5):
        val = float(ksd_rbf(theta, grads, h2=h2))
    dt = (time.perf_counter() - t0) / 5
    print(f"[fidelity] streaming KSD n={n}: {val:.4e}, {dt*1e3:.1f} ms "
          "(incl. host fetch RTT)")
    # The streamed full-population value should be close to the dense
    # KSD of a strided half (a consistency sanity, not an equality:
    # U-statistics over sub-populations differ by O(1/sqrt(m))).
    sub = ksd_rbf(theta[::2], grads[::2], h2=h2)
    assert abs(val - float(sub)) < 0.5 * abs(val) + 1e-3


def test_default_precision_posterior_statistics_on_chip():
    """The throughput-first opt-in (model precision='default': 1-pass
    bf16-input data matmuls — a ~6e-4 phi class, inside the production
    kernels' accepted ~2e-3 class) must still SAMPLE correctly: same
    conjugate-posterior check as the production-config test, with
    default-precision gradients + the fused_gram tail."""
    from stein_tpu import Adam, SVGDSampler, throughput_config
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(13)
    n, p, n_obs = 512, 8, 256
    X = rng.normal(size=(n_obs, p))
    w_true = rng.normal(size=(p, 1))
    y = X @ w_true + rng.normal(size=(n_obs, 1)) * 0.5

    model = LinearRegressionModel(p, precision="default")
    s = SVGDSampler(
        n_particles=n, log_p=model.log_p, param_template=model.template(),
        gd=Adam(learning_rate=5e-2), key=jax.random.PRNGKey(0),
        **throughput_config(n, p),
    )
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    s.run(batch, 1500)
    samples = s.samples

    A = X.T @ X + np.eye(p)
    cov = np.linalg.inv(A)
    mean = cov @ (X.T @ y)
    mc = np.sqrt(np.diag(cov) / n)
    err = np.abs(samples.mean(axis=0) - mean.ravel())
    print(f"[fidelity] default-precision posterior: mean max err "
          f"{err.max():.2e} (MC scale {mc.max():.2e})")
    assert err.max() < 6 * mc.max(), (err.max(), mc.max())
    ratio = samples.var(axis=0) / np.diag(cov)
    assert np.all(ratio > 0.5) and np.all(ratio < 1.6), ratio


def test_fused_glm_posterior_statistics_on_chip():
    """The fully-fused GLM step (step_impl='fused_glm': gradients from
    the quadratic form inside the kernel — the whole SVGD step is one
    kernel) must sample the conjugate posterior correctly on the real
    chip."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(17)
    n, p, n_obs = 512, 8, 256
    X = rng.normal(size=(n_obs, p))
    w_true = rng.normal(size=(p, 1))
    y = X @ w_true + rng.normal(size=(n_obs, 1)) * 0.5

    model = LinearRegressionModel(p)
    batch = model.sufficient_batch(
        {"X": jnp.asarray(X, jnp.float32),
         "y": jnp.asarray(y, jnp.float32)}
    )
    s = SVGDSampler(
        n_particles=n, log_p=model.log_p, param_template=model.template(),
        gd=Adam(learning_rate=5e-2), key=jax.random.PRNGKey(0),
        median="bisect", warm_median=True, step_impl="fused_glm",
        quadratic_form=model.quadratic_form, median_impl="fused",
    )
    s.run(batch, 1500)
    samples = s.samples

    A = X.T @ X + np.eye(p)
    cov = np.linalg.inv(A)
    mean = cov @ (X.T @ y)
    mc = np.sqrt(np.diag(cov) / n)
    err = np.abs(samples.mean(axis=0) - mean.ravel())
    print(f"[fidelity] fused_glm posterior: mean max err {err.max():.2e} "
          f"(MC scale {mc.max():.2e})")
    assert err.max() < 6 * mc.max(), (err.max(), mc.max())
    ratio = samples.var(axis=0) / np.diag(cov)
    assert np.all(ratio > 0.5) and np.all(ratio < 1.6), ratio


def test_off_origin_robustness_on_chip():
    """Off-origin clouds (||mean|| >> spread) — the r3 latent-bug probe:
    the in-kernel bf16-class Gram's error scales with ||theta||^2, so
    the UNCENTERED Pallas paths degraded to 33% phi error at
    ||mean||/spread ~ 280 and NaN at ~2800 (benchmarks/
    centering_probe.py). All Pallas-computed-D paths now mean-center
    (exact algebra: D and phi are translation-invariant); this pins the
    fix at every shift."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.ops.pallas_svgd import pallas_svgd_phi
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(21)
    n, p = 1024, 128
    spread = 0.05
    base = rng.normal(size=(n, p)) * spread
    grads = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)

    for shift in (10.0, 100.0):
        t64 = np.asarray(
            jnp.asarray(base + shift / np.sqrt(p), jnp.float32),
            np.float64,
        )
        D64 = (np.sum(t64 * t64, 1)[:, None]
               + np.sum(t64 * t64, 1)[None, :] - 2.0 * t64 @ t64.T)
        h2 = np.median(D64) / np.log(n)
        K64 = np.exp(-D64 / h2 / 2.0)
        g64 = np.asarray(grads, np.float64)
        phi64 = (K64 @ g64
                 + (K64.sum(1)[:, None] * t64 - K64 @ t64) / h2) / n
        scale = np.abs(phi64).max()

        got = np.asarray(pallas_svgd_phi(
            jnp.asarray(t64, jnp.float32), grads, jnp.float32(h2),
            block_i=512, block_j=512,
        ))
        rel = np.abs(got - phi64).max() / scale
        print(f"[fidelity] off-origin tile shift={shift}: rel {rel:.2e}")
        assert np.isfinite(rel) and rel < 5e-3, (shift, rel)

    # The fused_gram sampler end-to-end at shift 100: finite, tracks the
    # XLA warm path to the class tolerance over a few steps.
    X, y, theta0 = _linreg_problem(seed=23, n_particles=384, n_feats=64)
    theta0 = theta0 + 100.0 / np.sqrt(64)
    kw = dict(median="bisect", warm_median=True, warm_passes=16,
              median_passes=40)
    a = _tpu_trajectory(X, y, theta0, 3, **kw)
    b = _tpu_trajectory(X, y, theta0, 3, step_impl="fused_gram", **kw)
    assert np.all(np.isfinite(b))
    frac_bad = float(np.mean(~np.isclose(b, a, rtol=3e-3, atol=3e-3)))
    print(f"[fidelity] off-origin fused_gram flip fraction {frac_bad:.5f}")
    assert frac_bad < 0.01, frac_bad


def test_fused_model_logreg_posterior_statistics_on_chip():
    """The fully-fused logistic step (step_impl='fused_model': sigmoid-
    likelihood gradients inside the kernel — the reference's Covertype
    model as ONE kernel per step) must converge to the same posterior
    as the all-XLA f32 path on the real chip. No closed form exists for
    the logistic posterior, so the pin is statistical: after
    convergence the two particle clouds must agree in posterior mean
    (well within the posterior spread) and in per-dimension variance."""
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LogisticRegressionModel

    rng = np.random.default_rng(23)
    n, d, n_obs = 512, 20, 128
    X = rng.normal(size=(n_obs, d))
    w_true = rng.normal(size=(d, 1))
    y = (X @ w_true + 0.5 * rng.normal(size=(n_obs, 1)) > 0).astype(
        np.float64
    )
    model = LogisticRegressionModel(d, n_train=n_obs, n_batch=n_obs)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    theta0 = jnp.asarray(rng.normal(size=(n, d + 1)) * 0.1, jnp.float32)

    def make(step_impl, **kw):
        return SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(),
            gd=Adam(learning_rate=5e-2), theta=theta0,
            median="bisect", warm_median=True, step_impl=step_impl, **kw,
        )

    a = make("xla")
    b = make("fused_model", inkernel_model=model.inkernel_model)
    aux_a = a.run(batch, 1200)
    aux_b = b.run(batch, 1200)
    sa, sb = np.asarray(a.samples), np.asarray(b.samples)
    assert np.isfinite(sb).all()
    # log_p must have improved and track the XLA path's level.
    lp_a = np.asarray(aux_a["log_p_mean"])
    lp_b = np.asarray(aux_b["log_p_mean"])
    assert lp_b[-1] > lp_b[0]
    np.testing.assert_allclose(lp_b[-1], lp_a[-1], rtol=2e-3)
    std_a = sa.std(axis=0)
    mean_diff = np.abs(sa.mean(axis=0) - sb.mean(axis=0))
    print(f"[fidelity] fused_model logreg: mean diff max "
          f"{mean_diff.max():.3e} vs posterior std min {std_a.min():.3e}")
    assert np.all(mean_diff < 0.5 * std_a), (
        mean_diff / std_a
    )
    ratio = sb.var(axis=0) / sa.var(axis=0)
    assert np.all(ratio > 0.6) and np.all(ratio < 1.7), ratio


def test_bfloat16_end_to_end_posterior_on_chip():
    """Whole-sampler bf16 on the REAL chip (particles, moments, phi all
    bfloat16 through the XLA path — model math at f32): posterior
    moments of a correlated Gaussian land inside the Monte-Carlo band.
    Same target/tolerances as the CPU twin
    (tests/test_statistical.py::test_bfloat16_end_to_end_posterior);
    on TPU the bf16 matmuls additionally run on the native MXU path.
    Requires the r4 optimizer fix (ops/optimizers._scalar_dtype):
    beta_2=0.999 rounds to exactly 1.0 in bf16, which zeroed every Adam
    step before it."""
    from stein_tpu import Adam, SVGDSampler

    mu = np.array([1.0, -2.0, 0.5])
    cov = np.array([
        [1.0, 0.7, 0.2],
        [0.7, 1.5, -0.3],
        [0.2, -0.3, 0.8],
    ])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)
    muj = jnp.asarray(mu, jnp.float32)

    def log_p(params, batch):
        d = params["x"].astype(jnp.float32) - muj
        return -0.5 * d @ prec @ d

    n = 128
    sampler = SVGDSampler(
        n_particles=n, log_p=log_p,
        param_template={"x": jnp.zeros((3,), jnp.bfloat16)},
        gd=Adam(learning_rate=5e-2), key=jax.random.PRNGKey(1),
        dtype=jnp.bfloat16,
    )
    sampler.run(batch=None, n_steps=1500)
    s = np.asarray(sampler.samples, np.float64)
    assert np.isfinite(s).all()
    mc = np.sqrt(np.diag(cov) / n)
    merr = np.abs(s.mean(axis=0) - mu).max()
    print(f"[fidelity] bf16 end-to-end: mean err {merr:.4f} "
          f"(4x MC {4 * mc.max():.4f}), diag cov "
          f"{np.diag(np.cov(s.T)).round(3)}")
    np.testing.assert_allclose(s.mean(axis=0), mu, atol=4 * mc.max())
    est = np.cov(s.T)
    np.testing.assert_allclose(est, cov, atol=0.55)
    assert np.all(np.diag(est) > 0.3)


def test_fused_shard_one_device_mesh_on_chip():
    """step_impl='fused_shard' COMPILED on the real chip (1-device mesh,
    degenerate collectives — the same kernels a pod shard runs): must
    track the single-device fused_gram step (the same numerics class:
    in-kernel centered Gram for median counts and tiles) over a scan,
    and the GLM theta-only-gather variant must track the autodiff-grads
    variant."""
    from jax.sharding import Mesh
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(31)
    n, p = 512, 32
    X = rng.normal(size=(128, p))
    y = X @ rng.normal(size=(p, 1))
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("particles",))
    common = dict(
        n_particles=n, log_p=model.log_p,
        param_template=model.template(), theta=theta0,
        median="bisect", warm_median=True, warm_passes=8,
        gd=Adam(learning_rate=1e-1),
    )
    fs = SVGDSampler(mesh=mesh, step_impl="fused_shard", **common)
    fs.run(batch, 10)
    sg = SVGDSampler(step_impl="fused_gram", median_impl="fused",
                     **common)
    sg.run(batch, 10)
    a, b = np.asarray(fs.samples), np.asarray(sg.samples)
    assert np.isfinite(a).all()
    # Same class, different tile/center fp order: close, not bitwise.
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4)

    suff = model.sufficient_batch(batch)
    glm = SVGDSampler(mesh=mesh, step_impl="fused_shard",
                      quadratic_form=model.quadratic_form, **common)
    glm.run(suff, 10)
    auto = SVGDSampler(mesh=mesh, step_impl="fused_shard", **common)
    auto.run(suff, 10)
    np.testing.assert_allclose(
        np.asarray(glm.samples), np.asarray(auto.samples),
        rtol=2e-2, atol=1e-4,
    )


def test_pallas_grads_match_autodiff_on_chip():
    """The hand-derived NN gradient kernel COMPILED on the real chip
    (custom_grads hook): pure VPU elementwise math, so it matches
    vmap-autodiff to f32 reassociation — no bf16-class dot anywhere in
    it (measured 4.3e-6 rel at the bench shape)."""
    from stein_tpu.models import BayesianNNModel
    from stein_tpu.utils.ravel import template_unraveler

    rng = np.random.default_rng(7)
    n, B, f, H = 1000, 20, 1, 100
    model = BayesianNNModel(f, H, n_train=B, n_batch=B, prior_beta=10.0)
    n_params, unravel = template_unraveler(model.template())
    theta = jnp.asarray(rng.normal(size=(n, n_params)) * 0.3,
                        jnp.float32)
    X = rng.uniform(size=(B, f)).astype(np.float32)
    y = np.cos(10 * X) * (5 * X) + rng.normal(size=(B, 1)) * 0.1
    batch = {"X": jnp.asarray(X), "y": jnp.asarray(y, jnp.float32)}
    ga = jax.vmap(
        jax.value_and_grad(lambda row, b: model.log_p(unravel(row), b)),
        in_axes=(0, None),
    )
    lp_ref, g_ref = jax.jit(ga)(theta, batch)
    lp, g = jax.jit(model.pallas_grads())(theta, batch)
    g, g_ref = np.asarray(g), np.asarray(g_ref)
    rel = np.abs(g - g_ref).max() / np.abs(g_ref).max()
    print(f"[fidelity] pallas_grads on-chip max rel {rel:.3e}")
    assert rel < 1e-4, rel
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_shard_grid_and_ring_on_chip():
    """The r5 collective layouts COMPILED on the real chip (1-device
    mesh): median_collectives='grid' (the O(1)-collective warm search —
    the bracket kernel's in-kernel grid counts run as real Mosaic) and
    comm='ring' (ppermute packet circulation) must track the rounds
    arm. The grid/rounds searches land in the same bin at this shape
    (benchmarks/mesh_grid_probe.py pinned the medians bitwise-equal),
    so the trajectories separate only through count-fp order."""
    from jax.sharding import Mesh
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(17)
    n, p = 512, 32
    X = rng.normal(size=(128, p))
    y = X @ rng.normal(size=(p, 1))
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("particles",))
    common = dict(
        n_particles=n, log_p=model.log_p,
        param_template=model.template(), theta=theta0,
        median="bisect", warm_median=True, warm_passes=8,
        gd=Adam(learning_rate=1e-1), mesh=mesh,
        step_impl="fused_shard",
    )
    rounds = SVGDSampler(median_collectives="rounds", **common)
    rounds.run(batch, 10)
    ref = np.asarray(rounds.samples)
    assert np.isfinite(ref).all()
    grid = SVGDSampler(median_collectives="grid", median_grid_g1=8,
                       **common)
    grid.run(batch, 10)
    np.testing.assert_allclose(np.asarray(grid.samples), ref,
                               rtol=1e-3, atol=1e-6)
    ring = SVGDSampler(median_collectives="grid", median_grid_g1=8,
                       comm="ring", **common)
    ring.run(batch, 10)
    np.testing.assert_allclose(np.asarray(ring.samples), ref,
                               rtol=1e-3, atol=1e-6)


def test_mesh_custom_grads_on_chip():
    """Mesh custom_grads COMPILED on the real chip (r5): the
    hand-derived NN gradient Mosaic kernel inside the sharded step's
    per-shard gradient stage on a 1-device mesh must reproduce the
    single-device custom_grads trajectory (same kernel, same exact
    median — the shard_map lowering adds no numerics)."""
    from jax.sharding import Mesh
    from stein_tpu import Adam, SVGDSampler
    from stein_tpu.models import BayesianNNModel
    from stein_tpu.utils.ravel import template_unraveler

    rng = np.random.default_rng(23)
    n, B, f, H = 256, 20, 1, 32
    model = BayesianNNModel(f, H, n_train=B, n_batch=B, prior_beta=10.0)
    n_params, _ = template_unraveler(model.template())
    theta0 = jnp.asarray(rng.normal(size=(n, n_params)) * 0.05,
                         jnp.float32)
    X = rng.uniform(size=(B, f)).astype(np.float32)
    y = np.cos(10 * X) * (5 * X) + rng.normal(size=(B, 1)) * 0.1
    batch = {"X": jnp.asarray(X), "y": jnp.asarray(y, jnp.float32)}
    hook = model.pallas_grads()
    common = dict(
        n_particles=n, log_p=model.log_p,
        param_template=model.template(), theta=theta0,
        median="bisect", gd=Adam(learning_rate=1e-2),
        custom_grads=hook,
    )
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("particles",))
    mc = SVGDSampler(mesh=mesh, **common)
    sc = SVGDSampler(**common)
    for _ in range(5):
        mc.train_on_batch(batch)
        sc.train_on_batch(batch)
    np.testing.assert_allclose(
        np.asarray(mc.samples), np.asarray(sc.samples),
        rtol=1e-6, atol=1e-8,
    )


def test_mesh2d_tuned_config_on_chip():
    """The r5-tuned throughput_config(model_axis=) selection COMPILED
    on the real chip ((1,1)-device 2-D mesh): the streaming Pallas tile
    on the psum'd D rows must track the SAME 2-D mesh step with
    kernel_impl='xla' — identical D rows and (subsampled) median, so
    the only difference is the tile's exp2+contraction order (the
    usual f32 class)."""
    from jax.sharding import Mesh
    from stein_tpu import Adam, SVGDSampler, throughput_config
    from stein_tpu.models import LinearRegressionModel

    rng = np.random.default_rng(29)
    n, p = 512, 32
    X = rng.normal(size=(128, p))
    y = X @ rng.normal(size=(p, 1))
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    theta0 = jnp.asarray(rng.normal(size=(n, p)) * 0.1, jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("particles", "model"))
    cfg = throughput_config(n, p, mesh=mesh, model_axis="model")
    assert cfg["kernel_impl"] == "pallas"
    common = dict(
        n_particles=n, log_p=model.log_p,
        param_template=model.template(), theta=theta0,
        gd=Adam(learning_rate=1e-1),
    )
    # Adam's per-coordinate normalisation turns ULP-scale phi deltas
    # into +-lr jumps on near-zero coordinates, so an elementwise
    # bitwise-class bar is wrong across numerics classes: assert the
    # trajectory class with an atol covering that coordinate noise
    # (measured: 6/16384 elements at |diff| 2.6e-3 after 5 steps),
    # plus TIGHT posterior-moment agreement — the quantity that means
    # anything statistically.
    tuned = SVGDSampler(**common, **cfg)
    tuned.run(batch, 5)
    ref_cfg = dict(cfg, kernel_impl="xla")
    ref_cfg.pop("pallas_block")
    ref = SVGDSampler(**common, **ref_cfg)
    ref.run(batch, 5)
    a, b = np.asarray(tuned.samples), np.asarray(ref.samples)
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=5e-3)
    np.testing.assert_allclose(a.mean(axis=0), b.mean(axis=0),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(a.std(axis=0), b.std(axis=0),
                               rtol=5e-3, atol=1e-4)
