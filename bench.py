"""Benchmark: SVGD particle-update throughput on the local accelerator vs
the NumPy oracle baseline (BASELINE.md: the primary metric is
particle-updates/s/chip at BOTH n=1k and n=10k; speed target >= 10x NumPy
wall-clock at n=1k).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "extra": {"n10240_updates_per_s": ..., "n10240_step_ms": ...}}

value / vs_baseline cover the n=1000 config (value = updates/s, vs_baseline
= speedup of the TPU-native jitted step over the pure-NumPy oracle, which
encodes the reference's exact per-step semantics minus its
n-session-round-trip overhead — i.e. a *favourable* version of the
reference — on identical work: p=128 Bayesian linear regression).
``extra`` carries the remaining measured BASELINE workloads: n=10240
with the Pallas streaming kernel + bisect median (config #4; the oracle
is omitted there — one O(n^2 p) host step at n=10240 takes minutes and
the n=1k ratio already anchors the comparison); config #1 as written
(50 particles, AdaGrad); the Covertype-shape logistic regression
through the one-kernel fused_model step (config #2) AND the full
reference Covertype run end-to-end (6000 iters over the 581k-row-scale
dataset, on-device minibatch sampling — covertype_e2e_*); the Bayesian
NN regression at n=1000 through the gradient kernel (config #3); the
n=1k fused_glm variant; and config #5's per-shard program on a
1-device mesh (mesh1_fused_shard_*, step_impl='fused_shard' with GLM
theta-only gather — real multi-host scaling is projected by
benchmarks/scaling_model.py; one chip here) plus its r5 collective
arms (mesh1_fused_shard_grid/_ring), the large-n mesh rows
(meshL_fused_shard*, n=8192/p=64), the NN shape on the mesh through
the gradient kernel (nn_mesh_fused_shard), and the tuned 2-D
(particles x model) mesh config (mesh2d).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


N_PARAMS = 128
N_OBS = 1000
NP_STEPS = 5


def make_data(n_particles, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(N_OBS, N_PARAMS))
    w = rng.normal(size=(N_PARAMS, 1))
    y = X @ w + rng.normal(size=(N_OBS, 1)) * 0.3
    theta0 = rng.normal(size=(n_particles, N_PARAMS)) * 0.01
    return X, y, theta0


def bench_numpy(X, y, theta0):
    from baselines.numpy_svgd import NumpySVGD, NumpyAdam

    def grad_log_p(theta_row, batch):
        w = theta_row.reshape(-1, 1)
        return (X.T @ (y - X @ w) - w).ravel()

    oracle = NumpySVGD(grad_log_p, theta0, NumpyAdam(learning_rate=1e-1))
    oracle.train_on_batch(None)  # warm caches
    # Best of 3 windows: host BLAS threading makes single oracle
    # readings drift several-fold between runs (observed 0.1-0.4 s/step
    # for identical work); the fastest honest window is the most
    # conservative baseline for the reported speedup.
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(NP_STEPS):
            oracle.train_on_batch(None)
        best = min(best, (time.perf_counter() - t0) / NP_STEPS)
    return best


def slope_time(sampler, batch, K=200, R=4, reps=3):
    """Per-step time of ``sampler.run(batch, K)`` by the two-count slope.

    One dispatch per K steps (lax.scan) — the TPU-native loop shape.
    On a tunneled device, block_until_ready is unreliable and a host
    fetch has a large fixed RTT, so we time (1 dispatch + fetch) vs
    (R dispatches + fetch) of the SAME compiled scan and take the
    slope — the fixed fetch cost cancels, per-dispatch overhead is part
    of honest throughput, and only one scan length compiles (remote
    compiles cost minutes here). The numerator (R-1)*K*step must
    dominate the tunnel's 30-110 ms fetch-RTT variance (see main()).
    The single timing methodology for every benchmarks/ script."""
    sampler.run(batch, K)                       # compile once
    np.asarray(sampler.state.particles)

    def timed(n_dispatches):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_dispatches):
                sampler.run(batch, K)
            np.asarray(sampler.state.particles)  # forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tR = timed(R)
    return max(tR - t1, 1e-9) / ((R - 1) * K)


def make_sampler(X, y, theta0, suff_stats=False, glm=False,
                 **sampler_kwargs):
    """The benchmark workload: p=128 Bayesian linear regression.
    ``suff_stats=True`` feeds the precomputed X^T X / X^T y batch form
    (exact algebra); ``glm=True`` additionally wires the quadratic form
    into the fully-fused GLM step (step_impl='fused_glm' — the whole
    step as ONE kernel, benchmarks/RESULTS.md r3). Both are reported as
    extras, never as the primary metric (the primary keeps per-step
    work identical to the NumPy oracle's)."""
    import jax.numpy as jnp
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LinearRegressionModel

    model = LinearRegressionModel(N_PARAMS)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    if suff_stats or glm:
        batch = model.sufficient_batch(batch)
    if glm:
        sampler_kwargs = dict(sampler_kwargs, step_impl="fused_glm",
                              quadratic_form=model.quadratic_form)
    sampler = SVGDSampler(
        n_particles=theta0.shape[0],
        log_p=model.log_p,
        param_template=model.template(),
        gd=Adam(learning_rate=1e-1),
        theta=jnp.asarray(theta0, jnp.float32),
        **sampler_kwargs,
    )
    return sampler, batch


def _slope_median(make, K, R, reps, measures):
    """Median of ``measures`` independent slope measurements: single
    slope readings from this tunnel can be 2-3x outliers in either
    direction (benchmarks/RESULTS.md variance caveat), and the driver
    records ONE bench.py run — the median de-noises what it sees.
    One retry on transient tunnel faults (remote_compile HTTP 500s
    happen; losing the whole metric to one hiccup is worse than a
    loudly-logged second attempt). ``make`` -> (sampler, batch)."""
    for attempt in (1, 2):
        try:
            sampler, batch = make()
            ts = sorted(
                slope_time(sampler, batch, K=K, R=R, reps=reps)
                for _ in range(measures)
            )
            return ts[len(ts) // 2]
        except Exception as e:  # noqa: BLE001 — tunnel faults are opaque
            if attempt == 2:
                raise
            print(f"bench: attempt 1 failed ({type(e).__name__}: "
                  f"{str(e)[:200]}); retrying once", file=sys.stderr)


def bench_jax(X, y, theta0, K=200, R=4, reps=3, measures=3,
              **sampler_kwargs):
    return _slope_median(
        lambda: make_sampler(X, y, theta0, **sampler_kwargs),
        K, R, reps, measures,
    )


def bench_logreg(K=5000, R=8, reps=3, measures=3):
    """BASELINE config #2 — the reference's flagship workload
    (hierarchical Bayesian logistic regression at Covertype shape:
    54 features, minibatch 50, examples/logistic_regression/main.py) —
    through step_impl='fused_model': the WHOLE step (sigmoid-likelihood
    gradients included) as ONE kernel
    (LogisticRegressionModel.inkernel_model; posterior-statistics
    agreement pinned on-chip by tests_tpu). n=1000 particles (>= the
    reference's 100; more MXU-efficient and a harder workload)."""
    import jax.numpy as jnp
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LogisticRegressionModel

    rng = np.random.default_rng(7)
    n, d, n_obs = 1000, 54, 50
    Xl = rng.normal(size=(n_obs, d))
    yl = (Xl @ rng.normal(size=(d, 1)) > 0).astype(np.float64)
    model = LogisticRegressionModel(d, n_train=581012, n_batch=n_obs)
    batch = {"X": jnp.asarray(Xl, jnp.float32),
             "y": jnp.asarray(yl, jnp.float32)}
    theta0 = jnp.asarray(rng.normal(size=(n, d + 1)) * 0.1, jnp.float32)

    def make():
        sampler = SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(),
            gd=Adam(learning_rate=1e-1), theta=theta0,
            median="bisect", median_passes=16, warm_median=True,
            warm_passes=6, step_impl="fused_model",
            inkernel_model=model.inkernel_model,
            median_max_rows=128,   # r4 sweep: 16.5 -> 12.2 us
        )
        return sampler, batch

    return n, _slope_median(make, K, R, reps, measures)


def bench_covertype_e2e(reps=3):
    """The FULL reference Covertype workload end-to-end (BASELINE config
    #2 as the reference runs it: 100 particles, minibatch 50, 6000 Adam
    iterations over a 581,012-row dataset —
    examples/logistic_regression/main.py:65-79): the 465k-row training
    split resident in HBM, minibatch indices drawn ON DEVICE inside the
    scan (SVGDSampler.train_minibatched), the whole 6000-iteration run
    as ONE dispatch. Synthetic data at the exact Covertype shape (the
    reference repo's covertype.mat is absent; examples/
    logistic_regression.py --data loads a real copy with identical
    semantics). Reports wall seconds for all 6000 iterations (first
    call compiles; timed calls reuse)."""
    import gc

    import jax
    import jax.numpy as jnp
    from stein_tpu import SVGDSampler, Adam
    from stein_tpu.models import LogisticRegressionModel

    # Drop earlier configs' device buffers before staging the ~100 MB
    # dataset: lingering allocations measured a 3x slowdown on this row
    # when it ran after the other configs.
    gc.collect()

    rng = np.random.default_rng(13)
    n_rows, d, n, n_batch, n_iters = 581012, 54, 100, 50, 6000
    n_train = n_rows * 4 // 5
    X = rng.normal(size=(n_train, d)).astype(np.float32)
    y = (X @ rng.normal(size=(d, 1)) > 0).astype(np.float32)
    data = {"X": jnp.asarray(X), "y": jnp.asarray(y)}
    model = LogisticRegressionModel(d, n_train=n_train, n_batch=n_batch)

    def make():
        # fused_model: the whole per-step tail + sigmoid-likelihood
        # gradients as ONE kernel, re-staged per minibatch inside the
        # scan (measured 0.417 vs 0.501 s for the XLA step — the
        # remaining ~70 us/step is the per-step dataset gather + operand
        # staging, not the SVGD math).
        return SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(),
            gd=Adam(learning_rate=1e-1), key=jax.random.PRNGKey(5),
            median="bisect", median_passes=16, warm_median=True,
            warm_passes=6, median_impl="fused",
            step_impl="fused_model", inkernel_model=model.inkernel_model,
        )

    sampler = make()
    key = jax.random.PRNGKey(7)
    sampler.train_minibatched(data, n_iters, n_batch, key)  # compile
    np.asarray(sampler.state.particles)

    # Two-count slope over whole 6000-iter dispatches (same methodology
    # as slope_time): absolute single-dispatch timing swallowed the
    # tunnel's fetch RTT, which under host load measured ~1 s —
    # bimodal 0.35/1.36 s readings for identical device work.
    def timed(n_dispatch):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_dispatch):
                sampler.train_minibatched(data, n_iters, n_batch, key)
            np.asarray(sampler.state.particles)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    t3 = timed(3)
    return n_iters, max(t3 - t1, 1e-9) / 2.0


def bench_nn(K=2000, R=6, reps=3, measures=3):
    """BASELINE config #3 — Bayesian NN regression (per-particle MLP
    weights, the reference example's exact model: 1 -> 100 -> 1 ReLU,
    p=303, minibatch 20, regression_neural_network/main.py) at n=1000
    particles through throughput_config(model=...) (p=303 exceeds the
    fused tail's VMEM gate, so the large-p branch picks the streaming
    Pallas tile + the gram-in-kernel warm median + the model's Pallas
    gradient kernel — hand-derived elementwise backward replacing the
    MXU-starved vmap-autodiff dots; RESULTS.md r4). The reference's own
    n=20 config is measured in benchmarks/nn_bench.py (7.8 us/step
    tuned)."""
    import jax
    import jax.numpy as jnp
    from stein_tpu import SVGDSampler, Adam, throughput_config
    from stein_tpu.models import BayesianNNModel

    rng = np.random.default_rng(11)
    n, n_obs, p = 1000, 20, 303
    Xn = rng.uniform(size=(n_obs, 1))
    yn = rng.normal(np.cos(10 * Xn) * (5 * Xn), 0.1)
    model = BayesianNNModel(1, 100, n_obs, n_obs, prior_beta=10.0)
    batch = {"X": jnp.asarray(Xn, jnp.float32),
             "y": jnp.asarray(yn, jnp.float32)}

    def make():
        sampler = SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(),
            gd=Adam(learning_rate=1e-1, decay=0.999),
            key=jax.random.PRNGKey(3),
            **throughput_config(n, p, model=model),
        )
        return sampler, batch

    return n, _slope_median(make, K, R, reps, measures)


def bench_adagrad50(X, y, K=8000, R=10, reps=3, measures=3):
    """BASELINE config #1 — the reference linear-regression example's
    own configuration (50 particles, AdaGrad rule,
    examples/linear_regression/main.py + BASELINE.md config list). Tiny
    n, so the step is dispatch-bound: throughput_config picks the
    one-kernel fused_glm tail (the AdaGrad rule's update is already
    Mosaic-legal — no float pow — so the fused tail traces gd.update
    directly; only Adam needs the update_kernel twin,
    ops/optimizers.py). K=8000:
    at a ~10 us step the slope numerator is ~0.7 s."""
    import jax.numpy as jnp
    from stein_tpu import Adagrad, SVGDSampler, throughput_config
    from stein_tpu.models import LinearRegressionModel

    n = 50
    rng = np.random.default_rng(3)
    theta0 = rng.normal(size=(n, N_PARAMS)) * 0.01
    model = LinearRegressionModel(N_PARAMS)
    batch = model.sufficient_batch(
        {"X": jnp.asarray(X, jnp.float32), "y": jnp.asarray(y, jnp.float32)})

    def make():
        sampler = SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(),
            gd=Adagrad(learning_rate=1e-1),
            theta=jnp.asarray(theta0, jnp.float32),
            **throughput_config(n, N_PARAMS, model=model),
        )
        return sampler, batch

    return n, _slope_median(make, K, R, reps, measures)


def main():
    # Config 1 (primary): n=1000, XLA kernel, sort-free bisect median.
    n1 = 1000
    X, y, theta0 = make_data(n1)
    t_np = bench_numpy(X, y, theta0)
    # K=2000/R=10/reps=5: the slope numerator (R-1)*K*step must dominate
    # the tunnel's 30-110 ms fetch-RTT variance; at ~50 us/step K=200
    # left a ~0.09 s numerator and the result bounced 48<->58 us across
    # runs. At the current ~25 us step K=1000 gives ~0.22 s — still
    # marginal (see RESULTS.md r3 "slope noise" lesson) — so K=2000
    # (~0.45 s numerator).
    t_jax = bench_jax(
        X, y, theta0, K=2000, R=10, reps=5,
        median="bisect",   # sort-free on-device median (sorts are the one
                           # slow TPU primitive; see ops/median.py)
        median_passes=16,  # bandwidth to ~1e-4 relative: ample for the
                           # heuristic, halves the dominant sequential cost
        warm_median=True,  # scan-carried warm bisect: bounded bandwidth
                           # error, re-verified every step
                           # (ops/median.warm_bisect_median); the
                           # sequential count kernels dominate at this n
        warm_passes=6,     # sweep (benchmarks/warm_passes_sweep.py,
                           # production-regime metric, with the
                           # three-bracket chain): max per-step median
                           # error 0.61% at 3 rounds vs 0.15% at 4 —
                           # statistically invisible for the bandwidth
                           # heuristic (the statistical suite pins
                           # posterior quality); 2 rounds reaches 2.4%
                           # — not taken
        median_impl="fused",  # whole warm search in ONE Pallas kernel on
                              # the VMEM-resident block — bitwise the same
                              # medians, 54.0 -> 46.5 us full step
                              # (benchmarks/fused_median_bench.py)
        median_max_rows=256,  # r4 rows sweep: 24.8 -> 22.7 us (the
                              # in-kernel count passes shrink; 256x1000
                              # quantile samples stay sub-1% class)
        step_impl="fused_gram",  # the ENTIRE post-gradient tail
                              # (median -> K -> contraction -> clip ->
                              # Adam) in ONE kernel, WITH D computed by
                              # the in-kernel dot (~5x the XLA HIGHEST
                              # Gram rate, no D HBM round-trip): 35.8 ->
                              # 27.0 us within one batch — D joins the
                              # large-n tile's bf16-class tolerance,
                              # posterior statistics pinned by tests_tpu
                              # (benchmarks/sym_and_gram_bench.py)
    )

    # A failure in any LATER config must not take down the primary
    # metric: each config already retries once on tunnel faults
    # (_slope_median); a second failure loses that config's keys from
    # ``extra`` — loudly on stderr — instead of the round's whole bench
    # line. (The driver records exactly ONE bench.py run per round.)
    def try_config(name, fn):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — tunnel faults are opaque
            print(f"bench: config {name!r} failed after retry "
                  f"({type(e).__name__}: {str(e)[:200]})", file=sys.stderr)
            return None

    extra = {"n1000_step_us": round(t_jax * 1e6, 2)}

    # Extra: the same n=1k workload through the fully-fused GLM step
    # (sufficient-statistics batch + in-kernel gradients — the whole
    # step is ONE kernel; exact algebra, benchmarks/RESULTS.md r3).
    t_glm = try_config("glm", lambda: bench_jax(
        X, y, theta0, K=3000, R=10, reps=5, glm=True,
        median="bisect", median_passes=16, warm_median=True,
        warm_passes=6, median_impl="fused",
        median_max_rows=128,   # r4 sweep: 15.0 -> 11.2 us
    ))
    if t_glm:
        extra["n1000_glm_updates_per_s"] = round(n1 / t_glm, 1)
        extra["n1000_glm_step_us"] = round(t_glm * 1e6, 2)

    # Extra: BASELINE config #1 as written (50 particles, AdaGrad) —
    # the reference example's own configuration.
    ada = try_config("adagrad50", lambda: bench_adagrad50(
        X, y, K=8000, R=10, reps=3, measures=3))
    if ada:
        extra["adagrad50_updates_per_s"] = round(ada[0] / ada[1], 1)
        extra["adagrad50_step_us"] = round(ada[1] * 1e6, 2)

    # Extra: BASELINE config #2 (Covertype-shape logistic regression)
    # through the one-kernel fused_model step. K=5000/R=8: ~16 us step
    # -> ~0.56 s slope numerator.
    lr = try_config("logreg", lambda: bench_logreg(
        K=5000, R=8, reps=3, measures=3))
    if lr:
        extra["logreg_fused_model_updates_per_s"] = round(lr[0] / lr[1], 1)
        extra["logreg_fused_model_step_us"] = round(lr[1] * 1e6, 2)

    # Extra: the FULL reference Covertype run end-to-end (100 particles,
    # minibatch 50, 6000 iters, 581k-row-scale dataset in HBM,
    # on-device index sampling — ONE dispatch).
    cov = try_config("covertype_e2e", lambda: bench_covertype_e2e())
    if cov:
        extra["covertype_e2e_6000iters_s"] = round(cov[1], 3)
        extra["covertype_e2e_step_us"] = round(cov[1] / cov[0] * 1e6, 2)

    # Extra: BASELINE config #3 (Bayesian NN regression, per-particle
    # MLP weights) at n=1000. K=2000/R=6: ~96 us step -> ~0.96 s
    # slope numerator.
    nn = try_config("nn", lambda: bench_nn(
        K=2000, R=6, reps=3, measures=3))
    if nn:
        extra["nn_updates_per_s"] = round(nn[0] / nn[1], 1)
        extra["nn_step_us"] = round(nn[1] * 1e6, 2)

    # Extra: BASELINE config #5's per-shard program on a 1-DEVICE mesh
    # (degenerate collectives — the same compiled structure as a pod
    # shard, minus ICI latency): step_impl='fused_shard' with the GLM
    # theta-only-gather path, as throughput_config(mesh=, model=)
    # selects. Real multi-chip scaling is projected by
    # benchmarks/scaling_model.py (one chip here).
    def bench_mesh1(**kw):
        from jax.sharding import Mesh
        import jax as _jax
        mesh = Mesh(np.asarray(_jax.devices()[:1]), ("particles",))
        from stein_tpu.models import LinearRegressionModel
        model = LinearRegressionModel(N_PARAMS)
        return bench_jax(
            X, y, theta0, K=2000, R=8, reps=3, suff_stats=True,
            mesh=mesh, step_impl="fused_shard", pallas_block=256,
            median="bisect", median_passes=16, warm_median=True,
            warm_passes=6, quadratic_form=model.quadratic_form,
            median_max_rows=256,   # r4 sweep: 33.5 -> 30.0 us
            **kw,
        )
    # Headline mesh row: median_collectives='rounds' — the measured
    # 1-device-mesh best (throughput_config's n_dev==1 pick; the grid
    # arm trades ~2.4 us of in-kernel count work for 4 fewer executed
    # all-reduces, which only pays on real multi-device meshes —
    # benchmarks/mesh_grid_probe.py r5).
    t_mesh = try_config("mesh1_fused_shard",
                        lambda: bench_mesh1(median_collectives="rounds"))
    if t_mesh:
        extra["mesh1_fused_shard_updates_per_s"] = round(n1 / t_mesh, 1)
        extra["mesh1_fused_shard_step_us"] = round(t_mesh * 1e6, 2)
    # The r5 collective-structure arms, captured per round so the
    # multi-host-oriented paths cannot silently regress: the O(1)-
    # collective grid median (4 vs 8 executed all-reduces) and the
    # ring layout (ppermute circulation, nothing gathered).
    t_grid = try_config("mesh1_fused_shard_grid", lambda: bench_mesh1(
        median_collectives="grid", median_grid_g1=8))
    if t_grid:
        extra["mesh1_fused_shard_grid_step_us"] = round(t_grid * 1e6, 2)
    t_ring = try_config("mesh1_fused_shard_ring", lambda: bench_mesh1(
        median_collectives="grid", median_grid_g1=8, comm="ring"))
    if t_ring:
        extra["mesh1_fused_shard_ring_step_us"] = round(t_ring * 1e6, 2)

    # NN-mesh row (r5, VERDICT r4 #4/#8): the Bayesian-NN shape on a
    # 1-device mesh through fused_shard + the hand-derived gradient
    # kernel (custom_grads=model.pallas_grads — the r4 single-device
    # win carried onto the mesh: 80.5 -> 67.5 us,
    # benchmarks/nn_mesh_probe.py).
    def bench_nn_mesh():
        from jax.sharding import Mesh
        import jax as _jax
        from benchmarks.nn_bench import make_problem, make_sampler
        mesh = Mesh(np.asarray(_jax.devices()[:1]), ("particles",))
        model, nn_batch = make_problem(1000)
        ts = []
        for _ in range(3):
            s = make_sampler(
                model, 1000, mesh=mesh, median="bisect",
                warm_median=True, step_impl="fused_shard",
                pallas_block=256, median_max_rows=128,
                median_collectives="rounds",
                custom_grads=model.pallas_grads(),
            )
            ts.append(slope_time(s, nn_batch, K=2000, R=6, reps=3))
        return sorted(ts)[1]
    t_nnm = try_config("nn_mesh_fused_shard", bench_nn_mesh)
    if t_nnm:
        extra["nn_mesh_fused_shard_step_us"] = round(t_nnm * 1e6, 2)

    # 2-D (particles x model) mesh row (r5, VERDICT r4 #5): the tuned
    # throughput_config(model_axis=) selection end-to-end on a
    # (1,1)-device 2-D mesh — Pallas tile on the psum'd D rows blk512 +
    # warm rounds median (42.95 us measured at this shape,
    # benchmarks/mesh2d_probe.py).
    def bench_mesh2d():
        from jax.sharding import Mesh
        import jax as _jax
        from stein_tpu import throughput_config
        mesh = Mesh(np.asarray(_jax.devices()[:1]).reshape(1, 1),
                    ("particles", "model"))
        cfg = throughput_config(n1, N_PARAMS, mesh=mesh,
                                model_axis="model")
        return bench_jax(X, y, theta0, K=2000, R=8, reps=3,
                         warm_passes=6, **cfg)
    t_2d = try_config("mesh2d", bench_mesh2d)
    if t_2d:
        extra["mesh2d_step_us"] = round(t_2d * 1e6, 2)

    # Large-n mesh row (r5, VERDICT r4 #8): the n=8192/p=64 fused_shard
    # shape from RESULTS.md r4 (p=64 keeps the bracket kernel inside
    # its VMEM gate at 64 global median rows), rounds + grid arms.
    def bench_mesh_large(**kw):
        from jax.sharding import Mesh
        import jax as _jax
        from benchmarks.meshL_workload import make_meshL_sampler
        mesh = Mesh(np.asarray(_jax.devices()[:1]), ("particles",))
        sampler, batch = make_meshL_sampler(mesh, n_obs=N_OBS, **kw)
        return slope_time(sampler, batch, K=400, R=6, reps=3)

    for tag, kw in (("meshL_fused_shard",
                     dict(median_collectives="rounds")),
                    ("meshL_fused_shard_grid",
                     dict(median_collectives="grid", median_grid_g1=8))):
        def run_l(kw=kw):
            ts = [bench_mesh_large(**kw) for _ in range(3)]
            return sorted(ts)[1]
        t_l = try_config(tag, run_l)
        if t_l:
            extra[f"{tag}_step_us"] = round(t_l * 1e6, 2)

    # Config 2: n=10240, Pallas streaming kernel + bisect median
    # (BASELINE.json config #4 — "blocked kernel-matrix tiles, on-device
    # median heuristic").
    n2 = 10240
    X2, y2, theta2 = make_data(n2, seed=1)
    # K=200: (R-1)*K*step ~ 0.5 s at the ~0.5 ms step (K=100's ~0.25 s
    # numerator was marginal against the RTT variance — r3 lesson).
    t_jax2 = try_config("n10240", lambda: bench_jax(
        X2, y2, theta2, K=200, R=6, reps=4,
        kernel_impl="pallas", median="bisect", median_passes=16,
        warm_median=True, warm_passes=8,
        pallas_block=1024,    # tile sweep: 1024 beats 512 by ~8% at this n
        median_max_rows=128,  # row subsample: <1% median error at
                              # n=10240 (statistically invisible for the
                              # heuristic), 4x less count-pass bandwidth
        median_impl="fused",  # 594 -> 524 us full step, bitwise-equal
                              # medians (benchmarks/fused_median_bench.py)
    ))
    if t_jax2:
        extra["n10240_updates_per_s"] = round(n2 / t_jax2, 1)
        extra["n10240_step_ms"] = round(t_jax2 * 1e3, 4)

    print(json.dumps({
        "metric": f"particle-updates/s/chip (n={n1}, p={N_PARAMS})",
        "value": round(n1 / t_jax, 1),
        "unit": "particle-updates/s",
        "vs_baseline": round(t_np / t_jax, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
