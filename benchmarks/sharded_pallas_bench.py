"""Real-TPU check + benchmark of kernel_impl='pallas' under shard_map.

The CPU tests validate the sharded Pallas tile in interpret mode; this
script exercises the Mosaic-COMPILED kernel inside shard_map on the real
chip (a 1-device mesh — the only hardware here), asserting the sharded
step tracks the single-chip Pallas step and measuring the shard_map
overhead at the n=10240 BASELINE config.

Prints JSON lines (one per measurement). Timing uses bench.py's
two-length slope method (the tunneled device's block_until_ready is
unreliable; see .tpu memory notes).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from bench import make_data, N_PARAMS
from stein_tpu import SVGDSampler, Adam
from stein_tpu.models import LinearRegressionModel
from stein_tpu.parallel import particle_mesh


def make_sampler(X, y, theta0, **kwargs):
    model = LinearRegressionModel(N_PARAMS)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    sampler = SVGDSampler(
        n_particles=theta0.shape[0], log_p=model.log_p,
        param_template=model.template(),
        gd=Adam(learning_rate=1e-1),
        theta=jnp.asarray(theta0, jnp.float32),
        **kwargs,
    )
    return sampler, batch


def slope_time(sampler, batch, K, R, reps):
    sampler.run(batch, K)
    np.asarray(sampler.state.particles)

    def timed(n_dispatches):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_dispatches):
                sampler.run(batch, K)
            np.asarray(sampler.state.particles)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tR = timed(R)
    return max(tR - t1, 1e-9) / ((R - 1) * K)


def main():
    n = 10240
    X, y, theta0 = make_data(n, seed=1)
    opts = dict(kernel_impl="pallas", median="bisect", median_passes=16,
                pallas_block=1024, median_max_rows=128)

    single, batch = make_sampler(X, y, theta0, **opts)
    mesh = particle_mesh(jax.devices()[:1])
    sharded, _ = make_sampler(X, y, theta0, mesh=mesh, **opts)

    # Correctness: 3 compiled steps, sharded vs single-chip Pallas.
    for _ in range(3):
        single.train_on_batch(batch)
        sharded.train_on_batch(batch)
    err = float(
        np.max(np.abs(sharded.samples - single.samples))
        / max(np.max(np.abs(single.samples)), 1e-30)
    )
    print(json.dumps({"bench": "sharded_pallas_correctness",
                      "n": n, "max_rel_err_vs_single": err}))
    assert err < 2e-4, err

    t_single = slope_time(single, batch, K=200, R=6, reps=4)
    t_sharded = slope_time(sharded, batch, K=200, R=6, reps=4)
    print(json.dumps({
        "bench": "sharded_pallas_step", "n": n,
        "single_ms": round(t_single * 1e3, 4),
        "sharded_1dev_ms": round(t_sharded * 1e3, 4),
        "shard_map_overhead_pct": round(
            100 * (t_sharded - t_single) / t_single, 2),
    }))

    # Warm median on the mesh (the full production large-n mesh config:
    # Pallas tile + scan-carried psum'd warm bracket).
    warm_single, _ = make_sampler(X, y, theta0, warm_median=True,
                                  warm_passes=8, **opts)
    warm_sharded, _ = make_sampler(
        X, y, theta0, mesh=particle_mesh(jax.devices()[:1]),
        warm_median=True, warm_passes=8, **opts)
    warm_single.run(batch, 3)
    warm_sharded.run(batch, 3)
    werr = float(
        np.max(np.abs(warm_sharded.samples - warm_single.samples))
        / max(np.max(np.abs(warm_single.samples)), 1e-30)
    )
    print(json.dumps({"bench": "sharded_warm_correctness", "n": n,
                      "max_rel_err_vs_single_warm": werr}))
    assert werr < 2e-4, werr
    tw_single = slope_time(warm_single, batch, K=200, R=6, reps=4)
    tw_sharded = slope_time(warm_sharded, batch, K=200, R=6, reps=4)
    print(json.dumps({
        "bench": "sharded_warm_pallas_step", "n": n,
        "single_warm_ms": round(tw_single * 1e3, 4),
        "sharded_warm_1dev_ms": round(tw_sharded * 1e3, 4),
        "warm_vs_cold_sharded_pct": round(
            100 * (tw_sharded - t_sharded) / t_sharded, 2),
    }))

    # Ring layout at production parity (r3): warm bisect median (ring-
    # assembled block) + per-rotation Pallas tiles. On a 1-device mesh
    # the ring is degenerate (one rotation, identity ppermute), so this
    # measures the compiled ring machinery's overhead vs the warm
    # all-gather path — the multi-device behaviour is the scaling
    # model's domain. NOTE (r3 review): until the dispatch fix in
    # parallel/sharded.py, comm='ring'+warm_median silently compiled
    # the all-gather body, so the first r3 run of this bench compared
    # two identical programs (its 66% "ring overhead" was slope noise
    # from the then-K=100 numerators); the ring-collective dispatch is
    # now pinned by tests/test_sharded.py::
    # test_ring_warm_lowers_to_ring_collectives.
    ring_sampler, _ = make_sampler(
        X, y, theta0, mesh=particle_mesh(jax.devices()[:1]),
        comm="ring", warm_median=True, warm_passes=8, **opts)
    ring_sampler.run(batch, 3)
    # Fresh single-chip warm reference: warm_single's state was evolved
    # by the slope timing above, so it cannot anchor this comparison.
    warm_ref, _ = make_sampler(X, y, theta0, warm_median=True,
                               warm_passes=8, **opts)
    warm_ref.run(batch, 3)
    rerr = float(
        np.max(np.abs(ring_sampler.samples - warm_ref.samples))
        / max(np.max(np.abs(warm_ref.samples)), 1e-30)
    )
    print(json.dumps({"bench": "ring_warm_correctness", "n": n,
                      "max_rel_err_vs_single_warm": rerr}))
    assert rerr < 2e-4, rerr
    tr = slope_time(ring_sampler, batch, K=200, R=6, reps=4)
    print(json.dumps({
        "bench": "ring_warm_pallas_step", "n": n,
        "ring_warm_1dev_ms": round(tr * 1e3, 4),
        "vs_allgather_warm_pct": round(
            100 * (tr - tw_sharded) / tw_sharded, 2),
    }))


if __name__ == "__main__":
    main()
