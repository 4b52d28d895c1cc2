"""Round-5 probe: the O(1)-collective GRID warm median vs the r4 rounds
chain on the fused mesh step (median_collectives='grid'|'rounds',
parallel/sharded_fused.py), on a 1-device mesh (degenerate collectives:
what this measures is the DISPATCH/STRUCTURE cost — the collective
count itself is pinned structurally by tests/test_sharded.py::
test_fused_shard_grid_lowers_to_two_median_psums: 'rounds' executes 8
all-reduces per step, 'grid' 4 — and each saved collective is us-scale
latency on a real pod).

The g1 sweep: the grid's g1/g2 split moves count work between the
bracket kernel ((g1+1) edges x candidates, sequential VPU reductions)
and ONE fused XLA pass over the emitted D block (g2-1 edges), without
changing the two-psum structure or the 2**warm_passes bound. Small g1
= less in-kernel work; the XLA pass reads D once either way.

Also: the r5 comm='ring' fused_shard (median-row packets + gt blocks
circulating, nothing gathered) A/B'd against all-gather at the same
shapes, and the large-n (n=8192) mesh shape for the BENCH_r05 row.

Run on the TPU machine (nothing CPU-heavy running concurrently — the
remote-compile helper starves):  python benchmarks/mesh_grid_probe.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax                                           # noqa: E402
import jax.numpy as jnp                              # noqa: E402
from jax.sharding import Mesh                        # noqa: E402

from bench import make_data, slope_time, make_sampler   # noqa: E402


def measure(tag, n=1000, K=2000, R=8, reps=3, measures=3, **kw):
    X, y, theta0 = make_data(n, seed=1 if n > 1000 else 0)
    ts = []
    for _ in range(measures):
        sampler, batch = make_sampler(X, y, theta0, **kw)
        ts.append(slope_time(sampler, batch, K=K, R=R, reps=reps))
    t = sorted(ts)[len(ts) // 2]
    print(f"{tag:42s} {t * 1e6:9.2f} us/step", flush=True)
    return t


def pin_medians(mesh):
    """One compiled step per arm on IDENTICAL particles: grid medians
    must agree with rounds to the shared width/2**warm_passes bound
    (measured 2026-08-20: bitwise-EQUAL at this shape — both searches
    land in the same bin), and ring must agree with all-gather (the
    same global count multiset)."""
    X, y, theta0 = make_data(1000)
    meds = {}
    for tag, kw in (
        ("grid", dict(median_collectives="grid")),
        ("rounds", dict(median_collectives="rounds")),
        ("ring", dict(median_collectives="grid", comm="ring")),
    ):
        sampler, batch = make_sampler(
            X, y, theta0, mesh=mesh, step_impl="fused_shard",
            median="bisect", median_passes=16, warm_median=True,
            warm_passes=6, pallas_block=256, **kw,
        )
        aux = sampler.train_on_batch(batch)
        meds[tag] = float(aux["median"])
    rel = abs(meds["grid"] - meds["rounds"]) / meds["rounds"]
    rel_r = abs(meds["ring"] - meds["grid"]) / meds["grid"]
    print(f"median pin: grid={meds['grid']:.6g} "
          f"rounds={meds['rounds']:.6g} rel={rel:.2e} "
          f"ring_rel={rel_r:.2e}", flush=True)
    assert rel < 3e-3 and rel_r < 3e-3, meds
    assert np.isfinite(meds["grid"])


def main():
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("particles",))
    pin_medians(mesh)

    common = dict(mesh=mesh, step_impl="fused_shard", median="bisect",
                  median_passes=16, warm_median=True, warm_passes=6,
                  pallas_block=256)
    from stein_tpu.models import LinearRegressionModel
    model = LinearRegressionModel(128)
    glm = dict(common, suff_stats=True,
               quadratic_form=model.quadratic_form, median_max_rows=256)

    measure("mesh1 fused_shard GLM [rounds]",
            median_collectives="rounds", **glm)
    for g1 in (16, 8, 4, 2):
        measure(f"mesh1 fused_shard GLM [grid g1={g1}]",
                median_collectives="grid", median_grid_g1=g1, **glm)
    measure("mesh1 fused_shard GLM [ring grid]",
            median_collectives="grid", comm="ring", **glm)

    measure("mesh1 fused_shard plain [rounds]",
            median_collectives="rounds", **common)
    for g1 in (16, 4):
        measure(f"mesh1 fused_shard plain [grid g1={g1}]",
                median_collectives="grid", median_grid_g1=g1, **common)
    measure("mesh1 fused_shard plain [ring grid]",
            median_collectives="grid", comm="ring", **common)

    # Large-n mesh shape (the BENCH_r05 row): n=8192/p=64/rows=64 —
    # p=64 keeps the bracket kernel inside its VMEM gate (the RESULTS
    # r4 row's shape). K sized for >=0.4 s numerators at ~0.3 ms.
    from bench import N_OBS, slope_time as _slope
    from stein_tpu import SVGDSampler, Adam

    from benchmarks.meshL_workload import make_meshL_sampler

    def measure_large(tag, **kw):
        ts = []
        for _ in range(3):
            sampler, batch = make_meshL_sampler(mesh, n_obs=N_OBS, **kw)
            ts.append(_slope(sampler, batch, K=400, R=6, reps=3))
        t = sorted(ts)[1]
        print(f"{tag:42s} {t * 1e6:9.2f} us/step", flush=True)
        return t

    for tag, kw in (
        ("rounds", dict(median_collectives="rounds")),
        ("grid g1=16", dict(median_collectives="grid")),
        ("grid g1=8", dict(median_collectives="grid", median_grid_g1=8)),
        ("ring grid", dict(median_collectives="grid", median_grid_g1=8,
                           comm="ring")),
    ):
        measure_large(f"mesh1 fused_shard n=8192/p=64 [{tag}]", **kw)


if __name__ == "__main__":
    main()
