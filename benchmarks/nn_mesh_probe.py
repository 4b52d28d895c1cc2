"""Does the large-p tile rule extend to the MESH branch?

throughput_config's single-device branch now selects the streaming
Pallas tile at small n / large p (benchmarks/nn_phi_probe.py: 89.6 vs
96.5 us at the NN shape). The mesh branch only selects the tile at
large n; a small-n/large-p mesh config keeps the XLA rect tile. This
probe A/Bs the two on a 1-device mesh at the NN shape (n=1000, p=303,
warm median, comm='all_gather') — same session, numerators >= ~0.4 s.

Usage: python benchmarks/nn_mesh_probe.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

from stein_tpu.parallel import particle_mesh
from benchmarks.nn_bench import make_problem, make_sampler
from bench import slope_time


def main():
    n = 1000
    mesh = particle_mesh(jax.devices()[:1])
    out = {}
    # r5: the NN gradient kernel (custom_grads=model.pallas_grads) on
    # the mesh — the hook is row-local, so it replaces the per-shard
    # vmap-autodiff stage in every 1-D mesh step incl. fused_shard.
    from benchmarks.nn_bench import make_problem as _mp
    _model0, _ = _mp(n)
    hook = _model0.pallas_grads()
    # (median='bisect' + warm_median=True come from the shared call.)
    fshard = dict(step_impl="fused_shard", pallas_block=256,
                  median_max_rows=128, median_collectives="rounds")
    for label, kw in (
        ("mesh_xla", dict(kernel_impl="xla")),
        ("mesh_pallas_blk256", dict(kernel_impl="pallas",
                                    pallas_block=256)),
        ("mesh_fused_shard", dict(fshard)),
        ("mesh_fused_shard_nngrads", dict(fshard, custom_grads=hook)),
        ("mesh_pallas_nngrads", dict(kernel_impl="pallas",
                                     pallas_block=256,
                                     custom_grads=hook)),
    ):
        model, batch = make_problem(n)
        s = make_sampler(model, n, mesh=mesh, median="bisect",
                         warm_median=True, **kw)
        t = slope_time(s, batch, K=2000, R=6, reps=3)
        assert np.isfinite(np.asarray(s.samples)).all()
        print(json.dumps({"config": label, "step_us": round(t * 1e6, 2),
                          "updates_per_s": round(n / t, 1),
                          "numerator_s": round(5 * 2000 * t, 3)}),
              flush=True)
        out[label + "_us"] = round(t * 1e6, 2)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
