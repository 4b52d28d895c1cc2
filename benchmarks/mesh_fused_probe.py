"""Round-4 probe: where does the 1-device-MESH warm step spend its time,
and how far is it from the single-device fused_gram tail?

The r3 fused kernels (step_impl='fused*', median_impl='fused') are
single-device-only; the sharded per-device problem on a pod is small-n —
exactly the dispatch-bound regime where those kernels bought 25-60%
single-chip. This probe measures, on a 1-device mesh (degenerate
collectives — same program structure as a real pod shard, minus ICI
latency):

  A. mesh warm step, kernel_impl='xla'      (today's mesh default)
  B. mesh warm step, kernel_impl='pallas'   (today's mesh large-p pick)
  C. single-device step_impl='fused_gram'   (the r3 headline — target)

The A/B-to-C gap bounds what a mesh-capable fused tail can recover.
Methodology: bench.py slope_time (two-count slope, median of 3).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax                                           # noqa: E402
from jax.sharding import Mesh                        # noqa: E402

from bench import make_data, slope_time, make_sampler   # noqa: E402


def measure(tag, K=2000, R=8, reps=3, measures=3, **kw):
    X, y, theta0 = make_data(1000)
    ts = []
    for _ in range(measures):
        sampler, batch = make_sampler(X, y, theta0, **kw)
        ts.append(slope_time(sampler, batch, K=K, R=R, reps=reps))
    t = sorted(ts)[len(ts) // 2]
    print(f"{tag:34s} {t * 1e6:8.2f} us/step")
    return t


def measure_fused_shard(tag, mesh, epilogue, K=2000, R=8, reps=3,
                        measures=3, **kw):
    """fused_shard step on the mesh; epilogue='xla' rebuilds the warm fn
    with the A/B switch (api exposes only the measured-best default)."""
    from stein_tpu.parallel.sharded_fused import (
        make_sharded_fused_warm_step,
    )

    X, y, theta0 = make_data(1000)
    ts = []
    for _ in range(measures):
        sampler, batch = make_sampler(
            X, y, theta0, mesh=mesh, step_impl="fused_shard", **kw)
        if epilogue != "fused":
            sampler._warm_step_fn, sampler._warm_init_med = \
                make_sharded_fused_warm_step(
                    sampler.log_p, sampler.unravel_fn, sampler.gd,
                    sampler.n_particles, sampler.state, mesh,
                    median_passes=16, warm_passes=6,
                    pallas_block=kw.get("pallas_block", 256),
                    epilogue=epilogue,
                )
        ts.append(slope_time(sampler, batch, K=K, R=R, reps=reps))
    t = sorted(ts)[len(ts) // 2]
    print(f"{tag:34s} {t * 1e6:8.2f} us/step")
    return t


def main():
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("particles",))
    common = dict(median="bisect", median_passes=16, warm_median=True,
                  warm_passes=6)
    measure("mesh1 xla warm", mesh=mesh, **common)
    measure("mesh1 pallas warm", mesh=mesh, kernel_impl="pallas",
            pallas_block=256, **common)
    measure("mesh1 ring pallas warm", mesh=mesh, kernel_impl="pallas",
            pallas_block=256, comm="ring", **common)
    measure_fused_shard("mesh1 FUSED_SHARD (fused epi)", mesh, "fused",
                        pallas_block=256, **common)
    measure_fused_shard("mesh1 FUSED_SHARD (xla epi)", mesh, "xla",
                        pallas_block=256, **common)
    measure("single fused_gram", step_impl="fused_gram",
            median_impl="fused", **common)
    measure("single xla warm", **common)


if __name__ == "__main__":
    main()
