"""Round-5 probe: tune the 2-D (particles x model) mesh step.

throughput_config(model_axis=) returned a bare config through r4
(VERDICT r4 #4 item 5): no kernel_impl/block/median picks at all. This
probe measures the available levers on a (1, 1)-device 2-D mesh
(degenerate collectives on BOTH axes — the same program structure as a
pod shard, minus link latency):

  - kernel_impl: 'xla' (K materialised from the psum'd D rows) vs
    'pallas' (ops/pallas_svgd.pallas_svgd_both_ksum_on_D — exp2 +
    contraction streamed over the D rows, K never in HBM), block sweep;
  - warm median_collectives: 'rounds' vs 'grid' (the r5 O(1)-collective
    search — on 2-D the counts are plain XLA reads of the materialised
    D rows either way, so this isolates the dispatch/collective
    structure);
  - shapes: the bench shape (n=1000, p=128), the NN shape (p=303), and
    large-n (n=8192, p=64).

Run on the TPU machine (nothing CPU-heavy concurrent):
    python benchmarks/mesh2d_probe.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax                                           # noqa: E402
import jax.numpy as jnp                              # noqa: E402
from jax.sharding import Mesh                        # noqa: E402

from bench import N_OBS, slope_time                  # noqa: E402
from stein_tpu import SVGDSampler, Adam              # noqa: E402
from stein_tpu.models import LinearRegressionModel   # noqa: E402


def measure(tag, n, p, K=2000, R=8, reps=3, measures=3, **kw):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(N_OBS, p))
    y = X @ rng.normal(size=(p, 1)) + rng.normal(size=(N_OBS, 1)) * 0.3
    th0 = rng.normal(size=(n, p)) * 0.01
    model = LinearRegressionModel(p)
    batch = {"X": jnp.asarray(X, jnp.float32),
             "y": jnp.asarray(y, jnp.float32)}
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("particles", "model"))
    ts = []
    for _ in range(measures):
        s = SVGDSampler(
            n_particles=n, log_p=model.log_p,
            param_template=model.template(),
            gd=Adam(learning_rate=1e-1),
            theta=jnp.asarray(th0, jnp.float32),
            mesh=mesh, model_axis="model", median="bisect", **kw,
        )
        ts.append(slope_time(s, batch, K=K, R=R, reps=reps))
    t = sorted(ts)[len(ts) // 2]
    print(f"{tag:46s} {t * 1e6:9.2f} us/step", flush=True)
    return t


def main():
    # Bench shape.
    for tag, kw in (
        ("xla cold-bisect", dict()),
        ("xla warm rounds", dict(warm_median=True, warm_passes=6,
                                 median_collectives="rounds")),
        ("xla warm grid", dict(warm_median=True, warm_passes=6,
                               median_collectives="grid")),
        ("pallas blk256 warm rounds",
         dict(warm_median=True, warm_passes=6, kernel_impl="pallas",
              pallas_block=256, median_collectives="rounds")),
        ("pallas blk512 warm rounds",
         dict(warm_median=True, warm_passes=6, kernel_impl="pallas",
              pallas_block=512, median_collectives="rounds")),
    ):
        measure(f"2d n=1000 p=128 [{tag}]", 1000, 128,
                median_max_rows=256, **kw)

    # NN-class p.
    for tag, kw in (
        ("xla warm rounds", dict(kernel_impl="xla")),
        ("pallas blk256 warm rounds", dict(kernel_impl="pallas",
                                           pallas_block=256)),
        ("pallas blk512 warm rounds", dict(kernel_impl="pallas",
                                           pallas_block=512)),
    ):
        measure(f"2d n=1000 p=304 [{tag}]", 1000, 304,
                warm_median=True, warm_passes=6, median_max_rows=128,
                median_collectives="rounds", **kw)

    # Large n.
    for tag, kw in (
        ("xla warm rounds", dict(kernel_impl="xla")),
        ("pallas blk1024 warm rounds", dict(kernel_impl="pallas",
                                            pallas_block=1024)),
        ("pallas blk1024 warm grid",
         dict(kernel_impl="pallas", pallas_block=1024,
              median_collectives="grid")),
    ):
        measure(f"2d n=8192 p=64 [{tag}]", 8192, 64, K=300, R=6,
                warm_median=True, warm_passes=6, median_max_rows=128,
                **dict(dict(median_collectives="rounds"), **kw))


if __name__ == "__main__":
    main()
