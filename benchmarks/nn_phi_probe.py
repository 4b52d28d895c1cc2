"""Probe: can the large-n streaming Pallas kernel beat the XLA phi at
the Bayesian-NN shape (n=1000, p=303)?

Context (benchmarks/nn_breakdown.py, same chip): the NN step is 96 us =
24 grads + 70 phi + 2 tail. p=303 pushes the fused_gram tail past its
VMEM gate, so throughput_config falls back to the XLA kernel — whose
phi carries a HIGHEST [n,p] Gram plus HIGH [n,n]x[n,2p] contractions
with D round-tripping HBM. The streaming tile takes arbitrary p, runs
its dots at the fixed in-kernel ~177 TF/s bf16-class rate, and never
materialises D in HBM — it is gated to n >= 4096 in throughput_config
only because at p=128 the XLA path was faster at small n. p=303 moves
2.4x more Gram/contraction work, so the crossover may move.

A/B in ONE session (tunnel drift makes cross-session deltas garbage):
the full production NN step under the current tuned config (XLA) vs
kernel_impl='pallas' at blocks 256/512, all with the same warm fused
median settings.

Usage: python benchmarks/nn_phi_probe.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from stein_tpu import throughput_config
from benchmarks.nn_bench import make_problem, make_sampler
from bench import slope_time


def main():
    n, p = 1000, 303
    configs = [
        ("xla_tuned", throughput_config(n, p)),
    ]
    for blk in (256, 512):
        configs.append((f"pallas_blk{blk}", dict(
            median="bisect", warm_median=True, median_impl="fused",
            kernel_impl="pallas", pallas_block=blk,
        )))

    out = {}
    for label, kw in configs:
        model, batch = make_problem(n)
        s = make_sampler(model, n, **kw)
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
