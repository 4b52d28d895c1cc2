"""step_impl='fused' (one-kernel post-gradient tail) vs the unfused warm
path at n=1000, and the warm_passes sensitivity of the fused tail (extra
rounds are in-kernel loops — nearly free — so accuracy no longer trades
against dispatches).

Usage: python benchmarks/fused_step_bench.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import make_data, make_sampler, slope_time


def main():
    n = 1000
    X, y, theta0 = make_data(n)
    timing = dict(K=1000, R=10, reps=5)
    base = dict(median="bisect", median_passes=16, warm_median=True)

    # Parity check on-chip: fused tail vs the fused-median XLA tail.
    ref, batch = make_sampler(X, y, theta0, warm_passes=6,
                              median_impl="fused", **base)
    ref_aux = ref.run(batch, 50)
    configs = [
        ("xla_tail_fusedmed_wp6", dict(warm_passes=6, median_impl="fused")),
        ("fused_tail_wp6", dict(warm_passes=6, step_impl="fused")),
        ("fused_tail_wp8", dict(warm_passes=8, step_impl="fused")),
        ("fused_tail_wp12", dict(warm_passes=12, step_impl="fused")),
    ]
    for name, kw in configs:
        s, batch = make_sampler(X, y, theta0, **base, **kw)
        aux = s.run(batch, 50)
        med_dev = float(np.max(np.abs(
            np.asarray(aux["median"]) - np.asarray(ref_aux["median"])
        ) / np.abs(np.asarray(ref_aux["median"]))))
        samp_dev = float(
            np.max(np.abs(s.samples - ref.samples))
            / max(np.max(np.abs(ref.samples)), 1e-30)
        )
        t = slope_time(s, batch, **timing)
        print(json.dumps({
            "bench": "fused_step", "n": n, "config": name,
            "step_us": round(t * 1e6, 2),
            "updates_per_s": round(n / t, 1),
            "median_rel_dev_vs_ref_50": round(med_dev, 8),
            "samples_rel_dev_vs_ref_50": round(samp_dev, 8),
        }), flush=True)


if __name__ == "__main__":
    main()
