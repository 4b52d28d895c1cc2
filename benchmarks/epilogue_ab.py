"""Same-session A/B: the large-n production step with the XLA
clip+optimizer tail vs step_impl='epilogue' (one gridded Pallas kernel,
ops/pallas_step.fused_epilogue).

Alternating measurements of the two compiled programs within one
process — the only comparison the tunnel's session-to-session drift
(up to 35%, RESULTS.md r3) makes trustworthy.

Usage: python benchmarks/epilogue_ab.py [n] [p] [rounds]
"""

import json
import sys

sys.path.insert(0, ".")

from stein_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import make_data, make_sampler, slope_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    X, y, theta0 = make_data(n, seed=1)
    common = dict(
        kernel_impl="pallas", median="bisect", median_passes=16,
        warm_median=True, warm_passes=8, pallas_block=1024,
        median_max_rows=128, median_impl="fused",
    )
    a, batch = make_sampler(X, y, theta0, **common)
    b, _ = make_sampler(X, y, theta0, step_impl="epilogue", **common)

    ts_a, ts_b = [], []
    for _ in range(rounds):
        ts_a.append(slope_time(a, batch, K=100, R=6, reps=3))
        ts_b.append(slope_time(b, batch, K=100, R=6, reps=3))
    med_a = sorted(ts_a)[len(ts_a) // 2]
    med_b = sorted(ts_b)[len(ts_b) // 2]
    print(json.dumps({
        "bench": "epilogue_ab", "n": n, "p": 128,
        "xla_tail_us": [round(t * 1e6, 1) for t in ts_a],
        "epilogue_us": [round(t * 1e6, 1) for t in ts_b],
        "xla_tail_median_us": round(med_a * 1e6, 1),
        "epilogue_median_us": round(med_b * 1e6, 1),
        "speedup": round(med_a / med_b, 3),
        "epilogue_updates_per_s_M": round(n / med_b / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
