"""Analytic scaling model for particle-sharded SVGD (printed, not measured
— this workstation has one chip; multi-chip execution is validated
functionally on a fake-device mesh and via __graft_entry__.dryrun_multichip).

Per step and host, with n particles over H hosts, p params:
- compute: the kernel tiles dominate — 6 (n/H) n p flops (Gram + combined
  [K@G | K@theta] contraction), at the measured per-chip rate;
- communication: all_gather (or ring-circulate — same total volume) of the
  [n, p] particle and gradient matrices: 2 n p * 4 bytes in, of which the
  host's own block (2 n p / H) is local, i.e. 8 n p (1 - 1/H) bytes over
  ICI per step; plus O(bins) for the psum'd median histogram and O(1) for
  the clip norm (negligible).

Efficiency(H) = t_compute(H) / (t_compute(H) + t_comm(H)) assuming no
overlap (pessimistic: the ring layout overlaps block transfer with tile
compute).

Run: python benchmarks/scaling_model.py [--n 10240] [--p 128]
"""

import argparse

# Measured on one TPU v5-lite chip: the f32-faithful Pallas phi tile at
# n=10240/p=128 runs 0.447 ms = 6*n^2*p / 0.447ms ~= 180 TF/s-equivalent
# (benchmarks/pallas_variants.py, round 2 — supersedes the round-1
# 145 TF/s figure, which was measured at default (bf16-input) precision).
MEASURED_TFLOPS = 180.0
# Public per-link ICI figure for v5e-class chips, one direction.
ICI_BYTES_PER_S = 4.5e10


def efficiency(n, p, hosts, tflops=MEASURED_TFLOPS, ici=ICI_BYTES_PER_S):
    """all_gather layout, no compute/comm overlap (pessimistic bound)."""
    flops = 6.0 * (n / hosts) * n * p
    t_compute = flops / (tflops * 1e12)
    comm_bytes = 8.0 * n * p * (1.0 - 1.0 / hosts)
    t_comm = comm_bytes / ici
    return t_compute / (t_compute + t_comm), t_compute, t_comm


def ring_efficiency(n, p, hosts, tflops=MEASURED_TFLOPS,
                    ici=ICI_BYTES_PER_S):
    """comm='ring' layout: per ring step the next [n/H, 2p] block transfers
    over ICI while the current tile (6 (n/H)^2 p flops) computes; the step
    takes max(tile, transfer) per hop, H hops."""
    t_tile = 6.0 * (n / hosts) ** 2 * p / (tflops * 1e12)
    t_block = 8.0 * (n / hosts) * p / ici
    t_step = hosts * max(t_tile, t_block)
    t_ideal = hosts * t_tile          # = single-chip time / H
    return t_ideal / t_step, t_tile, t_block


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10240)
    ap.add_argument("--p", type=int, default=128)
    args = ap.parse_args()
    n, p = args.n, args.p
    print(f"n={n} p={p} (kernel path; measured {MEASURED_TFLOPS} TF/s, "
          f"ICI {ICI_BYTES_PER_S/1e9:.0f} GB/s)")
    print(f"{'H':>4} | {'all_gather (no overlap)':^28} | "
          f"{'ring (overlapped)':^24}")
    for hosts in [1, 2, 4, 8, 16, 32]:
        eff, tc, tm = efficiency(n, p, hosts)
        reff, tt, tb = ring_efficiency(n, p, hosts)
        print(f"{hosts:4d} | compute {tc*1e3:6.3f}ms comm {tm*1e3:6.3f}ms "
              f"eff {eff*100:5.1f}% | tile {tt*1e3:6.3f}ms "
              f"eff {reff*100:5.1f}%")
    print(
        "The ring stays >=80% efficient while a tile outweighs a block "
        "transfer: (n/H) >= 8*tflops*1e12 / (6*ici) "
        f"~= {8*MEASURED_TFLOPS*1e12/(6*ICI_BYTES_PER_S):,.0f} particles "
        "per host — the regime the >=80% multi-host target (BASELINE.md) "
        "addresses. Below that, comm-bound; above, compute-bound and "
        "near-linear."
    )


if __name__ == "__main__":
    main()
