"""Predicted multi-chip scaling from the traced collective counts.

Real multi-host hardware is not available in this environment, so the
SURVEY §2.7 scaling-efficiency story is published as a grounded MODEL:
collective counts/bytes are read from the actual traced steps
(parallel/comms.py, asserted in tests/test_comms_model.py), per-device ring
traffic follows the standard (S-1)/S cost model, compute is the measured
single-chip step time split S ways (it is gather/HBM-bound, which splits
with the edge shards), and ICI bandwidth is the v5e per-link figure. No
collective/compute overlap is assumed, so the efficiencies are LOWER
bounds — XLA overlaps the reduce-scatters with the local gathers.

Prints the table recorded in BASELINE.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Gowalla-scale shapes (BASELINE.md single-chip anchors)
N_NODES = 29858 + 40981
D = 64
ICI_GBPS = 45.0  # v5e per-link unidirectional

# measured single-chip step seconds (BENCH_DETAIL_r02.json / BASELINE.md)
STEPS = {
    # name: (t1_seconds, n_reduce_scatter + n_all_gather per step)
    # collective counts asserted in tests/test_comms_model.py:
    #   LightGCN BPR: L rs + L ag (L=3)
    #   IGCN:        (1+L) rs + (1+L) ag
    #   DOSE:        (2+2L) rs + (2+2L) ag
    "LightGCN BPR (edge-sharded)": (0.0345, 6),
    "IGCN (edge-sharded)": (0.0473, 8),
    "DOSE_aug (edge-sharded)": (0.080, 16),
    # data-parallel trainer path: gradient psum = 2(S-1)/S x table bytes
    "LightGCN BPR (data-parallel)": (0.0345, "dp"),
}


def main():
    table_bytes = N_NODES * D * 4  # one [n_pad, d] f32 operand
    print(f"operand [n,d] bytes: {table_bytes / 1e6:.1f} MB; ICI {ICI_GBPS} GB/s")
    header = f"{'step':36s}" + "".join(f"  S={s:<11d}" for s in (2, 4, 8))
    print(header)
    for name, (t1, colls) in STEPS.items():
        row = f"{name:36s}"
        for S in (2, 4, 8):
            if colls == "dp":
                # compute does NOT split (each device runs its own batch
                # shard of the SAME global batch size per device — weak
                # scaling); comm = one gradient all-reduce over the table
                comm = 2 * (S - 1) / S * table_bytes / (ICI_GBPS * 1e9)
                t = t1 + comm
                eff = t1 / t
            else:
                comm = colls * (S - 1) / S * table_bytes / (ICI_GBPS * 1e9)
                t = t1 / S + comm
                eff = (t1 / S) / t
            row += f"  {t * 1e3:5.1f}ms/{eff:4.2f}"
        print(row)


if __name__ == "__main__":
    main()
