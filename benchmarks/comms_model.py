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

Two tables (both recorded in BASELINE.md):

1. PURE sharding at N=S chips: edge-sharded (strong scaling, memory
   O((|E|+n·d)/S)) vs data-parallel (weak scaling, memory O(|E|+n·d)).
2. HYBRID (D, S) factorizations of 8 chips: the batch shards over 'data'
   (per-DATA-GROUP batch fixed -> global batch D x B) while the graph,
   table and propagation collectives stay inside each S-sized 'model'
   subgroup. Per-call costs match the traced hybrid step
   (tests/test_comms_model.py::test_hybrid_step_collectives_stay_in_edge_groups):
   n_coll edge collectives of [n_pad, d] over S-rings, plus one data-axis
   psum of the MODEL-SHARDED cotangent ([n_pad/S, d], 2(D-1)/D ring) per
   SpMM. Efficiency = (D x B / t) / (8 x B / t1): hybrid S=4 keeps the
   >=0.8 north star WITH 4-way memory scaling, where pure edge S=8 drops
   to ~0.65 and pure DP scales no memory at all.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Gowalla-scale shapes (BASELINE.md single-chip anchors)
N_NODES = 29858 + 40981
D = 64
ICI_GBPS = 45.0  # v5e per-link unidirectional
N_CHIPS = 8

# measured single-chip EDGE-MODE S=1 step seconds (BENCH_DETAIL_r04.json —
# the honest t1 for edge scaling: the S=1 tax is negative for every family
# after the round-4 bake fix, so these match the plain steps to noise)
STEPS = {
    # name: (t1_seconds, n_reduce_scatter + n_all_gather per step)
    # collective counts asserted in tests/test_comms_model.py:
    #   LightGCN BPR: L rs + L ag (L=3)
    #   IGCN:        (1+L) rs + (1+L) ag
    #   DOSE:        (2+2L) rs + (2+2L) ag (the chunked delta adds none)
    "LightGCN BPR (edge-sharded)": (0.0340, 6),
    "IGCN (edge-sharded)": (0.0456, 8),
    "DOSE_aug (edge-sharded)": (0.1184, 16),
    # data-parallel trainer path: gradient psum = 2(S-1)/S x table bytes
    "LightGCN BPR (data-parallel)": (0.0349, "dp"),
}


def _edge_comm(S, n_coll, table_bytes):
    return n_coll * (S - 1) / S * table_bytes / (ICI_GBPS * 1e9)


def _data_comm(Dx, S, n_spmm, table_bytes):
    """One [n_pad/S, d] psum over the D-sized data groups per SpMM (the
    shard_map backward's replication reduction = the DP gradient
    reduction); ring all-reduce = 2(D-1)/D x bytes."""
    return n_spmm * 2.0 * (Dx - 1) / Dx * (table_bytes / S) / (ICI_GBPS * 1e9)


def hybrid_row(t1, n_coll, Dx, S, table_bytes):
    """-> (step_seconds, 8-chip efficiency) for the (D, S) factorization
    with per-data-group batch fixed (throughput = D x B / t)."""
    t = t1 / S + _edge_comm(S, n_coll, table_bytes) + _data_comm(
        Dx, S, n_coll // 2, table_bytes
    )
    eff = (Dx / t) / (N_CHIPS / t1)
    return t, eff


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

    print()
    print(f"hybrid (D x S = {N_CHIPS} chips; per-data-group batch fixed, "
          f"memory O((|E|+n·d)/S)):")
    factorizations = [(1, 8), (2, 4), (4, 2), (8, 1)]
    header = f"{'step':36s}" + "".join(
        f"  D={dd},S={ss:<7d}" for dd, ss in factorizations
    )
    print(header)
    for name, (t1, colls) in STEPS.items():
        if colls == "dp":
            continue
        row = f"{name:36s}"
        for dd, ss in factorizations:
            if ss == 1:
                # pure DP limit: no edge collectives, one [n_pad, d]-sized
                # gradient all-reduce over data (the dp row's cost model)
                t = t1 + 2 * (dd - 1) / dd * table_bytes / (ICI_GBPS * 1e9)
                eff = (dd / t) / (N_CHIPS / t1)
            else:
                t, eff = hybrid_row(t1, colls, dd, ss, table_bytes)
            row += f"  {t * 1e3:5.1f}ms/{eff:4.2f}"
        print(row)


if __name__ == "__main__":
    main()
