"""Predicted multi-chip scaling — bytes grounded in the COMPILED programs.

Real multi-host hardware is not available in this environment, so the
SURVEY §2.7 scaling-efficiency story is published as a grounded MODEL.
Round 5 made the bytes term self-checking: instead of hand-derived
collective counts, every wire-byte figure in the hybrid table comes from
compiling the ACTUAL family step at each (D, S) factorization on an
8-virtual-device mesh and auditing the post-SPMD-partitioning HLO
(``parallel/comms.py::compiled_collective_report`` — ring cost per
instruction, classified by mesh axis), then scaling the table-shaped terms
by (n·d) and the batch-shaped terms by (B·d) to the Gowalla anchors. The
audit is asserted against the compiled text in tests/test_comms_model.py
(byte-level, per axis), so a unit mistake here fails the suite.

What the audit found (vs the round-4 analytic model): the partitioner puts
MORE on the data axis than the L traced psums — the batch-cotangent
scatters into the model-sharded table (u/p/n at the final rep AND at the
raw-embedding L2 term) are all-reduced over 'data' as table-shard-sized
pieces, i.e. the BPR data term is (L+6)x, not Lx, the shard bytes. The
round-4 table underpriced it ~3x; the numbers below (and BASELINE.md) are
regenerated from the audited bytes.

Compute term: the measured single-chip edge-mode step time split S ways
(the step is gather/HBM-bound, which splits with the edge shards). No
collective/compute overlap is assumed, so efficiencies are LOWER bounds.

Known audit caveat (DOSE): ~40% of its audited data-axis mass is six
[n_pad/S, C=8, d] all-reduces — the partitioner's lowering of the chunked
delta's TAIL gathers (graph/views.py _chunked_apply: take(x, t_idx) is
[n_out+1, C, d]), a choice that may differ at production shapes. The table
reports what the audited program does; the r5 fused losses fixed the
BPR/IGCN terms, and a DOSE fusion would have to bring the delta inside the
manual shard_map (its cross-shard gathers are why it stays auto).

Run:  python benchmarks/comms_model.py   (forces an 8-device CPU mesh; do
not run in a process that already initialized the TPU backend).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Gowalla-scale anchors (BASELINE.md / BENCH_DETAIL single-chip rows)
N_NODES = 29858 + 40981
D_BIG = 64
B_BIG = 2048
ICI_GBPS = 45.0  # v5e per-link unidirectional
N_CHIPS = 8

# measured single-chip EDGE-MODE S=1 step seconds (BENCH_DETAIL_r04.json —
# the honest t1 for edge scaling: the S=1 tax is negative for every family
# after the round-4 bake fix, so these match the plain steps to noise)
T1 = {
    "bpr": 0.0340,
    "igcn": 0.0456,
    "dose": 0.1184,
}

# tiny audit configuration: table shards and batch blocks must be
# size-separable by shape (n_pad/S >= 55 rows vs B/D <= 16 rows)
TINY = {"n_users": 240, "n_items": 200, "n_inter": 3200, "d": 16, "L": 3, "B": 16}
_ROW_SPLIT = 32  # first-dim threshold: >= -> table-shaped, < -> batch-shaped


def _require_cpu_mesh():
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    assert len(jax.devices()) >= 8, (
        "needs 8 virtual CPU devices: set "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8 before jax init"
    )


def _tiny_dataset():
    from inductive_recommendation_tpu.data.dataset import quick_synthetic_dataset

    return quick_synthetic_dataset(
        TINY["n_users"], TINY["n_items"], TINY["n_inter"], seed=0
    )


def compile_hybrid_step_text(family, nd, nm, ds=None):
    """Compile the family's hybrid (D=nd, S=nm) training step at the tiny
    audit scale on the virtual mesh -> (hlo_text, dims dict)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from inductive_recommendation_tpu import get_model
    from inductive_recommendation_tpu.data.dataset import AuxiliaryDataset
    from inductive_recommendation_tpu.data.sampling import build_sampler_state
    from inductive_recommendation_tpu.graph import build_feat_matrix
    from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
    from inductive_recommendation_tpu.parallel import (
        build_edge_sharded_spmm,
        make_edge_sharded_bpr_step,
        make_edge_sharded_dose_step,
        make_edge_sharded_igcn_step,
        make_mesh,
    )
    from inductive_recommendation_tpu.parallel.spmm import shard_operand

    d, L, B = TINY["d"], TINY["L"], TINY["B"]
    if ds is None:
        ds = _tiny_dataset()
    n = ds.n_users + ds.n_items
    optimizer = optax.adam(1e-2)
    mesh = make_mesh(n_data=nd, n_model=nm, devices=jax.devices()[: nd * nm])
    sampler = build_sampler_state(ds.train_data, ds.n_items)

    if family == "bpr":
        r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
        emat = build_edge_sharded_spmm(r, c, v, (n, n), nm)
        emb = jnp.zeros((emat.n_cols_pad, d), jnp.float32).at[:n].set(0.1)
        params = {"embedding": shard_operand(np.asarray(emb), emat, mesh)}
        opt_state = optimizer.init(params)
        step = make_edge_sharded_bpr_step(
            emat, mesh, optimizer, sampler, B, 1e-4, ds.n_users, L
        )
        with mesh:
            txt = (
                jax.jit(lambda p, o: step(p, o, 7))
                .lower(params, opt_state)
                .compile()
                .as_text()
            )
        n_pad = emat.n_cols_pad
    elif family == "igcn":
        model = get_model(
            {
                "name": "IGCN",
                "embedding_size": d,
                "n_layers": L,
                "dropout": 0.0,
                "feature_ratio": 1,
                "table_align": 1,
            },
            ds,
        )
        aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
        aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
        params0 = model.init_params(jax.random.key(3))
        frow, fcol, fval, row_sum = build_feat_matrix(
            ds.train_array, ds.n_users, ds.n_items, model.user_map, model.item_map
        )
        r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
        feat_emat = build_edge_sharded_spmm(
            frow, fcol, fval, (n, model.feat_n_cols), nm
        )
        adj_emat = build_edge_sharded_spmm(r, c, v, (n, n), nm)
        emb = jnp.zeros((feat_emat.n_cols_pad, d), jnp.float32)
        emb = emb.at[: model.feat_n_cols].set(
            params0["embedding"][: model.feat_n_cols]
        )
        params = {
            "embedding": shard_operand(np.asarray(emb), feat_emat, mesh),
            "w": jnp.array(params0["w"]),
        }
        opt_state = optimizer.init(params)
        step = make_edge_sharded_igcn_step(
            feat_emat, adj_emat, frow, row_sum, mesh, optimizer, sampler,
            aux_sampler, B, 1e-4, 0.01, ds.n_users, model.user_dim, L, 0.0,
        )
        with mesh:
            txt = (
                jax.jit(lambda p, o: step(p, o, 7, alpha=0.97))
                .lower(params, opt_state)
                .compile()
                .as_text()
            )
        n_pad = feat_emat.n_cols_pad
    elif family == "dose":
        model = get_model(
            {
                "name": "DOSE_aug",
                "embedding_size": d,
                "n_layers": L,
                "dropout": 0.0,
                "feature_ratio": 1.0,
                "aug_num": 8,
                "aug_rate": 0.5,
                "table_align": 1,
            },
            ds,
        )
        aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
        aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
        step, prep, shard = make_edge_sharded_dose_step(
            model, mesh, optimizer, sampler, aux_sampler, B, 1e-4, 0.01, 0.05
        )
        params = shard(model.init_params(jax.random.key(5)))
        opt_state = optimizer.init(params)
        view = prep(model.edge_views["aug_adj"])
        with mesh:
            txt = (
                jax.jit(lambda p, o, vw: step(p, o, 7, vw))
                .lower(params, opt_state, view)
                .compile()
                .as_text()
            )
        n_pad = params["embedding"].shape[0]
    else:
        raise ValueError(family)
    return txt, {"n_pad": n_pad, "d": d, "B": B, "D": nd, "S": nm}


def audited_wire(family, nd, nm, ds=None):
    """Per-device ring wire bytes of the compiled (D, S) step at the tiny
    audit scale, split by how each collective's RESULT shape scales:
    table-shaped pieces (first dim >= n_pad/S/2 rows -> scale with n·d),
    batch-shaped pieces (scale with B·d), and scalars."""
    from inductive_recommendation_tpu.parallel.comms import (
        _HLO_RING,
        compiled_collective_report,
    )

    txt, dims = compile_hybrid_step_text(family, nd, nm, ds=ds)
    rep = compiled_collective_report(txt, nm)
    table = batch = scalar = 0.0
    for r in rep:
        if r.group_size <= 1:
            continue
        for shape, nbytes in r.shapes:
            wire = _HLO_RING[r.kind](r.group_size, nbytes)
            if shape and shape[0] >= _ROW_SPLIT:
                table += wire
            elif nbytes > 16:
                batch += wire
            else:
                scalar += wire
    return {"table": table, "batch": batch, "scalar": scalar, "dims": dims}


def scaled_wire_seconds(aud, n_big=N_NODES, d_big=D_BIG, b_big=B_BIG):
    """Audited tiny-scale wire bytes -> Gowalla-scale seconds on ICI."""
    dims = aud["dims"]
    table_f = (n_big * d_big) / (dims["n_pad"] * dims["d"])
    batch_f = (b_big * d_big) / (dims["B"] * dims["d"])
    wire = aud["table"] * table_f + aud["batch"] * batch_f + aud["scalar"]
    return wire / (ICI_GBPS * 1e9)


def hybrid_row(family, t1, nd, nm, ds=None):
    """-> (step_seconds, 8-chip efficiency) for the (D, S) factorization
    with per-data-group batch fixed (throughput = D x B / t)."""
    if nm == 1:
        # pure DP limit: one [n, d] gradient all-reduce over data
        table_bytes = N_NODES * D_BIG * 4
        t = t1 + 2 * (nd - 1) / nd * table_bytes / (ICI_GBPS * 1e9)
    else:
        t = t1 / nm + scaled_wire_seconds(audited_wire(family, nd, nm, ds=ds))
    eff = (nd / t) / (N_CHIPS / t1)
    return t, eff


def main():
    _require_cpu_mesh()
    ds = _tiny_dataset()
    table_bytes = N_NODES * D_BIG * 4
    print(
        f"[n,d] operand: {table_bytes / 1e6:.1f} MB; ICI {ICI_GBPS} GB/s; "
        f"bytes audited from compiled HLO at n_tiny="
        f"{TINY['n_users'] + TINY['n_items']} and scaled by n·d / B·d"
    )

    print("\npure edge sharding (D=1; audited bytes) vs data-parallel:")
    header = f"{'step':28s}" + "".join(f"  S={s:<11d}" for s in (2, 4, 8))
    print(header)
    for fam, t1 in T1.items():
        row = f"{fam + ' (edge-sharded)':28s}"
        for S in (2, 4, 8):
            t = t1 / S + scaled_wire_seconds(audited_wire(fam, 1, S, ds=ds))
            eff = (t1 / S) / t
            row += f"  {t * 1e3:5.1f}ms/{eff:4.2f}"
        print(row)
    # data-parallel trainer path (analytic: compute does not split, comm =
    # one table-gradient ring all-reduce; weak scaling)
    t1 = 0.0349
    row = f"{'bpr (data-parallel)':28s}"
    for S in (2, 4, 8):
        comm = 2 * (S - 1) / S * table_bytes / (ICI_GBPS * 1e9)
        row += f"  {(t1 + comm) * 1e3:5.1f}ms/{t1 / (t1 + comm):4.2f}"
    print(row)

    print(
        f"\nhybrid (D x S = {N_CHIPS} chips; per-data-group batch fixed, "
        f"memory O((|E|+n·d)/S); audited bytes):"
    )
    factorizations = [(1, 8), (2, 4), (4, 2), (8, 1)]
    header = f"{'step':28s}" + "".join(
        f"  D={dd},S={ss:<7d}" for dd, ss in factorizations
    )
    print(header)
    for fam, t1 in T1.items():
        row = f"{fam:28s}"
        for dd, ss in factorizations:
            t, eff = hybrid_row(fam, t1, dd, ss, ds=ds)
            row += f"  {t * 1e3:5.1f}ms/{eff:4.2f}"
        print(row)


if __name__ == "__main__":
    main()
