"""Sharded training steps.

One jit contains sampling, forward (full-graph SpMM over the row-sharded
embedding), loss, backward, and the optimizer update. Sharding is declared
with ``with_sharding_constraint``; XLA turns the sharded-table gathers into
all-to-all / all-gather collectives and the data-parallel gradient reduction
into a psum — no hand-written communication.

Every ``make_edge_sharded_*_step`` additionally supports HYBRID data x edge
parallelism: on a (D, S) mesh — ``make_mesh(n_data=D, n_model=S)`` — the
sampled batch is sharded over 'data' (:func:`_hybrid_batch_constrainer`)
while the graph layouts, the table and the per-layer reduce-scatter /
all-gather collectives stay inside each S-sized 'model' subgroup. One
global batch per step, split D ways for the per-example work; scale the
configured batch_size with D for data-parallel throughput scaling. Loss
matches the single-device step on the same global batch for ANY (D, S)
factorization (it is the same program under a different layout).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from inductive_recommendation_tpu.data.sampling import sample_bpr_batch
from inductive_recommendation_tpu.train import losses as L


def _hybrid_batch_constrainer(mesh, axis):
    """Hybrid data x edge parallelism: shard each sampled batch vector over
    the mesh's non-edge axes (the 'data' axis of a (D, S) hybrid mesh).

    The per-example work — rep-row gathers, losses, batch-side gradients —
    then splits D ways while the graph, the table and every propagation
    collective stay inside each S-sized edge group ('model'-axis subgroups);
    the SPMD partitioner inserts the one cross-group gradient all-reduce
    over 'data' that stitches the groups together. Per-device memory remains
    O((|E| + n·d)/S) — the composition BASELINE.md's scaling table needs to
    keep >=0.8 efficiency at 8 chips where pure edge sharding (S=8) falls to
    ~0.65 (the fixed O(n·d) collective volume of a strong-scaled step).

    Identity when every non-edge axis has size 1 (the pure-edge meshes), so
    single-axis programs trace exactly as before."""
    extra = tuple(a for a in mesh.axis_names if a != axis and mesh.shape[a] > 1)
    if not extra:
        return lambda x: x

    def constrain(x):
        spec = P(extra, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return constrain


def _ensure_key(rng, base_seed):
    """Steps accept either a PRNG key or an INTEGER step counter (folded
    into ``base_seed``'s key INSIDE the jit — per-step eager key
    construction costs a dispatch round trip on tunneled backends; the
    trainer surface passes plain host ints). Only a SCALAR integer is a
    counter: legacy uint32[2] PRNGKey arrays are keys and pass through."""
    rng = jnp.asarray(rng)
    if jnp.issubdtype(rng.dtype, jnp.integer) and rng.ndim == 0:
        return jax.random.fold_in(jax.random.key(base_seed), rng)
    return rng


def make_sharded_bpr_step(model, optimizer, sampler, batch_size, l2_reg, mesh):
    """-> jitted step(params, opt_state, rng) -> (params, opt_state, loss)
    with table rows sharded over 'model' and the batch over 'data'."""

    def constrain_batch(x):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))

    def step(params, opt_state, buffers, smp, rng):
        rng_s, rng_m = jax.random.split(rng)
        users, pos, neg = sample_bpr_batch(smp, rng_s, batch_size)
        users, pos = constrain_batch(users), constrain_batch(pos)
        neg = jax.lax.with_sharding_constraint(
            neg, NamedSharding(mesh, P("data", None))
        )

        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(
                p, users, pos, neg[:, 0], rng=rng_m, training=True, buffers=buffers
            )
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng):
        return jitted(params, opt_state, model.buffers, sampler, rng)

    return run


def _make_fused_bpr_loss(emat, mesh, axis, n_users, n_layers, l2_reg, batch_size):
    """The WHOLE BPR loss — L-layer propagation, batch-row extraction, ego
    L2, softplus — as ONE shard_map body with fully-manual collectives.

    Why: with the per-layer SpMM and the batch gathers auto-partitioned (the
    r4 structure), the SPMD partitioner reduces the operand cotangent over
    'data' once PER shard_map call and the batch-cotangent scatters at
    table-shard size — (L+6) [n_pad/S, d]-sized data-axis all-reduces per
    step (measured by the compiled-HLO audit, parallel/comms.py). Because
    the backward is LINEAR in the cotangents, those reductions commute to a
    single final one: one shard_map around the whole loss means autodiff's
    replication reduction over 'data' fires ONCE for the chain. Batch rows
    are extracted with a masked local gather + a batch-sized psum over the
    edge axis, so their cotangents stay batch-sized on the wire. Audited
    data-axis traffic drops (L+6)x -> 1x shard bytes (the closed form in
    tests/test_comms_model.py).

    Loss value is identical to the unfused form: (sum softplus + l2_reg *
    sum l2) / batch == bpr_loss(...) + l2_reg * l2.mean()."""
    from inductive_recommendation_tpu.parallel.spmm import _make_local_fn

    local = _make_local_fn(axis, "scatter")
    block = emat.block
    extra = tuple(a for a in mesh.axis_names if a != axis and mesh.shape[a] > 1)

    def body(fwd, bwd, x, users, pos, neg):
        acc, h = x, x
        for _ in range(n_layers):
            h = local(fwd, bwd, None, h)
            acc = acc + h
        rep = acc / (n_layers + 1)

        def take(tbl, ids):
            lid = ids - jax.lax.axis_index(axis) * block
            ok = (lid >= 0) & (lid < block)
            rows = jnp.where(
                ok[:, None], jnp.take(tbl, jnp.clip(lid, 0, block - 1), axis=0), 0.0
            )
            return jax.lax.psum(rows, axis)

        iu, ip, ineg = users, n_users + pos, n_users + neg
        u_r, p_r, n_r = take(rep, iu), take(rep, ip), take(rep, ineg)
        xu, xp, xn = take(x, iu), take(x, ip), take(x, ineg)
        l2 = (
            jnp.sum(xu**2, axis=1) + jnp.sum(xp**2, axis=1) + jnp.sum(xn**2, axis=1)
        )
        softp = jax.nn.softplus(
            jnp.sum(u_r * n_r, axis=1) - jnp.sum(u_r * p_r, axis=1)
        )
        total = jnp.sum(softp) + l2_reg * jnp.sum(l2)
        for a in extra:
            total = jax.lax.psum(total, a)
        return total / batch_size

    batch_spec = P(extra) if extra else P()
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(axis),
            P(axis),
            P(axis, None),
            batch_spec,
            batch_spec,
            batch_spec,
        ),
        out_specs=P(),
        check_vma=False,
    )


def make_edge_sharded_bpr_step(
    emat,
    mesh,
    optimizer,
    sampler,
    batch_size,
    l2_reg,
    n_users,
    n_layers,
    axis="model",
    base_seed=0,
    fused=True,
):
    """LightGCN BPR step where NEITHER the graph NOR the embedding table ever
    materializes on one device.

    The [n_nodes_pad, d] table is row-sharded over ``axis``, aligned with the
    edge-sharded layout's column blocks (parallel/spmm.py); every propagation
    layer is one reduce-scatter forward / all-gather backward, so per-device
    memory is O((|E| + n_nodes·d) / n_dev) — the capability that removes the
    reference's single-device HBM ceiling (full-graph propagation per batch,
    model.py:100-110).

    -> step(params, opt_state, rng) with params = {"embedding": sharded
    [n_cols_pad, d]}; returns (params, opt_state, loss). Loss matches the
    single-device LightGCN step on the same batch (fp reassociation aside).
    """
    from inductive_recommendation_tpu.parallel.spmm import _wrap

    spmm = _wrap(emat, mesh, axis, "scatter")
    row_sharding = NamedSharding(mesh, P(axis, None))
    cb = _hybrid_batch_constrainer(mesh, axis)

    def propagate(fwd, bwd, x):
        """LightGCN layer-mean propagation — the ONE forward definition,
        shared by the training loss and the trainer's eval rep."""
        acc, h = x, x
        for _ in range(n_layers):
            h = spmm(fwd, bwd, None, h)
            acc = acc + h
        return acc / (n_layers + 1)

    def eval_rep(params, b):
        """Main representation over the edge-sharded layout (forward-only);
        ``b`` carries edge_fwd/edge_bwd (the trainer's scoring buffers)."""
        x = jax.lax.with_sharding_constraint(params["embedding"], row_sharding)
        return propagate(b["edge_fwd"], b["edge_bwd"], x)[: emat.n_rows]

    fused_loss = (
        _make_fused_bpr_loss(emat, mesh, axis, n_users, n_layers, l2_reg, batch_size)
        if fused
        else None
    )

    def step(params, opt_state, fwd, bwd, smp, rng):
        rng_s, _ = jax.random.split(_ensure_key(rng, base_seed))
        users, pos, neg = map(cb, sample_bpr_batch(smp, rng_s, batch_size))

        if fused:

            def loss_fn(p):
                x = jax.lax.with_sharding_constraint(p["embedding"], row_sharding)
                return fused_loss(fwd, bwd, x, users, pos, neg[:, 0])

        else:

            def loss_fn(p):
                x = p["embedding"]
                x = jax.lax.with_sharding_constraint(x, row_sharding)
                rep = propagate(fwd, bwd, x)
                u_r = rep[users]
                p_r = rep[n_users + pos]
                n_r = rep[n_users + neg[:, 0]]
                # L2 on the ego embeddings (model.py:114-117)
                l2 = (
                    jnp.sum(x[users] ** 2, 1)
                    + jnp.sum(x[n_users + pos] ** 2, 1)
                    + jnp.sum(x[n_users + neg[:, 0]] ** 2, 1)
                )
                return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng):
        return jitted(params, opt_state, emat.fwd, emat.bwd, sampler, rng)

    run.eval_rep = eval_rep
    return run


def _masked_take(tbl, ids, block, axis):
    """Distributed row extraction inside a manual shard_map body: each
    shard contributes the rows it owns (masked local gather), summed with a
    BATCH-sized psum over the edge ring — so the rows' cotangents stay
    batch-sized on the wire instead of the table-shard-sized scatter
    reductions the auto-partitioned gather costs (compiled-HLO audit,
    parallel/comms.py)."""
    lid = ids - jax.lax.axis_index(axis) * block
    ok = (lid >= 0) & (lid < block)
    rows = jnp.where(
        ok[:, None], jnp.take(tbl, jnp.clip(lid, 0, block - 1), axis=0), 0.0
    )
    return jax.lax.psum(rows, axis)


def _make_fused_igcn_loss(
    feat_emat,
    adj_emat,
    mesh,
    axis,
    n_users,
    user_dim,
    n_layers,
    l2_reg,
    aux_reg,
    batch_size,
    p_drop,
):
    """The IGCN loss — inductive feat SpMM (baked annealed values, optional
    in-layout dropout), adjacency chain, batch extraction, aux BPR — as ONE
    shard_map body, for the same reason as :func:`_make_fused_bpr_loss`:
    autodiff's replication reduction over 'data' fires ONCE for the whole
    chain instead of per shard_map call + per batch-gather scatter.

    Loss value identical to the unfused form: (sum softplus_main + l2_reg *
    sum l2 + aux_reg * sum softplus_aux) / batch."""
    from inductive_recommendation_tpu.parallel.spmm import (
        _make_local_fn,
        _make_local_fn_dropout,
    )

    local_feat = (
        _make_local_fn_dropout(axis, "scatter", p_drop)
        if p_drop > 0.0
        else _make_local_fn(axis, "scatter")
    )
    local_adj = _make_local_fn(axis, "scatter")
    emb_block = feat_emat.block
    rep_block = feat_emat.n_rows_pad // feat_emat.n_shards
    extra = tuple(a for a in mesh.axis_names if a != axis and mesh.shape[a] > 1)

    def body(ffwd, fbwd, afwd, abwd, key_data, emb, w, users, pos, neg, au, ap, an):
        if p_drop > 0.0:
            x0 = local_feat(ffwd, fbwd, key_data, emb)
        else:
            x0 = local_feat(ffwd, fbwd, None, emb)
        acc, h = x0, x0
        for _ in range(n_layers):
            h = local_adj(afwd, abwd, None, h)
            acc = acc + h
        rep = acc / (n_layers + 1)
        u_r = _masked_take(rep, users, rep_block, axis)
        p_r = _masked_take(rep, n_users + pos, rep_block, axis)
        n_r = _masked_take(rep, n_users + neg, rep_block, axis)
        l2 = (
            jnp.sum(u_r**2, axis=1)
            + jnp.sum(p_r**2, axis=1)
            + jnp.sum(n_r**2, axis=1)
        )
        softp = jax.nn.softplus(
            jnp.sum(u_r * n_r, axis=1) - jnp.sum(u_r * p_r, axis=1)
        )
        # aux BPR on raw core embedding rows weighted by w (L.aux_bpr_w)
        a_u = _masked_take(emb, au, emb_block, axis)
        a_p = _masked_take(emb, user_dim + ap, emb_block, axis)
        a_n = _masked_take(emb, user_dim + an, emb_block, axis)
        aux_softp = jax.nn.softplus(
            jnp.sum(a_u * a_n * w[None, :], axis=1)
            - jnp.sum(a_u * a_p * w[None, :], axis=1)
        )
        total = (
            jnp.sum(softp)
            + l2_reg * jnp.sum(l2)
            + aux_reg * jnp.sum(aux_softp)
        )
        for a in extra:
            total = jax.lax.psum(total, a)
        return total / batch_size

    batch_spec = P(extra) if extra else P()
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(axis),
            P(axis),
            P(axis),
            P(axis),
            P(None),
            P(axis, None),
            P(None),
            batch_spec,
            batch_spec,
            batch_spec,
            batch_spec,
            batch_spec,
            batch_spec,
        ),
        out_specs=P(),
        check_vma=False,
    )


def make_edge_sharded_igcn_step(
    feat_emat,
    adj_emat,
    feat_row,
    row_sum,
    mesh,
    optimizer,
    sampler,
    aux_sampler,
    batch_size,
    l2_reg,
    aux_reg,
    n_users,
    user_dim,
    n_layers,
    dropout,
    axis="model",
    base_seed=0,
    fused=True,
):
    """IGCN training step where the feature matrix, the adjacency AND the
    core embedding table are all sharded — the flagship model with no
    single-device materialization of any O(|E|) or O(n·d) object.

    Layout contract (parallel/spmm.py): ``feat_emat`` is the [n_nodes x
    feat_n_cols] template matrix column-block-sharded over ``axis`` — its
    column blocks align with the row-sharded [n_cols_pad, d] embedding
    table, so the inductive rep layer is local gathers + one reduce-scatter;
    ``adj_emat`` is the square normalized adjacency, whose input/output
    sharding match the feat output, so propagation layers chain with no
    re-sharding (one reduce-scatter/layer fwd, one all-gather/layer bwd).

    IGCN semantics match the single-device model (models/igcn.py):

    - annealed feature weights ``row_sum^((alpha-1)/2 - 0.5)`` (reference
      model.py:4127-4134) are BAKED into a per-epoch copy of the feat
      layout's values (``bake_stacked_scale`` — cached on the float alpha,
      which changes once per epoch): the per-STEP eid+scale gather this
      replaces was the edge step's S=1 tax (+88.8% vs the plain IGCN step
      in the pre-fix r04 measurement; the single-device path had learned
      the same lesson at r2, CLAUDE.md). Alpha annealing never retraces —
      the baked copies keep the layout's shapes;
    - feature-matrix edge dropout (reference model.py:4189) is generated
      IN the layout from a counter-hash of (shard, local eid)
      (``_wrap_dropout``): both SpMM sides of a shard draw the same mask
      per edge — the consistency dropout gradients require — with no
      per-step [E_pad] scale vector anywhere;
    - aux BPR on the raw core embedding rows weighted by ``w``
      (reference trainer.py:542-549).

    -> run(params, opt_state, rng, alpha) -> (params, opt_state, loss) with
    params = {"embedding": [feat_emat.n_cols_pad, d] sharded over ``axis``,
    "w": [d]}.
    """
    from inductive_recommendation_tpu.parallel.spmm import (
        _wrap,
        _wrap_dropout,
        bake_stacked_scale,
    )

    if feat_emat.n_rows_pad != adj_emat.n_cols_pad:
        raise ValueError(
            "feat output rows and adjacency operand rows must pad identically"
        )
    feat_spmm = _wrap(feat_emat, mesh, axis, "scatter")
    adj_spmm = _wrap(adj_emat, mesh, axis, "scatter")
    p_drop = float(dropout)
    feat_spmm_drop = (
        _wrap_dropout(feat_emat, mesh, axis, "scatter", p_drop)
        if p_drop > 0.0
        else None
    )
    scale_sharding = NamedSharding(mesh, P(axis, None))
    cb = _hybrid_batch_constrainer(mesh, axis)

    def propagate(x0, afwd, abwd):
        """Adjacency layer-mean over the inductive layer-0 input — the ONE
        IGCN propagation definition, shared by the training loss and the
        trainer's eval rep (they differ only in how the annealed feat scale
        enters layer 0: baked values in the hot step, a traced scale in the
        cold eval path)."""
        acc, h = x0, x0
        for _ in range(n_layers):
            h = adj_spmm(afwd, abwd, None, h)
            acc = acc + h
        return acc / (n_layers + 1)

    def eval_rep(params, b):
        """Forward-only main rep; ``b`` carries the trainer's scoring buffers
        (edge_feat_fwd/bwd, edge_adj_fwd/bwd, edge_frow, edge_rs) plus the
        model's ``alpha`` (annealed per epoch — a buffer, so the jitted
        scoring never retraces). No feature dropout at eval."""
        expo = (b["alpha"] - 1.0) / 2.0 - 0.5
        anneal = jax.lax.with_sharding_constraint(
            jnp.power(jnp.maximum(b["edge_rs"], 1e-12)[b["edge_frow"]], expo),
            scale_sharding,
        )
        emb = jax.lax.with_sharding_constraint(params["embedding"], scale_sharding)
        x0 = feat_spmm(b["edge_feat_fwd"], b["edge_feat_bwd"], anneal, emb)
        rep = propagate(x0, b["edge_adj_fwd"], b["edge_adj_bwd"])
        return rep[: feat_emat.n_rows]

    fused_loss = (
        _make_fused_igcn_loss(
            feat_emat, adj_emat, mesh, axis, n_users, user_dim, n_layers,
            l2_reg, aux_reg, batch_size, p_drop,
        )
        if fused
        else None
    )

    def step(params, opt_state, ffwd, fbwd, afwd, abwd, smp, aux_smp, rng):
        rng_s, rng_a, rng_d = jax.random.split(_ensure_key(rng, base_seed), 3)
        users, pos, neg = map(cb, sample_bpr_batch(smp, rng_s, batch_size))
        a_users, a_pos, a_neg = map(cb, sample_bpr_batch(aux_smp, rng_a, batch_size))

        if fused:

            def loss_fn(p):
                emb = jax.lax.with_sharding_constraint(
                    p["embedding"], NamedSharding(mesh, P(axis, None))
                )
                return fused_loss(
                    ffwd, fbwd, afwd, abwd, jax.random.key_data(rng_d), emb,
                    p["w"], users, pos, neg[:, 0], a_users, a_pos, a_neg[:, 0],
                )

        else:

            def loss_fn(p):
                emb = jax.lax.with_sharding_constraint(
                    p["embedding"], NamedSharding(mesh, P(axis, None))
                )
                # annealed weights are already baked into ffwd/fbwd's values;
                # feature dropout draws in-layout from (shard, local eid)
                if p_drop > 0.0:
                    x0 = feat_spmm_drop(
                        ffwd, fbwd, jax.random.key_data(rng_d), emb
                    )
                else:
                    x0 = feat_spmm(ffwd, fbwd, None, emb)
                rep = propagate(x0, afwd, abwd)
                u_r = rep[users]
                p_r = rep[n_users + pos]
                n_r = rep[n_users + neg[:, 0]]
                # per-sample sum of squared norms on the REP embeddings,
                # exactly models/base.py::l2_sq_rows as IGCN.bpr_forward
                l2 = jnp.sum(u_r**2, 1) + jnp.sum(p_r**2, 1) + jnp.sum(n_r**2, 1)
                bpr = L.bpr_loss(u_r, p_r, n_r)
                aux_loss = L.aux_bpr_w(
                    emb, p["w"], a_users, a_pos, a_neg[:, 0], user_dim
                )
                return bpr + l2_reg * l2.mean() + aux_reg * aux_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))
    # feat-row id per LOCAL edge slot, pre-sharded like the layout: each
    # device holds only its shard's O(nnz/S) slice
    frow_np = np.asarray(feat_row, dtype=np.int32)
    frow_stacked = jax.device_put(
        frow_np[np.asarray(feat_emat.eid_map)], scale_sharding
    )
    rs_dev = jnp.asarray(row_sum, dtype=jnp.float32)

    @jax.jit
    def _bake(ffwd, fbwd, rs, frow_st, alpha):
        expo = (alpha - 1.0) / 2.0 - 0.5
        anneal = jax.lax.with_sharding_constraint(
            jnp.power(jnp.maximum(rs, 1e-12)[frow_st], expo), scale_sharding
        )
        return (
            bake_stacked_scale(ffwd, anneal, mesh, axis),
            bake_stacked_scale(fbwd, anneal, mesh, axis),
        )

    baked = {"alpha": None, "ffwd": None, "fbwd": None}

    def run(params, opt_state, rng, alpha=1.0):
        a = float(alpha)
        if baked["alpha"] != a:  # once per epoch (feat_mat_anneal)
            baked["ffwd"], baked["fbwd"] = _bake(
                feat_emat.fwd, feat_emat.bwd, rs_dev, frow_stacked,
                jnp.float32(a),
            )
            baked["alpha"] = a
        return jitted(
            params,
            opt_state,
            baked["ffwd"],
            baked["fbwd"],
            adj_emat.fwd,
            adj_emat.bwd,
            sampler,
            aux_sampler,
            rng,
        )

    run.eval_rep = eval_rep
    return run


def make_edge_sharded_dose_step(
    model,
    mesh,
    optimizer,
    sampler,
    aux_sampler,
    batch_size,
    l2_reg,
    aux_reg,
    contrastive_reg,
    axis="model",
    base_seed=0,
    feat_emat=None,
    adj_emat=None,
    contrastive="single",
    feat_coo=None,
    aug_feat=False,
):
    """DOSE-family training step (the repo's flagship contrastive models)
    with EVERY O(|E|) and O(n·d) object sharded: the feature matrix, the
    main adjacency, the contrastive VIEW graph and the core embedding table.

    Loss = BPR + l2_reg·L2 + aux_reg·auxBPR(w) + contrastive_reg·(term)
    (reference trainer.py:255-306), with view representations propagated
    over the per-epoch augmentation graph(s) (model.py:367-613). The
    ``contrastive`` mode selects the variant's term:

    - ``"single"``: InfoNCE(users_r, v, v) over ONE view — DOSE_aug/aug3/
      aug4, DOSE_drop/drop2/drop3, DOSE_aug_drop2/3's drop-view losses;
    - ``"double_same"``: two view draws over the SAME graph (fresh feat
      dropout each), InfoNCE terms summed — DOSE_aug_drop, whose reference
      quirk propagates BOTH its views over the aug graph (model.py:3140-3142);
    - ``"cross"``: InfoNCE(v1, v2, v2) between TWO views — TEST2 (SGL-style);
    - ``"mean"``: the view users' representation mean — DOSE_test's literal
      contrastive slot (model.py:3843-3855 + DOSEtestTrainer).

    TEST (whose MAIN adjacency is a static dropped graph) routes through
    this step too — the caller builds ``adj_emat`` from the dropped pair set
    (train/edge_trainer.py).

    ``aug_feat=True`` (DOSE_aug2, reference model.py:831-1117): the view
    branch's layer-0 input comes from the AUG feature matrix over
    train ∪ aug (generate_aug_feat, model.py:935-978) instead of the main
    feat matrix. The aug matrix is static-shaped, like the single-device
    path (models/dose.py): one more edge-sharded layout over the TRAIN feat
    entries (built with the model's AUG core maps) whose per-edge annealed
    weights are BAKED into per-epoch copies of the layout values
    (bake_stacked_scale), plus a fixed-budget injected-entry delta COO
    (graph/views.py device_make_feat_delta) applied outside the shard_map.
    Per-epoch regeneration (``prepare_aug_feat``, attached to ``run``)
    writes new value arrays of fixed shapes — no retrace. Feature dropout
    on the aug base hashes (shard, local eid) per step (same divergence
    class as the main branch); delta entries use the entry-hash dropout
    (delta_spmm_rect_dropout), identical to the single-device path.

    View layout: the raw train adjacency (both directions, ViewEngine's base
    edge order) is one more :class:`EdgeShardedSpMM`; a view enters the step
    as (a) the EdgeView's keep-mask x normalization ``base_scale`` re-indexed
    AND BAKED once per epoch into per-view copies of the layout's values
    (:func:`prepare_view` via ``bake_stacked_scale`` — the per-step
    eid+scale gathers this replaces were the edge DOSE step's +84.9% S=1
    tax, BENCH_DETAIL r04 pre-fix), and (b) the fixed-budget injected-pair
    delta as per-epoch CHUNKED structures applied outside the shard_map
    (O(aug_num) entries, scatter-free on both product directions —
    graph/views.py chunked_delta_spmm; XLA routes the cross-shard gathers).
    Per-epoch view regeneration therefore changes only array VALUES — the
    jitted step never retraces.

    Divergence from the single-device path (same as the IGCN step above):
    feature dropout hashes (shard index, local eid) instead of the flat
    layout's global-eid hash — identical keep/rescale algebra, different
    draws. The view branch re-draws its own dropout, as each reference
    get_*_rep call re-applies it (model.py:488-501).

    -> (run, prepare_view, shard_model_params):
       run(params, opt_state, rng, view_state, alpha=1.0)
           -> (params, opt_state, loss),
           params = {"embedding": [feat n_cols_pad, d] sharded over ``axis``,
           "w": [d]}; ``view_state`` is one prepare_view output ("cross"
           mode: a (state1, state2) tuple);
       prepare_view(EdgeView) -> view_state  (call once per epoch with
           the model's stashed ``edge_views[...]`` after ``update_aug_adj``);
       shard_model_params(single-device params) -> padded sharded params.
    """
    if contrastive not in ("single", "double_same", "cross", "mean"):
        raise ValueError(f"unknown contrastive mode {contrastive!r}")
    from inductive_recommendation_tpu.graph import build_feat_matrix
    from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
    from inductive_recommendation_tpu.graph.views import (
        chunked_delta_spmm,
        chunked_rect_delta_spmm_dropout,
        chunked_segment_structs,
        device_make_feat_delta,
        feat_delta_host,
        rect_chunk_pair,
    )
    from inductive_recommendation_tpu.parallel.spmm import (
        _wrap,
        _wrap_dropout,
        bake_stacked_scale,
        build_edge_sharded_spmm,
    )

    n_shards = mesh.shape[axis]
    ds = model.dataset
    n_users, n_items = model.n_users, model.n_items
    n_nodes = n_users + n_items
    user_dim, n_layers = model.user_dim, model.n_layers
    p_drop = float(model.dropout)

    # prebuilt feat COO/layouts (e.g. shared with the trainer's eval rep fn)
    # are accepted to avoid duplicating the O(E) host passes + device copies
    if feat_coo is not None:
        frow, fcol, fval, row_sum = feat_coo
    else:
        frow, fcol, fval, row_sum = build_feat_matrix(
            ds.train_array, n_users, n_items, model.user_map, model.item_map
        )
    if feat_emat is None:
        feat_emat = build_edge_sharded_spmm(
            frow, fcol, fval, (n_nodes, model.feat_n_cols), n_shards
        )
    if adj_emat is None:
        r, c, v = sym_normalized_adjacency(ds.train_array, n_users, n_items)
        adj_emat = build_edge_sharded_spmm(r, c, v, (n_nodes, n_nodes), n_shards)
    eng = model.view_engine
    # ViewEngine base edge order == EdgeView.base_scale's edge-id space; the
    # values are all 1.0 so no zero-entry is filtered and ids stay aligned
    view_emat = build_edge_sharded_spmm(
        eng._base_rows,
        eng._base_cols,
        np.ones(len(eng._base_rows), np.float32),
        (n_nodes, n_nodes),
        n_shards,
    )
    if feat_emat.n_rows_pad != adj_emat.n_cols_pad:
        raise ValueError("feat output rows and adjacency operand rows must pad identically")
    n_pad = adj_emat.n_rows_pad

    feat_spmm = _wrap(feat_emat, mesh, axis, "scatter")
    adj_spmm = _wrap(adj_emat, mesh, axis, "scatter")
    view_spmm = _wrap(view_emat, mesh, axis, "scatter")
    feat_spmm_drop = (
        _wrap_dropout(feat_emat, mesh, axis, "scatter", p_drop)
        if p_drop > 0.0
        else None
    )
    scale_sharding = NamedSharding(mesh, P(axis, None))
    row_sharding = NamedSharding(mesh, P(axis, None))
    cb = _hybrid_batch_constrainer(mesh, axis)

    @jax.jit
    def _prep(vfwd, vbwd, eid_map, base_scale):
        # the view's keep-mask x normalization is BAKED into per-epoch copies
        # of the view layout's values (the sharded analog of graph/views.py's
        # baking) — the per-STEP eid+scale gather it replaces was the edge
        # DOSE step's dominant S=1 tax (+84.9% pre-fix, BENCH_DETAIL r04)
        sc = jax.lax.with_sharding_constraint(base_scale[eid_map], scale_sharding)
        return (
            bake_stacked_scale(vfwd, sc, mesh, axis),
            bake_stacked_scale(vbwd, sc, mesh, axis),
        )

    @jax.jit
    def _prep_ck(d_row, d_col, d_val, dt_row, dt_col, dt_val):
        # per-epoch chunked structures (graph/views.py) over the PADDED row
        # space — the per-step delta then runs scatter-free (1.92x over the
        # segment-sum at Gowalla budgets, see chunked_segment_structs)
        return (
            chunked_segment_structs(d_row, d_col, d_val, n_pad),
            chunked_segment_structs(dt_col, dt_row, dt_val, n_pad),
        )

    def prepare_view(view):
        """EdgeView -> (baked view layout sides, chunked delta structs)
        for ``run`` (once per epoch)."""
        if has_delta:
            delta = _prep_ck(
                view.d_row, view.d_col, view.d_val,
                view.dt_row, view.dt_col, view.dt_val,
            )
        else:  # drop-only views: the step never applies a delta
            delta = (
                view.d_row, view.d_col, view.d_val,
                view.dt_row, view.dt_col, view.dt_val,
            )
        baked = _prep(
            view_emat.fwd, view_emat.bwd, view_emat.eid_map, view.base_scale
        )
        return baked, delta

    # -- DOSE_aug2: edge-sharded AUG feature matrix (see docstring) ----------
    aug_feat_spmm = aug_spmm_drop = prepare_aug_feat = None
    feat_n_cols = int(model.feat_n_cols)
    if aug_feat:
        aug_user_map, aug_item_map = model._aug_core_maps()
        arow, acol, aval, abase_rs = build_feat_matrix(
            eng.train_pairs, n_users, n_items, aug_user_map, aug_item_map
        )
        aug_emat = build_edge_sharded_spmm(
            arow, acol, aval, (n_nodes, feat_n_cols), n_shards
        )
        if aug_emat.n_cols_pad != feat_emat.n_cols_pad:
            raise ValueError("aug feat and feat operand columns must pad identically")
        aug_feat_spmm = _wrap(aug_emat, mesh, axis, "scatter")
        if p_drop > 0.0:
            aug_spmm_drop = _wrap_dropout(aug_emat, mesh, axis, "scatter", p_drop)
        # per-LOCAL-edge feat row ids, pre-sharded (each device O(nnz/S))
        arow_st = jax.device_put(
            np.asarray(arow, np.int32)[np.asarray(aug_emat.eid_map)],
            NamedSharding(mesh, P(axis, None)),
        )
        abase_rs_dev = jnp.asarray(abase_rs, jnp.float32)
        aug_budget = max(int(model.aug_num), 1)
        keys_fit_i32 = n_users * n_items + aug_budget < 2**31
        train_keys_dev = (
            eng._device_buffers()["train_keys"] if keys_fit_i32 else None
        )
        um_dev = jnp.asarray(aug_user_map, jnp.int32)
        im_dev = jnp.asarray(aug_item_map, jnp.int32)

        @jax.jit
        def _aug_bake(agfwd, agbwd, arow_st, row_sum_view, alpha):
            # annealed base weights BAKED into per-epoch copies of the aug
            # layout's values (the delta values come out of
            # device_make_feat_delta pre-annealed)
            expo = (alpha - 1.0) / 2.0 - 0.5
            w = jnp.power(jnp.maximum(row_sum_view, 1e-12), expo)
            sc = jax.lax.with_sharding_constraint(w[arow_st], scale_sharding)
            return (
                bake_stacked_scale(agfwd, sc, mesh, axis),
                bake_stacked_scale(agbwd, sc, mesh, axis),
            )

        def prepare_aug_feat(aug_pairs, alpha):
            """(selected aug pairs [k, 2] on device, current alpha) ->
            (baked aug layout sides, annealed delta COO). Once per epoch,
            right after update_aug_adj (alpha is already annealed then,
            matching the single-device bake order, models/dose.py)."""
            alpha = jnp.asarray(alpha, jnp.float32)
            if keys_fit_i32:
                row_sum_view, *delta = device_make_feat_delta(
                    train_keys_dev,
                    um_dev,
                    im_dev,
                    abase_rs_dev,
                    jnp.asarray(aug_pairs),
                    alpha,
                    budget=aug_budget,
                    n_users=n_users,
                    n_items=n_items,
                    user_dim=user_dim,
                )
            else:
                row_sum_view, *delta = feat_delta_host(
                    eng.train_keys,
                    aug_user_map,
                    aug_item_map,
                    np.asarray(abase_rs),
                    np.asarray(aug_pairs),
                    float(alpha),
                    budget=aug_budget,
                    n_users=n_users,
                    n_items=n_items,
                    user_dim=user_dim,
                )
            baked = _aug_bake(
                aug_emat.fwd, aug_emat.bwd, arow_st,
                jnp.asarray(row_sum_view), alpha,
            )
            # scatter-free chunked structures for the injected entries;
            # n_cols for the dropout keys must match the single-device hash
            # (feat_n_cols, NOT the padded width) for cross-path mask parity
            ck = _rect_ck(
                tuple(jnp.asarray(d) for d in delta),
                n_out=n_pad,
                n_in=feat_emat.n_cols_pad,
                n_cols=feat_n_cols,
            )
            return baked, ck

        _rect_ck = jax.jit(
            rect_chunk_pair, static_argnames=("n_out", "n_in", "n_cols")
        )

    has_delta = eng.delta_budget > 0

    two_view_draws = contrastive in ("double_same", "cross")

    def propagate(spmm, fwd, bwd, scale, x0, dlt):
        """Adjacency/view layer-mean propagation (A_view @ h = base @ h +
        delta @ h, both on the SAME h) — the ONE propagation definition,
        shared by the training loss (main + view branches) and the trainer's
        eval rep. ``dlt`` is a (fwd, bwd) chunked-structure pair
        (prepare_view) — the delta applies scatter-free on both sides."""
        acc, h = x0, x0
        for _ in range(n_layers):
            out = spmm(fwd, bwd, scale, h)
            if dlt is not None:
                out = out + jax.lax.with_sharding_constraint(
                    chunked_delta_spmm(dlt[0], dlt[1], h), row_sharding
                )
            h = out
            acc = acc + h
        return acc / (n_layers + 1)

    def eval_rep(params, b):
        """Forward-only MAIN rep (views don't score; models/dose.py scores
        with the main representation); same buffer contract as the IGCN
        step's eval_rep. No feature dropout at eval."""
        expo = (b["alpha"] - 1.0) / 2.0 - 0.5
        anneal = jax.lax.with_sharding_constraint(
            jnp.power(jnp.maximum(b["edge_rs"], 1e-12)[b["edge_frow"]], expo),
            scale_sharding,
        )
        emb = jax.lax.with_sharding_constraint(params["embedding"], row_sharding)
        x0 = feat_spmm(b["edge_feat_fwd"], b["edge_feat_bwd"], anneal, emb)
        rep = propagate(
            adj_spmm, b["edge_adj_fwd"], b["edge_adj_bwd"], None, x0, None
        )
        return rep[:n_nodes]

    def step(
        params,
        opt_state,
        ffwd,
        fbwd,
        afwd,
        abwd,
        vfwd,
        vbwd,
        delta,
        vfwd2,
        vbwd2,
        delta2,
        agfwd,
        agbwd,
        agdelta,
        smp,
        aux_smp,
        rng,
    ):
        # "single"/"mean" keep the historical 4-way split (test parity);
        # the two-draw modes take one extra key for the second view's dropout
        if two_view_draws:
            rng_s, rng_a, rng_d, rng_vd, rng_vd2 = jax.random.split(
                _ensure_key(rng, base_seed), 5
            )
        else:
            rng_s, rng_a, rng_d, rng_vd = jax.random.split(
                _ensure_key(rng, base_seed), 4
            )
            rng_vd2 = rng_vd
        users, pos, neg = map(cb, sample_bpr_batch(smp, rng_s, batch_size))
        a_users, a_pos, a_neg = map(cb, sample_bpr_batch(aux_smp, rng_a, batch_size))

        def feat_x0(emb, key):
            """Layer-0 inductive rep over the annealed-BAKED feat layout;
            feature dropout draws in-layout from (shard, local eid)."""
            if p_drop > 0.0:
                return feat_spmm_drop(ffwd, fbwd, jax.random.key_data(key), emb)
            return feat_spmm(ffwd, fbwd, None, emb)

        def loss_fn(p):
            emb = jax.lax.with_sharding_constraint(p["embedding"], row_sharding)
            # main branch: annealed(baked)+dropped feat -> adjacency prop
            x0 = feat_x0(emb, rng_d)
            rep = propagate(adj_spmm, afwd, abwd, None, x0, None)
            u_r = rep[users]
            p_r = rep[n_users + pos]
            n_r = rep[n_users + neg[:, 0]]
            l2 = jnp.sum(u_r**2, 1) + jnp.sum(p_r**2, 1) + jnp.sum(n_r**2, 1)
            bpr = L.bpr_loss(u_r, p_r, n_r)
            aux_loss = L.aux_bpr_w(
                emb, p["w"], a_users, a_pos, a_neg[:, 0], user_dim
            )

            # view branch(es): re-drawn feat dropout -> view-graph propagation
            # (the view's keep-mask x normalization is baked into vf/vb)
            def view_users(vf, vb, dlt, key):
                if aug_feat and agfwd is not None:
                    # DOSE_aug2: layer 0 reads the AUG feature matrix
                    # (annealed weights baked per epoch; dropout drawn here;
                    # the injected-entry delta is scatter-free chunked with
                    # the single-device entry-key hash masks)
                    if p_drop > 0.0:
                        x0v = aug_spmm_drop(
                            agfwd, agbwd, jax.random.key_data(key), emb
                        )
                        dx = chunked_rect_delta_spmm_dropout(
                            agdelta[0],
                            agdelta[1],
                            jax.random.key_data(key),
                            jnp.asarray(p_drop, jnp.float32),
                            emb,
                        )
                    else:
                        x0v = aug_feat_spmm(agfwd, agbwd, None, emb)
                        dx = chunked_delta_spmm(agdelta[0], agdelta[1], emb)
                    x0v = x0v + jax.lax.with_sharding_constraint(dx, row_sharding)
                else:
                    x0v = feat_x0(emb, key)
                vrep = propagate(
                    view_spmm, vf, vb, None, x0v, dlt if has_delta else None
                )
                return vrep[users]

            if contrastive == "single":
                v = view_users(vfwd, vbwd, delta, rng_vd)
                closs = L.info_nce(u_r, v, v).mean()
            elif contrastive == "double_same":
                v1 = view_users(vfwd, vbwd, delta, rng_vd)
                v2 = view_users(vfwd, vbwd, delta, rng_vd2)
                closs = (L.info_nce(u_r, v1, v1) + L.info_nce(u_r, v2, v2)).mean()
            elif contrastive == "cross":
                v1 = view_users(vfwd, vbwd, delta, rng_vd)
                v2 = view_users(vfwd2, vbwd2, delta2, rng_vd2)
                closs = L.info_nce(v1, v2, v2).mean()
            else:  # "mean": DOSE_test's literal contrastive slot
                closs = view_users(vfwd, vbwd, delta, rng_vd).mean()
            return (
                bpr
                + l2_reg * l2.mean()
                + aux_reg * aux_loss
                + contrastive_reg * closs
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))
    frow_stacked = jax.device_put(
        np.asarray(frow, dtype=np.int32)[np.asarray(feat_emat.eid_map)],
        scale_sharding,
    )
    rs_dev = jnp.asarray(row_sum, dtype=jnp.float32)

    @jax.jit
    def _bake_feat(ffwd, fbwd, rs, frow_st, alpha):
        expo = (alpha - 1.0) / 2.0 - 0.5
        anneal = jax.lax.with_sharding_constraint(
            jnp.power(jnp.maximum(rs, 1e-12)[frow_st], expo), scale_sharding
        )
        return (
            bake_stacked_scale(ffwd, anneal, mesh, axis),
            bake_stacked_scale(fbwd, anneal, mesh, axis),
        )

    baked_feat = {"alpha": None, "ffwd": None, "fbwd": None}

    def run(params, opt_state, rng, view_state, alpha=1.0, aug_state=None):
        # "cross" takes (state1, state2); a single state is
        # ((vfwd, vbwd), delta) — its leading element's leading element is a
        # _StackedSide, a cross state's is the (vfwd, vbwd) tuple
        if isinstance(view_state[0][0], tuple):
            ((vfwd, vbwd), delta), ((vfwd2, vbwd2), delta2) = view_state
        else:
            (vfwd, vbwd), delta = view_state
            vfwd2, vbwd2, delta2 = vfwd, vbwd, delta
        if aug_state is not None:
            (agfwd, agbwd), agdelta = aug_state
        else:
            agdelta = agfwd = agbwd = None
        a = float(alpha)
        if baked_feat["alpha"] != a:  # once per epoch (feat_mat_anneal)
            baked_feat["ffwd"], baked_feat["fbwd"] = _bake_feat(
                feat_emat.fwd, feat_emat.bwd, rs_dev, frow_stacked,
                jnp.float32(a),
            )
            baked_feat["alpha"] = a
        return jitted(
            params,
            opt_state,
            baked_feat["ffwd"],
            baked_feat["fbwd"],
            adj_emat.fwd,
            adj_emat.bwd,
            vfwd,
            vbwd,
            delta,
            vfwd2,
            vbwd2,
            delta2,
            agfwd,
            agbwd,
            agdelta,
            sampler,
            aux_sampler,
            rng,
        )

    def shard_model_params(params):
        from inductive_recommendation_tpu.parallel.spmm import shard_operand

        return {
            "embedding": shard_operand(
                jnp.asarray(params["embedding"])[: model.feat_n_cols],
                feat_emat,
                mesh,
                axis,
            ),
            # copy, not asarray: run() donates params — aliasing the
            # caller's buffer would delete it out from under them
            "w": jnp.array(params["w"]),
        }

    run.eval_rep = eval_rep
    run.prepare_aug_feat = prepare_aug_feat
    return run, prepare_view, shard_model_params


def make_edge_sharded_sgl_step(
    model,
    mesh,
    optimizer,
    sampler,
    batch_size,
    l2_reg,
    contrastive_reg,
    axis="model",
    base_seed=0,
    adj_emat=None,
    contrastive="cross",
):
    """SGL / HALF contrastive training step with the main adjacency, BOTH
    drop-view graphs and the embedding table edge-block-sharded.

    Loss = BPR + l2_reg·L2(final reps — model.py:224-225, unlike plain
    LightGCN's ego L2) + contrastive_reg·InfoNCE (reference
    trainer.py:432-487 over model.py:130-365). The ``contrastive`` mode:

    - ``"cross"`` (SGL): InfoNCE(v1, v2, v2) between the TWO drop views'
      user reps (model.py:213-228);
    - ``"single"`` (HALF): InfoNCE(main users_r, v, v) (model.py:332-349).

    The LightGCN base has no feature matrix, aux loss or edge dropout, so
    this is the DOSE step minus that machinery: the raw train adjacency
    (ViewEngine base edge order) is one :class:`EdgeShardedSpMM`, and a
    per-epoch drop view enters with its keep-mask x normalization scale
    re-indexed AND BAKED once per epoch into per-view copies of the
    layout's values (``prepare_view`` via ``bake_stacked_scale`` — no
    per-step eid+scale gathers). SGL views are drop-only
    (``delta_budget=0``), so there is no injected-pair delta path.
    Per-epoch view regeneration changes only array VALUES — the jitted
    step never retraces.

    -> (run, prepare_view):
       run(params, opt_state, rng, view_state) -> (params, opt_state, loss),
           params = {"embedding": [n_cols_pad, d] sharded over ``axis``};
           ``view_state`` is one prepare_view output ("cross" mode: a
           (state1, state2) tuple);
       prepare_view(EdgeView) -> baked (fwd, bwd) view layout sides (call
           once per epoch with the model's stashed ``edge_views[...]``
           after ``update_aug_adj``).
    """
    if contrastive not in ("single", "cross"):
        raise ValueError(f"unknown contrastive mode {contrastive!r}")
    from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
    from inductive_recommendation_tpu.parallel.spmm import (
        _wrap,
        bake_stacked_scale,
        build_edge_sharded_spmm,
    )

    n_shards = mesh.shape[axis]
    ds = model.dataset
    n_users, n_items = model.n_users, model.n_items
    n_nodes = n_users + n_items
    n_layers = model.n_layers

    if adj_emat is None:
        r, c, v = sym_normalized_adjacency(ds.train_array, n_users, n_items)
        adj_emat = build_edge_sharded_spmm(r, c, v, (n_nodes, n_nodes), n_shards)
    eng = model.view_engine
    view_emat = build_edge_sharded_spmm(
        eng._base_rows,
        eng._base_cols,
        np.ones(len(eng._base_rows), np.float32),
        (n_nodes, n_nodes),
        n_shards,
    )
    if view_emat.n_cols_pad != adj_emat.n_cols_pad:
        raise ValueError("adjacency and view operand rows must pad identically")

    adj_spmm = _wrap(adj_emat, mesh, axis, "scatter")
    view_spmm = _wrap(view_emat, mesh, axis, "scatter")
    scale_sharding = NamedSharding(mesh, P(axis, None))
    row_sharding = NamedSharding(mesh, P(axis, None))
    cb = _hybrid_batch_constrainer(mesh, axis)

    @jax.jit
    def _prep(vfwd, vbwd, eid_map, base_scale):
        sc = jax.lax.with_sharding_constraint(base_scale[eid_map], scale_sharding)
        return (
            bake_stacked_scale(vfwd, sc, mesh, axis),
            bake_stacked_scale(vbwd, sc, mesh, axis),
        )

    def prepare_view(view):
        """EdgeView -> baked (fwd, bwd) view layout sides for ``run``."""
        return _prep(
            view_emat.fwd, view_emat.bwd, view_emat.eid_map, view.base_scale
        )

    def propagate(spmm, fwd, bwd, scale, x0):
        acc, h = x0, x0
        for _ in range(n_layers):
            h = spmm(fwd, bwd, scale, h)
            acc = acc + h
        return acc / (n_layers + 1)

    def eval_rep(params, b):
        """Forward-only MAIN rep (SGL/HALF score with the main adjacency's
        rep, models/sgl.py); ``b`` carries edge_fwd/edge_bwd — the same
        ``propagate`` the training loss uses."""
        x = jax.lax.with_sharding_constraint(params["embedding"], row_sharding)
        return propagate(adj_spmm, b["edge_fwd"], b["edge_bwd"], None, x)[:n_nodes]

    def step(params, opt_state, afwd, abwd, vfwd, vbwd, vfwd2, vbwd2, smp, rng):
        rng_s, _ = jax.random.split(_ensure_key(rng, base_seed))
        users, pos, neg = map(cb, sample_bpr_batch(smp, rng_s, batch_size))

        def loss_fn(p):
            x = jax.lax.with_sharding_constraint(p["embedding"], row_sharding)
            rep = propagate(adj_spmm, afwd, abwd, None, x)
            u_r = rep[users]
            p_r = rep[n_users + pos]
            n_r = rep[n_users + neg[:, 0]]
            l2 = jnp.sum(u_r**2, 1) + jnp.sum(p_r**2, 1) + jnp.sum(n_r**2, 1)
            v1 = propagate(view_spmm, vfwd, vbwd, None, x)[users]
            if contrastive == "cross":
                v2 = propagate(view_spmm, vfwd2, vbwd2, None, x)[users]
                closs = L.info_nce(v1, v2, v2)
            else:
                closs = L.info_nce(u_r, v1, v1)
            return (
                L.bpr_loss(u_r, p_r, n_r)
                + l2_reg * l2.mean()
                + contrastive_reg * closs.mean()
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng, view_state):
        # "cross" takes (state1, state2); a single state is ONE baked
        # (fwd, bwd) side pair — its leading element is a _StackedSide
        if isinstance(view_state[0], tuple):
            (vfwd, vbwd), (vfwd2, vbwd2) = view_state
        else:
            vfwd, vbwd = view_state
            vfwd2, vbwd2 = vfwd, vbwd
        return jitted(
            params,
            opt_state,
            adj_emat.fwd,
            adj_emat.bwd,
            vfwd,
            vbwd,
            vfwd2,
            vbwd2,
            sampler,
            rng,
        )

    run.eval_rep = eval_rep
    return run, prepare_view


def make_edge_sharded_ngcf_step(
    model,
    mesh,
    optimizer,
    sampler,
    batch_size,
    l2_reg,
    axis="model",
    base_seed=0,
):
    """NGCF BPR step with the self-loop row-L1 adjacency AND the embedding
    table edge-block-sharded (reference model.py:3986-4055 driven by
    trainer.py:403-429).

    Per layer (model.py:4030-4044): m0 = A_drop @ h; m1 = h ∘ m0;
    h = leaky_relu(W_gc m0 + W_bi m1) -> feature dropout -> row L2
    normalization; rep = concat of layer outputs. The gc/bi linears,
    leaky-relu, dropout and normalization are LOCAL ops on the row-sharded
    activations (the [d, d'] weights are replicated; XLA psums their
    gradients) — the only communication is the SpMM's reduce-scatter
    forward / all-gather backward per layer.

    Training-time edge dropout on the adjacency is ONE mask per step shared
    across layers (the reference drops the matrix once per forward),
    generated IN the layout from a counter-hash of (shard, local eid) with
    one per-step key reused across layers — identical keep/rescale algebra
    to the single-device in-layout hash, different draws, and no per-step
    [S, E_pad] scale vector or eid gathers; the feature dropout draws over
    the padded row space (same divergence class). Loss parity with the
    single-device BPRTrainer step is exact at dropout=0.

    -> run(params, opt_state, rng) with NGCF's init_params layout,
    "embedding" re-laid to the sharded [n_cols_pad, d].
    """
    from inductive_recommendation_tpu.models.base import apply_linear
    from inductive_recommendation_tpu.models.ngcf import selfloop_l1_coo
    from inductive_recommendation_tpu.parallel.spmm import (
        _wrap,
        _wrap_dropout,
        build_edge_sharded_spmm,
    )

    ds = model.dataset
    n_users = model.n_users
    n_layers = model.n_layers
    p_drop = float(model.dropout)
    row, col, val, n_nodes = selfloop_l1_coo(ds)
    emat = build_edge_sharded_spmm(
        row, col, val, (n_nodes, n_nodes), mesh.shape[axis]
    )
    spmm = _wrap(emat, mesh, axis, "scatter")
    spmm_drop = (
        _wrap_dropout(emat, mesh, axis, "scatter", p_drop)
        if p_drop > 0.0
        else None
    )
    row_sharding = NamedSharding(mesh, P(axis, None))
    cb = _hybrid_batch_constrainer(mesh, axis)

    def forward(p, fwd, bwd, rng, training):
        """The ONE NGCF forward definition (training loss + eval rep)."""
        h = jax.lax.with_sharding_constraint(p["embedding"], row_sharding)
        layers = [h]
        drop_key = None
        rng_feat = rng
        if training and rng is not None and p_drop > 0.0:
            rng_edge, rng_feat = jax.random.split(rng)
            drop_key = jax.random.key_data(rng_edge)
        for i in range(n_layers):
            # the SAME drop_key every layer == one dropped matrix per step
            m0 = (
                spmm_drop(fwd, bwd, drop_key, h)
                if drop_key is not None
                else spmm(fwd, bwd, None, h)
            )
            m1 = h * m0
            m0 = apply_linear(p["gc_layers"][i], m0)
            m1 = apply_linear(p["bi_layers"][i], m1)
            h = jax.nn.leaky_relu(m0 + m1, negative_slope=0.2)
            if training and rng_feat is not None and p_drop > 0.0:
                rng_feat, sub = jax.random.split(rng_feat)
                keepf = jax.random.uniform(sub, h.shape) >= p_drop
                h = jnp.where(keepf, h / (1.0 - p_drop), 0.0)
            h = jax.lax.with_sharding_constraint(h, row_sharding)
            # the CONCATENATED copy is L2-normalized; the value fed to the
            # next layer is NOT (models/ngcf.py — reference model.py:4042).
            # Clamp INSIDE the sqrt: see models/ngcf.py — a clamped-outside
            # norm still nan's the backward for exactly-zero rows (dropped
            # self-loops of isolated nodes).
            norm = jnp.sqrt(
                jnp.maximum(jnp.sum(h * h, axis=1, keepdims=True), 1e-24)
            )
            layers.append(h / norm)
        return jnp.concatenate(layers, axis=1)

    def eval_rep(params, b):
        return forward(params, b["edge_fwd"], b["edge_bwd"], None, False)[:n_nodes]

    def step(params, opt_state, fwd, bwd, smp, rng):
        rng_s, rng_m = jax.random.split(_ensure_key(rng, base_seed))
        users, pos, neg = map(cb, sample_bpr_batch(smp, rng_s, batch_size))

        def loss_fn(p):
            rep = forward(p, fwd, bwd, rng_m, True)
            u_r = rep[users]
            p_r = rep[n_users + pos]
            n_r = rep[n_users + neg[:, 0]]
            l2 = jnp.sum(u_r**2, 1) + jnp.sum(p_r**2, 1) + jnp.sum(n_r**2, 1)
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng):
        return jitted(params, opt_state, emat.fwd, emat.bwd, sampler, rng)

    run.eval_rep = eval_rep
    run.emat = emat
    return run


def make_edge_sharded_imcgae_step(
    model,
    mesh,
    optimizer,
    sampler,
    batch_size,
    l2_reg,
    axis="model",
    base_seed=0,
):
    """IMCGAE BPR step with the normalized adjacency AND the personal
    embedding rows edge-block-sharded (reference model.py:4300-4345 driven
    by trainer.py:403-429).

    Edge-layout params: {"embedding": [n_cols_pad, d] PERSONAL rows sharded,
    "special": [3, d] replicated} — the three shared rows (identical,
    general-user, general-item; model.py:4314-4327) are O(d). Like the
    single-device model (models/imcgae.py _rep_compact), the propagation
    runs at width d+3 — [personal | u_mask | i_mask | 1] — instead of the
    3d concat: the shared blocks stay rank-<=2 under the (linear) masked
    propagation, so only their coefficient vectors propagate, and the hot
    gathers move one 128-lane row instead of a two-vreg 3d row. Batch rows
    expand back to 3d only at the loss. Per layer: node dropout at the
    decayed rate max(dropout - 0.1·i, 0) (a row scale — shard-local),
    propagation, sum-combine with 1/(i+2) scaling (model.py:4331-4339).
    Node dropout draws over the padded row space (different draws than
    single-device, same algebra); loss parity is exact at dropout=0.
    """
    from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
    from inductive_recommendation_tpu.parallel.spmm import (
        _wrap,
        build_edge_sharded_spmm,
    )

    ds = model.dataset
    n_users, n_items = model.n_users, model.n_items
    n_nodes = n_users + n_items
    n_layers = model.n_layers
    p_drop = float(model.dropout)
    r, c, v = sym_normalized_adjacency(ds.train_array, n_users, n_items)
    emat = build_edge_sharded_spmm(r, c, v, (n_nodes, n_nodes), mesh.shape[axis])
    spmm = _wrap(emat, mesh, axis, "scatter")
    row_sharding = NamedSharding(mesh, P(axis, None))
    cb = _hybrid_batch_constrainer(mesh, axis)
    n_pad = emat.n_cols_pad
    # per-layer decayed rate clamped at 0 (models/imcgae.py documents the
    # negative-rate reference quirk)
    rates = [max(p_drop - 0.1 * i, 0.0) for i in range(n_layers)]

    def forward_compact(p, fwd, bwd, rng, training):
        """The ONE IMCGAE forward definition (training loss + eval rep):
        propagate [personal | u_mask | i_mask | 1] at width d+3; shared
        rows enter only at row expansion (``expand``)."""
        emb = jax.lax.with_sharding_constraint(p["embedding"], row_sharding)
        u_mask = (jnp.arange(n_pad) < n_users).astype(emb.dtype)
        h = jax.lax.with_sharding_constraint(
            jnp.concatenate(
                [emb, u_mask[:, None], (1.0 - u_mask)[:, None],
                 jnp.ones((n_pad, 1), emb.dtype)],
                axis=1,
            ),
            row_sharding,
        )
        final = h
        for i in range(n_layers):
            if training and rng is not None and rates[i] > 0.0:
                keep = jax.random.uniform(
                    jax.random.fold_in(rng, i), (n_pad,)
                ) >= rates[i]
                mask = jnp.where(keep, 1.0 / max(1.0 - rates[i], 1e-6), 0.0)
                h = h * mask[:, None]
            h = spmm(fwd, bwd, None, h)
            final = final + h * (1.0 / (i + 2))
        return final

    def expand(rows, sp):
        """[*, d+3] -> [*, 3d]; sp = [identical, general_user, general_item]."""
        return jnp.concatenate(
            [
                rows[..., :-3],
                rows[..., -3:-2] * sp[1] + rows[..., -2:-1] * sp[2],
                rows[..., -1:] * sp[0],
            ],
            axis=-1,
        )

    def eval_rep(params, b):
        compact = forward_compact(params, b["edge_fwd"], b["edge_bwd"], None, False)
        return expand(compact[:n_nodes], params["special"])

    def step(params, opt_state, fwd, bwd, smp, rng):
        rng_s, rng_m = jax.random.split(_ensure_key(rng, base_seed))
        users, pos, neg = map(cb, sample_bpr_batch(smp, rng_s, batch_size))

        def loss_fn(p):
            compact = forward_compact(p, fwd, bwd, rng_m, True)
            sp = p["special"]
            u_r = expand(compact[users], sp)
            p_r = expand(compact[n_users + pos], sp)
            n_r = expand(compact[n_users + neg[:, 0]], sp)
            l2 = jnp.sum(u_r**2, 1) + jnp.sum(p_r**2, 1) + jnp.sum(n_r**2, 1)
            return L.bpr_loss(u_r, p_r, n_r) + l2_reg * l2.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng):
        return jitted(params, opt_state, emat.fwd, emat.bwd, sampler, rng)

    run.eval_rep = eval_rep
    run.emat = emat
    return run


def make_edge_sharded_idcf_step(
    model,
    mesh,
    optimizer,
    sampler,
    batch_size,
    l2_reg,
    contrastive_reg,
    axis="model",
    base_seed=0,
):
    """IDCF_LGCN step with the feature matrix, the adjacency AND the frozen
    pretrained table edge-block-sharded (reference model.py:3895-3983 driven
    by trainer.py:488-515).

    The frozen LightGCN table is a BUFFER (no gradient); it is the SpMM
    operand, row-sharded like the layout's column blocks. Per head the
    attention over ``n_samples`` sampled key users/items is a row-local op:
    both the user-keyed and item-keyed attention run over the full padded
    row space and a row-index select picks the right one (2x the attention
    FLOPs of the split version, but m=50 makes it negligible next to the
    SpMMs and it keeps the activations block-aligned — no resharding). The
    logsumexp contrastive regularizer (model.py:3946-3955, last head's
    samples) is computed on the GATHERED batch rows only.

    The rng path mirrors the single-device model exactly (same split
    sequence, _representations), so the sampled keys — and with dropout
    absent, the loss — match the single-device IDCFTrainer step to fp
    noise at any shard count.
    """
    from inductive_recommendation_tpu.graph import bipartite_edges
    from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
    from inductive_recommendation_tpu.models.base import apply_linear
    from inductive_recommendation_tpu.models.idcf import relation_gat
    from inductive_recommendation_tpu.parallel.spmm import (
        _wrap,
        build_edge_sharded_spmm,
        shard_operand,
    )

    ds = model.dataset
    n_users, n_items = model.n_users, model.n_items
    n_nodes = n_users + n_items
    n_old_u, n_old_i = model.n_old_users, model.n_old_items
    n_heads, n_samples = model.n_headers, model.n_samples
    n_layers = model.n_layers
    S = mesh.shape[axis]

    # feat = adjacency columns in old-user ++ old-item order (model.py:3921-3925)
    row, col = bipartite_edges(ds.train_array, n_users, n_items)
    new_col = np.where(col < n_users, col, n_old_u + (col - n_users))
    feat_emat = build_edge_sharded_spmm(
        row,
        new_col,
        np.ones(len(row), np.float32),
        (n_nodes, n_old_u + n_old_i),
        S,
    )
    r, c, v = sym_normalized_adjacency(ds.train_array, n_users, n_items)
    adj_emat = build_edge_sharded_spmm(r, c, v, (n_nodes, n_nodes), S)
    if feat_emat.n_rows_pad != adj_emat.n_cols_pad:
        raise ValueError(
            "feat output rows and adjacency operand rows must pad identically"
        )
    feat_spmm = _wrap(feat_emat, mesh, axis, "scatter")
    adj_spmm = _wrap(adj_emat, mesh, axis, "scatter")
    row_sharding = NamedSharding(mesh, P(axis, None))
    cb = _hybrid_batch_constrainer(mesh, axis)
    frozen_sh = shard_operand(
        np.asarray(model.buffers["frozen_embedding"]), feat_emat, mesh, axis
    )

    def representations(p, ffwd, fbwd, frozen, rng):
        """Pre-propagation representations + the LAST head's samples —
        mirrors models/idcf.py _representations (same rng split sequence,
        so the sampled keys match the single-device path exactly)."""
        x_q = feat_spmm(ffwd, fbwd, None, frozen)
        if rng is None:
            rng = jax.random.key(0)
        is_user = (jnp.arange(x_q.shape[0]) < n_users)[:, None]
        outs = []
        for i in range(n_heads):
            rng, r_u, r_i = jax.random.split(rng, 3)
            su = jax.random.randint(r_u, (n_samples,), 0, n_old_u)
            si = jax.random.randint(r_i, (n_samples,), 0, n_old_i)
            s_u = frozen[su]
            s_i = frozen[n_old_u + si]
            gat_u = relation_gat(p["gat_units"][i], x_q, s_u)
            gat_i = relation_gat(p["gat_units"][i], x_q, s_i)
            outs.append(jnp.where(is_user, gat_u, gat_i))
        reps = apply_linear(p["w_out"], jnp.concatenate(outs, axis=1))
        reps = jax.lax.with_sharding_constraint(reps, row_sharding)
        return reps, (s_u, s_i)

    def propagate(fwd, bwd, x0):
        acc, h = x0, x0
        for _ in range(n_layers):
            h = adj_spmm(fwd, bwd, None, h)
            acc = acc + h
        return acc / (n_layers + 1)

    def eval_rep(params, b):
        reps, _ = representations(
            params, b["edge_feat_fwd"], b["edge_feat_bwd"], b["edge_frozen"], None
        )
        return propagate(b["edge_adj_fwd"], b["edge_adj_bwd"], reps)[:n_nodes]

    def step(params, opt_state, ffwd, fbwd, afwd, abwd, frozen, smp, rng):
        rng_s, rng_m = jax.random.split(_ensure_key(rng, base_seed))
        users, pos, neg = map(cb, sample_bpr_batch(smp, rng_s, batch_size))

        def loss_fn(p):
            reps0, (s_u, s_i) = representations(p, ffwd, fbwd, frozen, rng_m)
            rep = propagate(afwd, abwd, reps0)
            u_r = rep[users]
            p_r = rep[n_users + pos]
            n_r = rep[n_users + neg[:, 0]]
            l2 = jnp.sum(u_r**2, 1) + jnp.sum(p_r**2, 1) + jnp.sum(n_r**2, 1)
            for unit in p["gat_units"]:
                l2 = l2 + jnp.sum(unit["wq"]["w"] ** 2) + jnp.sum(unit["wk"]["w"] ** 2)
            # contrastive regularizer on the GATHERED batch rows of the
            # pre-propagation representations (model.py:3946-3955)
            ub = reps0[users]
            pb = reps0[n_users + pos]
            nb = reps0[n_users + neg[:, 0]]
            lse = jax.scipy.special.logsumexp
            closs = (
                lse(ub @ s_u.T, axis=1)
                - jnp.sum(ub * frozen[users], axis=1)
                + lse(pb @ s_i.T, axis=1)
                - jnp.sum(pb * frozen[n_old_u + pos], axis=1)
                + lse(nb @ s_i.T, axis=1)
                - jnp.sum(nb * frozen[n_old_u + neg[:, 0]], axis=1)
            )
            return (
                L.bpr_loss(u_r, p_r, n_r)
                + l2_reg * l2.mean()
                + contrastive_reg * closs.mean()
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng):
        return jitted(
            params,
            opt_state,
            feat_emat.fwd,
            feat_emat.bwd,
            adj_emat.fwd,
            adj_emat.bwd,
            frozen_sh,
            sampler,
            rng,
        )

    run.eval_rep = eval_rep
    run.feat_emat = feat_emat
    run.adj_emat = adj_emat
    run.frozen_sh = frozen_sh
    return run


def make_edge_sharded_att_igcn_step(
    model,
    mesh,
    optimizer,
    sampler,
    aux_sampler,
    batch_size,
    l2_reg,
    aux_reg,
    axis="model",
    base_seed=0,
    feat_emat=None,
    adj_emat=None,
    feat_coo=None,
    attn_fn=None,
    attn_perm=None,
):
    """AttIGCN training step with the feature matrix, the adjacency, the
    per-edge ATTENTION softmax and the core embedding table all sharded.
    Prebuilt layouts (``feat_emat``/``adj_emat``/``feat_coo``) and attention
    pieces (``attn_fn``/``attn_perm``, e.g. shared with the trainer's eval
    path) are accepted to avoid duplicating the O(E) host passes.

    Semantics match models/att_igcn.py (reference spec model.py:4224-4287):

    - q = Wq(feat @ sg(emb)) with the alpha=0 feat weights (row_sum^-1) as a
      sharded per-edge scale; k = Wk(sg(emb)); both row-sharded so the only
      non-local attention traffic is one all-gather of q plus two
      [n_pad, h] row-statistic all-reduces (parallel/attention.py);
    - the inductive layer aggregates the NON-detached embedding with the
      head-mean attention weights (model.py:4279);
    - loss = BPR + l2_reg*(rep L2 + ||Wq||^2 + ||Wk||^2) + aux_reg*auxBPR(w)
      (model.py:4283-4286 + trainer.py:542-549). AttIGCN fixes alpha=0 and
      applies no feat dropout in its attention layer (att_igcn.py), so there
      is no anneal argument.

    -> run(params, opt_state, rng) -> (params, opt_state, loss), params =
    AttIGCN's init_params with "embedding" sharded to [n_cols_pad, d].
    """
    from inductive_recommendation_tpu.graph import build_feat_matrix
    from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
    from inductive_recommendation_tpu.parallel.attention import (
        build_attention_perm,
        make_edge_sharded_attention,
    )
    from inductive_recommendation_tpu.parallel.spmm import (
        _wrap,
        build_edge_sharded_spmm,
    )

    n_shards = mesh.shape[axis]
    ds = model.dataset
    n_users, n_items = model.n_users, model.n_items
    n_nodes = n_users + n_items
    d, n_heads, n_layers = model.embedding_size, model.n_heads, model.n_layers
    user_dim = model.user_dim

    if feat_coo is not None:
        frow, fcol, fval, row_sum = feat_coo
    else:
        frow, fcol, fval, row_sum = build_feat_matrix(
            ds.train_array, n_users, n_items, model.user_map, model.item_map
        )
    if feat_emat is None:
        feat_emat = build_edge_sharded_spmm(
            frow, fcol, fval, (n_nodes, model.feat_n_cols), n_shards
        )
    if adj_emat is None:
        r, c, v = sym_normalized_adjacency(ds.train_array, n_users, n_items)
        adj_emat = build_edge_sharded_spmm(r, c, v, (n_nodes, n_nodes), n_shards)
    if feat_emat.n_rows_pad != adj_emat.n_cols_pad:
        raise ValueError(
            "feat output rows and adjacency operand rows must pad identically"
        )

    feat_spmm = _wrap(feat_emat, mesh, axis, "scatter")
    adj_spmm = _wrap(adj_emat, mesh, axis, "scatter")
    if attn_fn is None:
        attn_fn = make_edge_sharded_attention(
            feat_emat, mesh, axis, temperature=model.temperature
        )
    perm = attn_perm if attn_perm is not None else build_attention_perm(feat_emat)
    scale_sharding = NamedSharding(mesh, P(axis, None))
    row_sharding = NamedSharding(mesh, P(axis, None))
    cb = _hybrid_batch_constrainer(mesh, axis)

    def main_rep(p, ffwd_q, fbwd_q, qscale, ffwd, afwd, abwd, fperm):
        """Attention-weighted inductive layer + adjacency layer-mean — the
        ONE AttIGCN forward definition, shared by the training loss and the
        trainer's eval rep. Returns (rep, emb) — the loss also needs the raw
        sharded table for the aux term. The q stop_gradient matches
        models/att_igcn.py (a no-op under eval's forward-only use); the key
        table is FOLDED into the query side (qk = q @ Wk^T per head, the
        measured 2.4x form — ops/attention_spmm.py attention_spmm_fused_kv;
        the key-side value detach happens inside parallel/attention.py).
        ``ffwd_q/fbwd_q`` feed the query-side SpMM (the hot step passes the
        qscale-BAKED copies with qscale=None — alpha is pinned at 0, so the
        bake is one-time; eval passes the raw sides + a traced qscale);
        ``ffwd`` is always the RAW layout for the attention's value gathers
        and nonzero masks."""
        emb = jax.lax.with_sharding_constraint(p["embedding"], row_sharding)
        emb_sg = jax.lax.stop_gradient(emb)
        x_q = feat_spmm(ffwd_q, fbwd_q, qscale, emb_sg)
        q = x_q @ p["weight_q"]["w"] + p["weight_q"]["b"]
        q = jax.lax.with_sharding_constraint(
            q, NamedSharding(mesh, P(axis, None))
        ).reshape(-1, n_heads, d)
        wk = p["weight_k"]["w"].reshape(d, n_heads, d)
        qk = jax.lax.with_sharding_constraint(
            jnp.einsum("nhd,vhd->nhv", q, wk), NamedSharding(mesh, P(axis))
        )
        qb = jax.lax.with_sharding_constraint(
            jnp.einsum("nhd,hd->nh", q, p["weight_k"]["b"].reshape(n_heads, d)),
            NamedSharding(mesh, P(axis, None)),
        )
        x0 = attn_fn(ffwd, fperm, qk, qb, emb)
        acc, h = x0, x0
        for _ in range(n_layers):
            h = adj_spmm(afwd, abwd, None, h)
            acc = acc + h
        return acc / (n_layers + 1), emb

    def eval_rep(params, b):
        """Forward-only main rep; ``b`` additionally carries the attention
        permutation (edge_attn_perm)."""
        qscale = jax.lax.with_sharding_constraint(
            1.0 / jnp.maximum(b["edge_rs"], 1e-12)[b["edge_frow"]], scale_sharding
        )
        rep, _ = main_rep(
            params, b["edge_feat_fwd"], b["edge_feat_bwd"], qscale,
            b["edge_feat_fwd"],
            b["edge_adj_fwd"], b["edge_adj_bwd"], b["edge_attn_perm"],
        )
        return rep[:n_nodes]

    def step(
        params, opt_state, ffwd_q, fbwd_q, ffwd, afwd, abwd, fperm, smp, aux_smp, rng
    ):
        # 3-way split matching the single-device trainer steps (the third
        # key is the model-dropout slot — unused here, AttIGCN applies none)
        rng_s, rng_a, _ = jax.random.split(_ensure_key(rng, base_seed), 3)
        users, pos, neg = map(cb, sample_bpr_batch(smp, rng_s, batch_size))
        a_users, a_pos, a_neg = map(cb, sample_bpr_batch(aux_smp, rng_a, batch_size))

        def loss_fn(p):
            # alpha is fixed to 0 (att_igcn.py) -> feat weights row_sum^-1,
            # baked ONCE into ffwd_q/fbwd_q at build time
            rep, emb = main_rep(p, ffwd_q, fbwd_q, None, ffwd, afwd, abwd, fperm)
            u_r = rep[users]
            p_r = rep[n_users + pos]
            n_r = rep[n_users + neg[:, 0]]
            l2 = jnp.sum(u_r**2, 1) + jnp.sum(p_r**2, 1) + jnp.sum(n_r**2, 1)
            w_l2 = jnp.sum(p["weight_q"]["w"] ** 2) + jnp.sum(p["weight_k"]["w"] ** 2)
            bpr = L.bpr_loss(u_r, p_r, n_r)
            aux_loss = L.aux_bpr_w(
                emb, p["w"], a_users, a_pos, a_neg[:, 0], user_dim
            )
            return bpr + l2_reg * (l2.mean() + w_l2) + aux_reg * aux_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))
    frow_stacked = jax.device_put(
        np.asarray(frow, dtype=np.int32)[np.asarray(feat_emat.eid_map)],
        scale_sharding,
    )
    rs_dev = jnp.asarray(row_sum, dtype=jnp.float32)

    from inductive_recommendation_tpu.parallel.spmm import bake_stacked_scale

    @jax.jit
    def _bake_q(ffwd, fbwd, rs, frow_st):
        qscale = jax.lax.with_sharding_constraint(
            1.0 / jnp.maximum(rs, 1e-12)[frow_st], scale_sharding
        )
        return (
            bake_stacked_scale(ffwd, qscale, mesh, axis),
            bake_stacked_scale(fbwd, qscale, mesh, axis),
        )

    # one-time: AttIGCN pins alpha=0, so the query-side feat weights never
    # change — bake them at build instead of gathering a scale per step
    ffwd_q, fbwd_q = _bake_q(feat_emat.fwd, feat_emat.bwd, rs_dev, frow_stacked)

    def run(params, opt_state, rng):
        return jitted(
            params,
            opt_state,
            ffwd_q,
            fbwd_q,
            feat_emat.fwd,
            adj_emat.fwd,
            adj_emat.bwd,
            perm,
            sampler,
            aux_sampler,
            rng,
        )

    run.eval_rep = eval_rep
    return run


def make_sharded_igcn_step(
    model, optimizer, sampler, aux_sampler, batch_size, l2_reg, aux_reg, mesh
):
    """Sharded FULL IGCN training step: main BPR over the inductive rep +
    aux BPR on the row-sharded core embedding table weighted by w.

    The embedding table is sharded over 'model'; the feature-matrix SpMM
    gathers against it, which XLA turns into all-to-all/all-gather
    collectives; data-parallel gradients psum over 'data'.
    """

    def constrain_batch(x):
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))

    user_dim = model.user_dim

    def step(params, opt_state, buffers, smp, aux_smp, rng):
        rng_s, rng_a, rng_m = jax.random.split(rng, 3)
        users, pos, neg = sample_bpr_batch(smp, rng_s, batch_size)
        a_users, a_pos, a_neg = sample_bpr_batch(aux_smp, rng_a, batch_size)
        users, pos = constrain_batch(users), constrain_batch(pos)
        a_users, a_pos = constrain_batch(a_users), constrain_batch(a_pos)

        def loss_fn(p):
            u_r, p_r, n_r, l2 = model.bpr_forward(
                p, users, pos, neg[:, 0], rng=rng_m, training=True, buffers=buffers
            )[:4]
            bpr = L.bpr_loss(u_r, p_r, n_r)
            aux_loss = L.aux_bpr_w(
                p["embedding"], p["w"], a_users, a_pos, a_neg[:, 0], user_dim
            )
            return bpr + l2_reg * l2.mean() + aux_reg * aux_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(0, 1))

    def run(params, opt_state, rng):
        return jitted(params, opt_state, model.buffers, sampler, aux_sampler, rng)

    return run
