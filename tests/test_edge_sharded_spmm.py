"""Edge-block-sharded SpMM (parallel/spmm.py) vs dense and single-device
oracles on the 8-device virtual CPU mesh: forward (both modes), gradients
through the collective pattern, edge_scale indirection, layer chaining."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inductive_recommendation_tpu.ops.bucketed_spmm import (
    build_bucketed_spmm,
    spmm_bucketed,
)
from inductive_recommendation_tpu.parallel import make_mesh
from inductive_recommendation_tpu.parallel.spmm import (
    build_edge_sharded_spmm,
    make_edge_sharded_propagation,
    make_edge_sharded_spmm,
    shard_operand,
)


def _random_coo(rng, n_rows, n_cols, nnz):
    row = rng.integers(0, n_rows, nnz)
    col = rng.integers(0, n_cols, nnz)
    # coalesce duplicates (layouts assume one entry per (r, c))
    key = row * n_cols + col
    _, keep = np.unique(key, return_index=True)
    row, col = row[keep], col[keep]
    val = rng.normal(size=len(row)).astype(np.float32)
    return row, col, val


def _dense(row, col, val, shape):
    A = np.zeros(shape, np.float32)
    A[row, col] = val
    return A


@pytest.mark.parametrize("mode", ["scatter", "replicated"])
@pytest.mark.parametrize("n_model", [1, 4, 8])
def test_forward_matches_dense(rng, mode, n_model):
    n_rows, n_cols, d = 45, 37, 8
    row, col, val = _random_coo(rng, n_rows, n_cols, 400)
    mesh = make_mesh(n_data=8 // n_model if n_model < 8 else 1, n_model=n_model)
    mat = build_edge_sharded_spmm(row, col, val, (n_rows, n_cols), n_model)
    fn = make_edge_sharded_spmm(mat, mesh, mode=mode)

    x = rng.normal(size=(n_cols, d)).astype(np.float32)
    out = np.asarray(fn(shard_operand(x, mat, mesh)))[:n_rows]
    expect = _dense(row, col, val, (n_rows, n_cols)) @ x
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["scatter", "replicated"])
def test_grad_matches_dense(rng, mode):
    n_rows, n_cols, d = 30, 30, 4
    row, col, val = _random_coo(rng, n_rows, n_cols, 250)
    mesh = make_mesh(n_data=2, n_model=4)
    mat = build_edge_sharded_spmm(row, col, val, (n_rows, n_cols), 4)
    fn = make_edge_sharded_spmm(mat, mesh, mode=mode)

    x = rng.normal(size=(mat.n_cols_pad, d)).astype(np.float32)
    w = rng.normal(size=(mat.n_rows_pad, d)).astype(np.float32)

    def loss(xx):
        return jnp.sum(fn(xx) * w)

    gx = np.asarray(jax.grad(loss)(shard_operand(x[:n_cols], mat, mesh)))
    A = _dense(row, col, val, (mat.n_rows_pad, mat.n_cols_pad))
    np.testing.assert_allclose(gx, A.T @ w, rtol=1e-5, atol=1e-5)


def test_edge_scale_matches_scaled_dense(rng):
    n_rows = n_cols = 26
    row, col, val = _random_coo(rng, n_rows, n_cols, 200)
    scale = rng.uniform(0.0, 2.0, len(val)).astype(np.float32)
    mesh = make_mesh(n_data=4, n_model=2)
    mat = build_edge_sharded_spmm(row, col, val, (n_rows, n_cols), 2)
    fn = make_edge_sharded_spmm(mat, mesh, mode="scatter")

    x = rng.normal(size=(n_cols, 6)).astype(np.float32)
    out = np.asarray(fn(shard_operand(x, mat, mesh), jnp.asarray(scale)))[:n_rows]
    expect = _dense(row, col, val * scale, (n_rows, n_cols)) @ x
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)

    # gradient with a scale vector flows through the same edge ids
    w = rng.normal(size=(mat.n_rows_pad, 6)).astype(np.float32)
    gx = np.asarray(
        jax.grad(lambda xx: jnp.sum(fn(xx, jnp.asarray(scale)) * w))(
            shard_operand(x, mat, mesh)
        )
    )
    A = _dense(row, col, val * scale, (mat.n_rows_pad, mat.n_cols_pad))
    np.testing.assert_allclose(gx, A.T @ w, rtol=1e-5, atol=1e-5)


def test_propagation_chain_matches_single_device(rng):
    """3-layer mean propagation, operand sharded end-to-end, equals the
    single-device bucketed path."""
    n = 40
    row, col, val = _random_coo(rng, n, n, 350)
    mesh = make_mesh(n_data=1, n_model=8)
    mat = build_edge_sharded_spmm(row, col, val, (n, n), 8)
    prop = make_edge_sharded_propagation(mat, mesh, n_layers=3)

    x = rng.normal(size=(n, 8)).astype(np.float32)
    out = np.asarray(prop(shard_operand(x, mat, mesh)))[:n]

    single = build_bucketed_spmm(row, col, val, (n, n))
    acc, h = jnp.asarray(x), jnp.asarray(x)
    for _ in range(3):
        h = spmm_bucketed(single, h)
        acc = acc + h
    np.testing.assert_allclose(out, np.asarray(acc / 4), rtol=1e-4, atol=1e-5)


def test_output_is_sharded(rng):
    n = 32
    row, col, val = _random_coo(rng, n, n, 200)
    mesh = make_mesh(n_data=1, n_model=8)
    mat = build_edge_sharded_spmm(row, col, val, (n, n), 8)
    fn = make_edge_sharded_spmm(mat, mesh, mode="scatter")
    out = fn(shard_operand(np.ones((n, 4), np.float32), mat, mesh))
    assert not out.sharding.is_fully_replicated


def test_edge_sharded_bpr_step_matches_single_device():
    """Fully-sharded LightGCN training (graph + table sharded over 'model')
    computes the same loss as the single-device step on the same batch."""
    import optax

    from inductive_recommendation_tpu import get_dataset, get_model
    from inductive_recommendation_tpu.data.sampling import build_sampler_state
    from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
    from inductive_recommendation_tpu.parallel import make_edge_sharded_bpr_step
    from inductive_recommendation_tpu.train import losses as L
    from inductive_recommendation_tpu.data.sampling import sample_bpr_batch

    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 48,
            "n_items": 40,
            "n_interactions": 650,
            "seed": 11,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )
    n = ds.n_users + ds.n_items
    model = get_model(
        {"name": "LightGCN", "embedding_size": 16, "n_layers": 3, "table_align": 1},
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    params0 = model.init_params(jax.random.key(3))

    # single-device oracle loss on one sampled batch
    def single_loss(p, rng):
        users, pos, neg = sample_bpr_batch(sampler, jax.random.split(rng)[0], 64)
        u, pr, nr, l2 = model.bpr_forward(p, users, pos, neg[:, 0], training=False)
        return L.bpr_loss(u, pr, nr) + 1e-4 * l2.mean()

    loss_ref = float(jax.jit(single_loss)(params0, jax.random.key(9)))

    mesh = make_mesh(n_data=1, n_model=8)
    r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
    emat = build_edge_sharded_spmm(r, c, v, (n, n), 8)
    optimizer = optax.adam(1e-2)
    emb = jnp.zeros((emat.n_cols_pad, 16), jnp.float32)
    emb = emb.at[:n].set(params0["embedding"][:n])
    params = {"embedding": shard_operand(emb, emat, mesh)}
    opt_state = optimizer.init(params)
    step = make_edge_sharded_bpr_step(
        emat, mesh, optimizer, sampler, 64, 1e-4, ds.n_users, 3
    )
    with mesh:
        losses = []
        rngs = [jax.random.key(9), jax.random.key(10), jax.random.key(11)]
        for rng in rngs:
            params, opt_state, loss = step(params, opt_state, rng)
            losses.append(float(loss))
    assert abs(losses[0] - loss_ref) < 1e-4, (losses[0], loss_ref)
    assert all(np.isfinite(l) for l in losses)
    # the table stays sharded through the optimizer update
    assert not params["embedding"].sharding.is_fully_replicated


def test_per_device_memory_shrinks_with_shards(rng):
    """Weak-scaling property: each device holds ~1/S of the layout and of
    the operand (addressable-shard sizes, not just global shapes)."""
    n = 64
    row, col, val = _random_coo(rng, n, n, 900)
    mesh = make_mesh(n_data=1, n_model=8)
    mat = build_edge_sharded_spmm(row, col, val, (n, n), 8)
    x = shard_operand(np.ones((n, 16), np.float32), mat, mesh)
    shard_rows = {s.data.shape[0] for s in x.addressable_shards}
    assert shard_rows == {mat.n_cols_pad // 8}
    # stacked layout leaves are sharded on their leading shard axis
    leaves = jax.tree_util.tree_leaves(mat.fwd)
    placed = jax.device_put(
        leaves[0],
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("model")),
    )
    assert placed.addressable_shards[0].data.shape[0] == 1


def test_edge_sharded_igcn_step_matches_single_device():
    """Fully-sharded IGCN training (feature matrix + adjacency + core table
    all sharded over 'model') computes the same loss as the single-device
    IGCNTrainer loss on the same batch, including the annealed feature
    weights entering as a traced edge_scale."""
    import optax

    from inductive_recommendation_tpu import get_dataset, get_model
    from inductive_recommendation_tpu.data.dataset import AuxiliaryDataset
    from inductive_recommendation_tpu.data.sampling import (
        build_sampler_state,
        sample_bpr_batch,
    )
    from inductive_recommendation_tpu.graph import build_feat_matrix
    from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
    from inductive_recommendation_tpu.parallel import make_edge_sharded_igcn_step
    from inductive_recommendation_tpu.train import losses as L

    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 48,
            "n_items": 40,
            "n_interactions": 650,
            "seed": 11,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )
    n = ds.n_users + ds.n_items
    model = get_model(
        {
            "name": "IGCN",
            "embedding_size": 16,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 1.0,
            "table_align": 1,
        },
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
    params0 = model.init_params(jax.random.key(3))
    l2_reg, aux_reg, bs = 1e-4, 0.01, 64

    def single_loss(p, buffers, rng):
        # buffers as jit ARGUMENTS (the codebase invariant): closure-captured
        # buffers would be frozen into the first trace and silently reused
        # when the annealed feat layout changes
        rng_s, rng_a, _ = jax.random.split(rng, 3)
        users, pos, neg = sample_bpr_batch(sampler, rng_s, bs)
        a_users, a_pos, a_neg = sample_bpr_batch(aux_sampler, rng_a, bs)
        u, pr, nr, l2 = model.bpr_forward(
            p, users, pos, neg[:, 0], training=False, buffers=buffers
        )
        emb, w = p["embedding"], p["w"]
        au, ap, an = (
            emb[a_users],
            emb[model.user_dim + a_pos],
            emb[model.user_dim + a_neg[:, 0]],
        )
        aux_l = jnp.mean(
            jax.nn.softplus(
                jnp.sum(au * an * w[None, :], 1) - jnp.sum(au * ap * w[None, :], 1)
            )
        )
        return L.bpr_loss(u, pr, nr) + l2_reg * l2.mean() + aux_reg * aux_l

    # sharded layouts from the SAME feat/adj arrays the model built
    frow, fcol, fval, row_sum = build_feat_matrix(
        ds.train_array, ds.n_users, ds.n_items, model.user_map, model.item_map
    )
    r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
    mesh = make_mesh(n_data=1, n_model=8)
    feat_emat = build_edge_sharded_spmm(
        frow, fcol, fval, (n, model.feat_n_cols), 8
    )
    adj_emat = build_edge_sharded_spmm(r, c, v, (n, n), 8)
    optimizer = optax.adam(1e-2)
    step = make_edge_sharded_igcn_step(
        feat_emat,
        adj_emat,
        frow,
        row_sum,
        mesh,
        optimizer,
        sampler,
        aux_sampler,
        bs,
        l2_reg,
        aux_reg,
        ds.n_users,
        model.user_dim,
        2,
        0.0,
    )

    def sharded_params():
        emb = jnp.zeros((feat_emat.n_cols_pad, 16), jnp.float32)
        emb = emb.at[: model.feat_n_cols].set(
            params0["embedding"][: model.feat_n_cols]
        )
        return {
            "embedding": shard_operand(emb, feat_emat, mesh),
            # fresh buffer: the step donates params, and params0 stays live
            # as the single-device oracle's input
            "w": jnp.array(params0["w"]),
        }

    for alpha in (1.0, 0.99):
        # single-device buffers carry the annealed weights baked in
        buffers = dict(
            model.buffers,
            feat=model._anneal_jit(model._feat_base, model._feat_row_sum, alpha),
        )
        loss_ref = float(jax.jit(single_loss)(params0, buffers, jax.random.key(9)))
        params = sharded_params()
        opt_state = optimizer.init(params)
        with mesh:
            params, opt_state, loss = step(
                params, opt_state, jax.random.key(9), alpha=alpha
            )
        assert abs(float(loss) - loss_ref) < 1e-4, (alpha, float(loss), loss_ref)
        assert not params["embedding"].sharding.is_fully_replicated


def test_edge_scale_order_with_zero_valued_entries(rng):
    """Global edge ids are assigned over the RAW COO order, zero-valued
    entries included — assigning after the zero filter shifted every later
    edge's id, silently applying edge_scale to the wrong edges."""
    n = 24
    row, col, val = _random_coo(rng, n, n, 150)
    val[3] = 0.0  # a zero-valued entry early in the raw order
    val[17] = 0.0
    scale = rng.uniform(0.5, 1.5, len(val)).astype(np.float32)
    mesh = make_mesh(n_data=2, n_model=4)
    mat = build_edge_sharded_spmm(row, col, val, (n, n), 4)
    fn = make_edge_sharded_spmm(mat, mesh, mode="scatter")
    x = rng.normal(size=(n, 5)).astype(np.float32)
    out = np.asarray(fn(shard_operand(x, mat, mesh), jnp.asarray(scale)))[:n]
    expect = _dense(row, col, val * scale, (n, n)) @ x
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("model_name", ["DOSE_aug", "DOSE_drop2"])
def test_edge_sharded_dose_step_matches_single_device(model_name):
    """Fully-sharded DOSE training (feature matrix + adjacency + contrastive
    VIEW graph + core table all sharded over 'model') computes the same
    full BPR+aux+InfoNCE loss as the single-device DOSEaugTrainer loss on
    the same batch, at the initial views AND after update_aug_adj (per-epoch
    regeneration reaches the sharded layout through prepare_view's local
    re-indexing of the SAME EdgeView the baked single-device buffers use)."""
    import optax

    from inductive_recommendation_tpu import get_dataset, get_model
    from inductive_recommendation_tpu.data.dataset import AuxiliaryDataset
    from inductive_recommendation_tpu.data.sampling import (
        build_sampler_state,
        sample_bpr_batch,
    )
    from inductive_recommendation_tpu.parallel import make_edge_sharded_dose_step
    from inductive_recommendation_tpu.train import losses as L

    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 48,
            "n_items": 40,
            "n_interactions": 650,
            "seed": 11,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )
    model = get_model(
        {
            "name": model_name,
            "embedding_size": 16,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 1.0,
            "aug_num": 12,
            "aug_rate": 0.5,
            "table_align": 1,
        },
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
    params0 = model.init_params(jax.random.key(3))
    l2_reg, aux_reg, c_reg, bs = 1e-4, 0.01, 0.05, 64

    def single_loss(p, buffers, rng):
        # split exactly like the sharded step (4-way) so both draw the
        # same main/aux batches
        rng_s, rng_a, _, _ = jax.random.split(rng, 4)
        users, pos, neg = sample_bpr_batch(sampler, rng_s, bs)
        a_users, a_pos, a_neg = sample_bpr_batch(aux_sampler, rng_a, bs)
        u, pr, nr, l2, closs = model.bpr_forward(
            p, users, pos, neg[:, 0], training=False, buffers=buffers
        )
        aux_l = L.aux_bpr_w(
            p["embedding"], p["w"], a_users, a_pos, a_neg[:, 0], model.user_dim
        )
        return (
            L.bpr_loss(u, pr, nr)
            + l2_reg * l2.mean()
            + aux_reg * aux_l
            + c_reg * closs.mean()
        )

    mesh = make_mesh(n_data=1, n_model=8)
    optimizer = optax.adam(1e-2)
    step, prepare_view, shard_model_params = make_edge_sharded_dose_step(
        model, mesh, optimizer, sampler, aux_sampler, bs, l2_reg, aux_reg, c_reg
    )

    for epoch in range(2):
        vstate = prepare_view(model.edge_views["aug_adj"])
        loss_ref = float(
            jax.jit(single_loss)(params0, model.buffers, jax.random.key(9 + epoch))
        )
        # fresh sharded params per comparison: the step donates its input
        params = shard_model_params(params0)
        opt_state = optimizer.init(params)
        with mesh:
            params, opt_state, loss = step(
                params,
                opt_state,
                jax.random.key(9 + epoch),
                vstate,
                alpha=model.alpha,
            )
        assert abs(float(loss) - loss_ref) < 2e-4, (
            model_name,
            epoch,
            float(loss),
            loss_ref,
        )
        assert not params["embedding"].sharding.is_fully_replicated
        # trainer epoch end (DOSEaugTrainer.train_one_epoch): anneal + view
        # regeneration; epoch 1 then compares post-update_aug_adj views with
        # a delta (DOSE_aug injects non-train pairs) / a random keep mask
        # (DOSE_drop2, delta budget 0)
        model.feat_mat_anneal()
        model.update_aug_adj(params0)


@pytest.mark.slow
@pytest.mark.parametrize(
    "model_name,mode,keys",
    [
        ("DOSE_aug_drop", "double_same", ("aug_adj",)),
        ("TEST2", "cross", ("aug_adj", "aug_adj2")),
        ("DOSE_test", "mean", ("aug_adj",)),
    ],
)
def test_edge_sharded_dose_multiterm_matches_single_device(model_name, mode, keys):
    """The two-draw / cross-view / view-mean contrastive modes match the
    single-device trainer losses on the same batch (dropout 0, where the
    reference's per-draw feature dropout is inert so both DOSE_aug_drop
    terms coincide)."""
    import optax

    from inductive_recommendation_tpu import get_dataset, get_model
    from inductive_recommendation_tpu.data.dataset import AuxiliaryDataset
    from inductive_recommendation_tpu.data.sampling import (
        build_sampler_state,
        sample_bpr_batch,
    )
    from inductive_recommendation_tpu.parallel import make_edge_sharded_dose_step
    from inductive_recommendation_tpu.train import losses as L

    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 48,
            "n_items": 40,
            "n_interactions": 650,
            "seed": 11,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )
    model = get_model(
        {
            "name": model_name,
            "embedding_size": 16,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 1.0,
            "aug_num": 10,
            "aug_rate": 0.5,
            "table_align": 1,
        },
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
    params0 = model.init_params(jax.random.key(3))
    l2_reg, aux_reg, c_reg, bs = 1e-4, 0.01, 0.05, 64
    n_split = 5 if mode in ("double_same", "cross") else 4

    def single_loss(p, buffers, rng):
        parts = jax.random.split(rng, n_split)
        users, pos, neg = sample_bpr_batch(sampler, parts[0], bs)
        a_users, a_pos, a_neg = sample_bpr_batch(aux_sampler, parts[1], bs)
        u, pr, nr, l2, closs = model.bpr_forward(
            p, users, pos, neg[:, 0], training=False, buffers=buffers
        )
        aux_l = L.aux_bpr_w(
            p["embedding"], p["w"], a_users, a_pos, a_neg[:, 0], model.user_dim
        )
        return (
            L.bpr_loss(u, pr, nr)
            + l2_reg * l2.mean()
            + aux_reg * aux_l
            + c_reg * closs.mean()
        )

    mesh = make_mesh(n_data=1, n_model=8)
    optimizer = optax.adam(1e-2)
    step, prepare_view, shard_model_params = make_edge_sharded_dose_step(
        model,
        mesh,
        optimizer,
        sampler,
        aux_sampler,
        bs,
        l2_reg,
        aux_reg,
        c_reg,
        contrastive=mode,
    )

    def vstate():
        states = tuple(prepare_view(model.edge_views[k]) for k in keys)
        return states if len(states) > 1 else states[0]

    for epoch in range(2):
        vs = vstate()
        loss_ref = float(
            jax.jit(single_loss)(params0, model.buffers, jax.random.key(9 + epoch))
        )
        params = shard_model_params(params0)
        opt_state = optimizer.init(params)
        with mesh:
            params, opt_state, loss = step(
                params, opt_state, jax.random.key(9 + epoch), vs, alpha=model.alpha
            )
        assert abs(float(loss) - loss_ref) < 3e-4, (
            model_name,
            epoch,
            float(loss),
            loss_ref,
        )
        model.feat_mat_anneal()
        model.update_aug_adj(params0)


@pytest.mark.slow
@pytest.mark.parametrize("model_name,mode", [("SGL", "cross"), ("HALF", "single")])
def test_edge_sharded_sgl_step_matches_single_device(model_name, mode):
    """SGL/HALF over the LightGCN base: the edge-sharded step (main adjacency
    + BOTH drop-view graphs + table sharded) computes the same
    BPR + rep-L2 + InfoNCE loss as the single-device SGLTrainer loss on the
    same batch, at the initial views AND after update_aug_adj."""
    import optax

    from inductive_recommendation_tpu import get_dataset, get_model
    from inductive_recommendation_tpu.data.sampling import (
        build_sampler_state,
        sample_bpr_batch,
    )
    from inductive_recommendation_tpu.parallel import make_edge_sharded_sgl_step
    from inductive_recommendation_tpu.train import losses as L

    ds = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 48,
            "n_items": 40,
            "n_interactions": 650,
            "seed": 11,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )
    model = get_model(
        {
            "name": model_name,
            "embedding_size": 16,
            "n_layers": 2,
            "aug_rate": 0.5,
            "table_align": 1,
        },
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    params0 = model.init_params(jax.random.key(3))
    l2_reg, c_reg, bs = 1e-4, 0.05, 64

    def single_loss(p, buffers, rng):
        # split exactly like the sharded step so both draw the same batch
        rng_s, _ = jax.random.split(rng)
        users, pos, neg = sample_bpr_batch(sampler, rng_s, bs)
        u, pr, nr, l2, closs = model.bpr_forward(
            p, users, pos, neg[:, 0], training=False, buffers=buffers
        )
        return L.bpr_loss(u, pr, nr) + l2_reg * l2.mean() + c_reg * closs.mean()

    mesh = make_mesh(n_data=1, n_model=8)
    optimizer = optax.adam(1e-2)
    step, prepare_view = make_edge_sharded_sgl_step(
        model, mesh, optimizer, sampler, bs, l2_reg, c_reg, contrastive=mode
    )
    keys = ("aug_adj1", "aug_adj2") if mode == "cross" else ("aug_adj1",)

    for epoch in range(2):
        states = tuple(prepare_view(model.edge_views[k]) for k in keys)
        vs = states if len(states) > 1 else states[0]
        loss_ref = float(
            jax.jit(single_loss)(params0, model.buffers, jax.random.key(9 + epoch))
        )
        from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency
        from inductive_recommendation_tpu.parallel import build_edge_sharded_spmm
        from inductive_recommendation_tpu.parallel.spmm import shard_operand

        r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
        adj = build_edge_sharded_spmm(
            r, c, v, (ds.n_users + ds.n_items,) * 2, mesh.shape["model"]
        )
        params = {"embedding": shard_operand(params0["embedding"], adj, mesh)}
        opt_state = optimizer.init(params)
        with mesh:
            params, opt_state, loss = step(
                params, opt_state, jax.random.key(9 + epoch), vs
            )
        assert abs(float(loss) - loss_ref) < 3e-4, (
            model_name,
            epoch,
            float(loss),
            loss_ref,
        )
        assert not params["embedding"].sharding.is_fully_replicated
        model.update_aug_adj()


def test_edge_sharded_hashdrop_consistent_and_unbiased(rng):
    """_wrap_dropout: (a) the forward/transpose sides of a shard draw the
    SAME mask per edge — grad of sum == the dropped matrix's column sums
    (the consistency dropout gradients require); (b) the kept pattern
    matches an explicit reconstruction from the layout's local eids; (c)
    bake_stacked_scale at scale==1 is the identity layout."""
    import jax

    from inductive_recommendation_tpu.ops.bucketed_spmm import _uniform_from_eid
    from inductive_recommendation_tpu.parallel.spmm import (
        _wrap,
        _wrap_dropout,
        bake_stacked_scale,
    )

    n, S, p = 48, 4, 0.5
    row, col, val = _random_coo(rng, n, n, 500)
    mesh = make_mesh(n_data=1, n_model=S, devices=jax.devices()[:S])
    mat = build_edge_sharded_spmm(row, col, val, (n, n), S)
    x = shard_operand(rng.standard_normal((n, 8)).astype(np.float32), mat, mesh)
    key = jax.random.key(7)
    kd = jax.random.key_data(key)

    fdrop = _wrap_dropout(mat, mesh, "model", "scatter", p)
    with mesh:
        out = jax.jit(fdrop)(mat.fwd, mat.bwd, kd, x)

    # explicit reconstruction: dense dropped matrix from per-shard eids
    dense = np.zeros((mat.n_rows_pad, mat.n_cols_pad), np.float32)
    blk = mat.block
    for s in range(S):
        shard_key = jax.random.fold_in(key, s)
        m = (col >= s * blk) & (col < (s + 1) * blk)
        rs_, cs_, vs_ = row[m], col[m], val[m]
        local_eid = np.arange(len(rs_))
        u = np.asarray(
            _uniform_from_eid(jax.random.key_data(shard_key), jnp.asarray(local_eid))
        )
        keep = u >= p
        dense[rs_, cs_] = np.where(keep, vs_ / (1 - p), 0.0)
    np.testing.assert_allclose(
        np.asarray(out), dense @ np.asarray(x), rtol=2e-4, atol=2e-5
    )

    # backward: same mask through the transpose side
    with mesh:
        g = jax.jit(
            jax.grad(lambda x: jnp.sum(fdrop(mat.fwd, mat.bwd, kd, x)))
        )(x)
    np.testing.assert_allclose(
        np.asarray(g), dense.sum(axis=0)[:, None].repeat(8, 1), rtol=2e-4, atol=2e-5
    )

    # bake at scale 1 == plain layout
    ones = jnp.ones(mat.eid_map.shape, jnp.float32)
    baked_fwd = jax.jit(lambda s, sc: bake_stacked_scale(s, sc, mesh, "model"))(
        mat.fwd, ones
    )
    plain = _wrap(mat, mesh, "model", "scatter")
    with mesh:
        o1 = jax.jit(plain)(mat.fwd, mat.bwd, None, x)
        o2 = jax.jit(plain)(baked_fwd, mat.bwd, None, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)
