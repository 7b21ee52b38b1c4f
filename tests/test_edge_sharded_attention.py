"""Edge-sharded attention-weighted SpMM (parallel/attention.py) + the
fully-sharded AttIGCN step: parity against the single-device kernel/loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from inductive_recommendation_tpu.ops import build_bucketed_spmm
from inductive_recommendation_tpu.ops.attention_spmm import attention_spmm
from inductive_recommendation_tpu.parallel import (
    build_edge_sharded_spmm,
    make_mesh,
)
from inductive_recommendation_tpu.parallel.attention import (
    build_attention_perm,
    make_edge_sharded_attention,
)
from inductive_recommendation_tpu.parallel.spmm import shard_operand

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n_rows, n_cols, nnz, h, dh, dv = 24, 20, 150, 2, 4, 5
    row = rng.integers(0, n_rows, nnz)
    col = rng.integers(0, n_cols, nnz)
    pairs = np.unique(np.stack([row, col], 1), axis=0)
    row, col = pairs[:, 0], pairs[:, 1]
    val = rng.uniform(0.5, 1.5, len(row)).astype(np.float32)
    q = rng.normal(size=(n_rows, h, dh)).astype(np.float32)
    # the sharded kernel takes the FOLDED query (keys = linear map of the
    # value rows, the AttIGCN structure): wk [dv, h*dh], bk [h*dh]
    wk = rng.normal(size=(dv, h * dh)).astype(np.float32)
    bk = rng.normal(size=(h * dh,)).astype(np.float32)
    v = rng.normal(size=(n_cols, dv)).astype(np.float32)
    w = rng.normal(size=(n_rows, dv)).astype(np.float32)
    return (row, col, val, (n_rows, n_cols)), q, wk, bk, v, w


def _fold(q, wk, bk, dv, h, dh):
    qk = jnp.einsum("nhd,vhd->nhv", q, jnp.asarray(wk).reshape(dv, h, dh))
    qb = jnp.einsum("nhd,hd->nh", q, jnp.asarray(bk).reshape(h, dh))
    return qk, qb


def _sharded(setup_t, n_shards):
    (row, col, val, shape), q, wk, bk, v, _ = setup_t
    h, dh, dv = q.shape[1], q.shape[2], v.shape[1]
    mesh = make_mesh(n_data=8 // n_shards, n_model=n_shards)
    mat = build_edge_sharded_spmm(row, col, val, shape, n_shards)
    perm = build_attention_perm(mat)
    fn = make_edge_sharded_attention(mat, mesh, temperature=3.7)
    qp = np.zeros((mat.n_rows_pad,) + q.shape[1:], np.float32)
    qp[: shape[0]] = q
    qs = jax.device_put(
        jnp.asarray(qp), NamedSharding(mesh, P("model", None, None))
    )
    qk, qb = _fold(qs, wk, bk, dv, h, dh)
    qk = jax.device_put(qk, NamedSharding(mesh, P("model", None, None)))
    qb = jax.device_put(qb, NamedSharding(mesh, P("model", None)))
    return mesh, mat, perm, fn, qk, qb, shard_operand(v, mat, mesh)


def _ref_out(setup_t):
    """Single-device oracle: the general-k kernel fed the materialized key
    table k = sg(v) @ wk + bk (the structure the fold exploits)."""
    (row, col, val, shape), q, wk, bk, v, _ = setup_t
    flat = build_bucketed_spmm(row, col, val, shape)
    k = jnp.asarray(v) @ jnp.asarray(wk) + jnp.asarray(bk)
    return np.asarray(attention_spmm(flat, q, k, v, 3.7))


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_attention_forward_matches_single_device(setup, n_shards):
    """Cross-shard row softmax (max + denom all-reduces) over the folded
    query reproduces the single-device dense masked row softmax with the
    materialized key table."""
    shape = setup[0][3]
    ref = _ref_out(setup)
    mesh, mat, perm, fn, qk, qb, vs = _sharded(setup, n_shards)
    with mesh:
        out = np.asarray(jax.jit(fn)(mat.fwd, perm, qk, qb, vs))[: shape[0]]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_attention_grads_match_single_device(setup):
    """XLA autodiff through the sharded softmax (all_gather/psum/
    psum_scatter transposes) gives the single-device gradients for q, wk
    and v (key path detached, as in AttIGCN)."""
    (row, col, val, shape), q, wk, bk, v, w = setup
    n_rows, n_cols = shape
    h, dh, dv = q.shape[1], q.shape[2], v.shape[1]
    flat = build_bucketed_spmm(row, col, val, shape)

    def loss_ref(q_, wk_, v_):
        k_ = jax.lax.stop_gradient(v_) @ wk_ + bk
        return jnp.sum(attention_spmm(flat, q_, k_, v_, 3.7) * w)

    gref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(wk), jnp.asarray(v)
    )
    mesh, mat, perm, fn, _, _, vs = _sharded(setup, 8)
    wp = np.zeros((mat.n_rows_pad, v.shape[1]), np.float32)
    wp[:n_rows] = w
    qp = np.zeros((mat.n_rows_pad,) + q.shape[1:], np.float32)
    qp[: shape[0]] = q
    qs = jax.device_put(
        jnp.asarray(qp), NamedSharding(mesh, P("model", None, None))
    )

    def loss_sh(q_, wk_, v_):
        qk, qb = _fold(q_, wk_, bk, dv, h, dh)
        return jnp.sum(fn(mat.fwd, perm, qk, qb, v_) * wp)

    with mesh:
        gsh = jax.jit(jax.grad(loss_sh, argnums=(0, 1, 2)))(
            qs, jnp.asarray(wk), vs
        )
    for name, a, b, n in (
        ("dq", gsh[0], gref[0], n_rows),
        ("dwk", gsh[1], gref[1], len(np.asarray(gref[1]))),
        ("dv", gsh[2], gref[2], n_cols),
    ):
        np.testing.assert_allclose(
            np.asarray(a)[:n], np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name
        )


def test_edge_sharded_att_igcn_step_matches_single_device():
    """Fully-sharded AttIGCN training (feat + adjacency + attention softmax +
    table sharded) computes the single-device IGCNTrainer loss on the same
    batch."""
    import optax

    from inductive_recommendation_tpu import get_dataset, get_model
    from inductive_recommendation_tpu.data.dataset import AuxiliaryDataset
    from inductive_recommendation_tpu.data.sampling import (
        build_sampler_state,
        sample_bpr_batch,
    )
    from inductive_recommendation_tpu.graph import build_feat_matrix
    from inductive_recommendation_tpu.parallel import (
        make_edge_sharded_att_igcn_step,
    )
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
            "name": "AttIGCN",
            "embedding_size": 16,
            "n_layers": 2,
            "dropout": 0.0,
            "n_heads": 2,
            "table_align": 1,
        },
        ds,
    )
    sampler = build_sampler_state(ds.train_data, ds.n_items)
    aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
    aux_sampler = build_sampler_state(aux.train_data, aux.n_items)
    params0 = model.init_params(jax.random.key(3))
    l2_reg, aux_reg, bs = 1e-4, 0.01, 64

    def single_loss(p, rng):
        rng_s, rng_a, rng_m = jax.random.split(rng, 3)
        users, pos, neg = sample_bpr_batch(sampler, rng_s, bs)
        a_users, a_pos, a_neg = sample_bpr_batch(aux_sampler, rng_a, bs)
        u, pr, nr, l2 = model.bpr_forward(
            p, users, pos, neg[:, 0], rng=rng_m, training=True,
            buffers=model.buffers,
        )
        aux_l = L.aux_bpr_w(
            p["embedding"], p["w"], a_users, a_pos, a_neg[:, 0], model.user_dim
        )
        return L.bpr_loss(u, pr, nr) + l2_reg * l2.mean() + aux_reg * aux_l

    loss_ref = float(jax.jit(single_loss)(params0, jax.random.key(9)))

    mesh = make_mesh(n_data=1, n_model=8)
    optimizer = optax.adam(1e-2)
    step = make_edge_sharded_att_igcn_step(
        model, mesh, optimizer, sampler, aux_sampler, bs, l2_reg, aux_reg
    )
    frow, fcol, fval, _ = build_feat_matrix(
        ds.train_array, ds.n_users, ds.n_items, model.user_map, model.item_map
    )
    femat = build_edge_sharded_spmm(
        frow, fcol, fval, (ds.n_users + ds.n_items, model.feat_n_cols), 8
    )
    params = {
        k: (
            shard_operand(jnp.asarray(v)[: model.feat_n_cols], femat, mesh)
            if k == "embedding"
            else jax.tree_util.tree_map(jnp.array, v)
        )
        for k, v in params0.items()
    }
    opt_state = optimizer.init(params)
    with mesh:
        params, opt_state, loss = step(params, opt_state, jax.random.key(9))
    assert abs(float(loss) - loss_ref) < 3e-4, (float(loss), loss_ref)
    assert not params["embedding"].sharding.is_fully_replicated
