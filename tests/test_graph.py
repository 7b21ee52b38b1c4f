"""Graph engine tests: adjacency builders vs scipy/dense oracles."""

import numpy as np
import scipy.sparse as sp

from inductive_recommendation_tpu.graph import (
    bipartite_edges,
    sym_normalized_adjacency,
    coo_from_edges,
    coo_to_device,
    ell_from_coo,
    aug_union_edges,
    drop_difference_edges,
    build_feat_matrix,
    device_sym_normalize,
)
from inductive_recommendation_tpu.graph.build import feat_values_for_alpha
from inductive_recommendation_tpu.graph.ranking import graph_rank_nodes, pagerank


def scipy_sym_norm(train_array, n_users, n_items):
    """Oracle mirroring reference model.py:89-98 exactly."""
    users, items = train_array[:, 0], train_array[:, 1]
    row = np.concatenate([users, items + n_users])
    col = np.concatenate([items + n_users, users])
    n = n_users + n_items
    adj = sp.coo_matrix(
        (np.ones(len(row)), (row, col)), shape=(n, n), dtype=np.float32
    ).tocsr()
    degree = np.maximum(1.0, np.array(adj.sum(axis=1)).squeeze())
    d_inv = np.power(degree, -0.5)
    d_mat = sp.diags(d_inv, format="csr", dtype=np.float32)
    return d_mat.dot(adj).dot(d_mat).toarray()


def test_sym_normalized_adjacency_matches_scipy(tiny_graph):
    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    dense = np.zeros((n, n), dtype=np.float64)
    np.add.at(dense, (row, col), val)
    oracle = scipy_sym_norm(train_array, n_users, n_items)
    np.testing.assert_allclose(dense, oracle, rtol=1e-5, atol=1e-6)


def test_coo_padding_and_device_roundtrip(tiny_graph):
    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    nnz_pad = len(row) + 37
    prow, pcol, pval = coo_from_edges(row, col, val, (n, n), nnz_pad=nnz_pad)
    assert len(prow) == nnz_pad
    adj = coo_to_device(prow, pcol, pval, (n, n))
    dense = np.asarray(adj.to_dense())
    oracle = scipy_sym_norm(train_array, n_users, n_items)
    np.testing.assert_allclose(dense, oracle, rtol=1e-5, atol=1e-6)


def test_ell_matches_coo(tiny_graph):
    train_array, n_users, n_items = tiny_graph
    row, col, val = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    ell = ell_from_coo(row, col, val, (n, n))
    dense_ell = np.zeros((n, n), dtype=np.float64)
    idx = np.asarray(ell.idx)
    v = np.asarray(ell.val)
    for r in range(n):
        np.add.at(dense_ell[r], idx[r], v[r])
    oracle = scipy_sym_norm(train_array, n_users, n_items)
    np.testing.assert_allclose(dense_ell, oracle, rtol=1e-5, atol=1e-6)


def test_device_sym_normalize_matches_host(tiny_graph):
    import jax.numpy as jnp

    train_array, n_users, n_items = tiny_graph
    hrow, hcol, hval = sym_normalized_adjacency(train_array, n_users, n_items)
    n = n_users + n_items
    # pad and renormalize on device
    nnz_pad = len(hrow) + 11
    prow, pcol, _ = coo_from_edges(
        hrow, hcol, np.ones(len(hrow)), (n, n), nnz_pad=nnz_pad
    )
    mask = np.zeros(nnz_pad, dtype=np.float32)
    # padding entries were placed where val==0 after sort; recompute mask:
    # an entry is live iff it appears in the host edge set
    live = set(zip(hrow.tolist(), hcol.tolist()))
    for i, (r, c) in enumerate(zip(prow.tolist(), pcol.tolist())):
        if (r, c) in live:
            mask[i] = 1.0
            live.discard((r, c))
    dval = device_sym_normalize(
        jnp.asarray(prow), jnp.asarray(pcol), jnp.asarray(mask), n
    )
    dense = np.zeros((n, n), dtype=np.float64)
    np.add.at(dense, (prow, pcol), np.asarray(dval))
    oracle = scipy_sym_norm(train_array, n_users, n_items)
    np.testing.assert_allclose(dense, oracle, rtol=1e-5, atol=1e-6)


def test_aug_union_and_difference():
    train = np.array([[0, 0], [0, 1], [1, 2], [2, 0]])
    aug = np.array([[0, 1], [2, 2]])
    union = aug_union_edges(train, aug)
    assert {tuple(e) for e in union} == {(0, 0), (0, 1), (1, 2), (2, 0), (2, 2)}
    diff = drop_difference_edges(train, aug)
    assert {tuple(e) for e in diff} == {(0, 0), (1, 2), (2, 0)}


def test_feat_matrix_matches_dense_oracle(tiny_graph):
    train_array, n_users, n_items = tiny_graph
    # core = 70% of users/items by degree
    ranked_u = np.arange(n_users)
    ranked_i = np.arange(n_items)
    cu = ranked_u[: int(n_users * 0.7)]
    ci = ranked_i[: int(n_items * 0.7)]
    user_map = np.full(n_users, -1, dtype=np.int64)
    user_map[cu] = np.arange(len(cu))
    item_map = np.full(n_items, -1, dtype=np.int64)
    item_map[ci] = np.arange(len(ci))

    row, col, counts, row_sum = build_feat_matrix(
        train_array, n_users, n_items, user_map, item_map
    )
    user_dim, item_dim = len(cu), len(ci)
    n_cols = user_dim + item_dim + 2
    dense = np.zeros((n_users + n_items, n_cols))
    np.add.at(dense, (row, col), counts)

    # oracle: reference model.py:4160-4172 loop semantics
    oracle = np.zeros_like(dense)
    for user, item in train_array:
        if item_map[item] >= 0:
            oracle[user, user_dim + item_map[item]] += 1
        if user_map[user] >= 0:
            oracle[n_users + item, user_map[user]] += 1
    oracle[:n_users, user_dim + item_dim] += 1
    oracle[n_users:, user_dim + item_dim + 1] += 1

    np.testing.assert_allclose(dense, oracle)
    np.testing.assert_allclose(row_sum, oracle.sum(axis=1), rtol=1e-6)

    # annealed values: row_sum^((alpha-1)/2-0.5) per edge
    import jax.numpy as jnp

    alpha = 0.9
    vals = np.asarray(
        feat_values_for_alpha(
            jnp.asarray(row), jnp.asarray(counts), jnp.asarray(row_sum), alpha
        )
    )
    expect = counts * row_sum[row] ** ((alpha - 1.0) / 2.0 - 0.5)
    np.testing.assert_allclose(vals, expect, rtol=1e-5)


class _FakeDataset:
    def __init__(self, train_array, n_users, n_items):
        self.train_array = train_array
        self.n_users = n_users
        self.n_items = n_items


def test_rank_nodes_degree_and_sort(tiny_graph):
    train_array, n_users, n_items = tiny_graph
    ds = _FakeDataset(train_array, n_users, n_items)
    ru, ri = graph_rank_nodes(ds, "degree")
    # degree oracle
    u_deg = np.bincount(train_array[:, 0], minlength=n_users)
    i_deg = np.bincount(train_array[:, 1], minlength=n_items)
    assert u_deg[ru[0]] == u_deg.max()
    assert i_deg[ri[0]] == i_deg.max()
    ru2, ri2 = graph_rank_nodes(ds, "sort")
    assert len(ru2) == n_users and len(ri2) == n_items


def test_pagerank_matches_networkx(tiny_graph):
    import networkx as nx

    train_array, n_users, n_items = tiny_graph
    row, col = bipartite_edges(train_array, n_users, n_items)
    n = n_users + n_items
    p = pagerank(row, col, np.ones(len(row)), n)
    g = nx.Graph()
    g.add_edges_from(zip(row.tolist(), col.tolist()))
    pr = nx.pagerank(g)
    # nodes absent from the graph get no networkx score; compare present ones
    for node, score in pr.items():
        assert abs(p[node] - score) < 1e-4


def test_aug_drop_rank_nodes(tiny_graph):
    """graph_aug_rank_nodes == ranking over the deduped train∪aug edge set
    (utils.py:217-246 builds that adjacency from a set of tuples);
    graph_drop_rank_nodes ranks over the provided drop edges (the reference
    path at utils.py:249 is dead code - it crashes on a missing argument)."""
    from inductive_recommendation_tpu.graph.ranking import (
        graph_aug_rank_nodes,
        graph_drop_rank_nodes,
        rank_nodes_from_edges,
    )

    train_array, n_users, n_items = tiny_graph
    ds = _FakeDataset(train_array, n_users, n_items)
    aug = np.array([[0, n_items - 1], [n_users - 1, 0]])

    for metric in ("degree", "sort", "page_rank"):
        ru, ri = graph_aug_rank_nodes(ds, metric, aug)
        union = aug_union_edges(train_array, aug)
        ru2, ri2 = rank_nodes_from_edges(union, n_users, n_items, metric)
        assert np.array_equal(ru, ru2) and np.array_equal(ri, ri2)

    kept = drop_difference_edges(train_array, np.array([list(train_array[0])]))
    ru, ri = graph_drop_rank_nodes(ds, "degree", kept)
    u_deg = np.bincount(kept[:, 0], minlength=n_users)
    assert u_deg[ru[0]] == u_deg.max()


def test_svd_rank_nodes_vs_dense_oracle(tiny_graph):
    """svd_rank_nodes == the reference's commented-out theoretical ranking
    (utils.py:143-199, first greedy_or_sort definition) re-run with dense
    numpy oracles: a full SVD truncated to k and O(n^2) loop selection."""
    from inductive_recommendation_tpu.graph import svd_rank_nodes

    train_array, n_users, n_items = tiny_graph
    dense = np.zeros((n_users, n_items))
    np.add.at(dense, (train_array[:, 0], train_array[:, 1]), 1.0)
    k = min(64, min(n_users, n_items) - 1)
    u_full, _, vt_full = np.linalg.svd(dense, full_matrices=False)

    def oracle(adj, factor, metric):
        norm_sq = np.linalg.norm(factor, axis=1) ** 2
        co = adj @ adj.T
        if metric == "sort":
            return co.sum(axis=1) * norm_sq
        n = adj.shape[0]
        metrics = adj.sum(axis=1) * norm_sq
        order = np.zeros(n)
        popped = np.zeros(n, dtype=bool)
        for nu in range(n):
            i = int(np.argmin(np.where(popped, np.inf, metrics)))
            popped[i] = True
            order[i] = nu
            for j in range(n):
                if not popped[j] and co[i, j] > 0:
                    metrics[j] += norm_sq[j] * co[i, j]
        return order

    for metric in ("sort", "greedy"):
        ru, ri = svd_rank_nodes(train_array, n_users, n_items, metric)
        um = oracle(dense, u_full[:, :k], metric)
        im = oracle(dense.T, vt_full[:k].T, metric)
        assert np.array_equal(ru, np.argsort(um)[::-1])
        assert np.array_equal(ri, np.argsort(im)[::-1])
