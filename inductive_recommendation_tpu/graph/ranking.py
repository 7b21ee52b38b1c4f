"""Node-importance rankings for IGCN core (template) selection.

Reference: utils.py:186-215 (``graph_rank_nodes``) with three metrics:
- ``degree``: row sums of the bipartite adjacency
- ``sort`` / ``greedy``: column sums of the row-L1-normalized adjacency
- ``page_rank``: PageRank over the undirected bipartite graph (the reference
  calls networkx; here it is a power iteration, so it runs vectorized and can
  be lifted onto the device SpMM if graphs grow)

Returns (ranked_users, ranked_items): node ids sorted by descending metric.
"""

from __future__ import annotations

import numpy as np

from inductive_recommendation_tpu.graph.build import bipartite_edges


def _coalesced_bipartite(train_array, n_users, n_items):
    row, col = bipartite_edges(train_array, n_users, n_items)
    n = n_users + n_items
    keys = row * n + col
    uniq, counts = np.unique(keys, return_counts=True)
    return (uniq // n).astype(np.int64), (uniq % n).astype(np.int64), counts.astype(np.float64)


def pagerank(row, col, weight, n_nodes, alpha=0.85, tol=1e-6, max_iter=100):
    """Power-iteration PageRank matching networkx defaults (utils.py:205-210).

    networkx's convergence test is sum(|p - p_prev|) < n * tol.
    """
    rowsum = np.zeros(n_nodes, dtype=np.float64)
    np.add.at(rowsum, row, weight)
    dangling = rowsum == 0.0
    out_w = weight / np.where(rowsum[row] == 0.0, 1.0, rowsum[row])
    p = np.full(n_nodes, 1.0 / n_nodes, dtype=np.float64)
    for _ in range(max_iter):
        contrib = np.zeros(n_nodes, dtype=np.float64)
        np.add.at(contrib, col, p[row] * out_w)
        dangling_mass = p[dangling].sum()
        p_new = alpha * (contrib + dangling_mass / n_nodes) + (1.0 - alpha) / n_nodes
        if np.abs(p_new - p).sum() < n_nodes * tol:
            return p_new
        p = p_new
    # the reference's networkx call raises PowerIterationFailedConvergence
    # here (utils.py:207-210) — proceeding with an unconverged vector would
    # silently change the core (template) selection
    raise RuntimeError(
        f"PageRank power iteration failed to converge in {max_iter} iterations"
    )


def graph_rank_nodes(dataset, ranking_metric: str):
    """Rank users and items by descending importance (utils.py:186-215)."""
    return rank_nodes_from_edges(
        dataset.train_array, dataset.n_users, dataset.n_items, ranking_metric
    )


def graph_aug_rank_nodes(dataset, ranking_metric: str, aug_idx):
    """Rank over the train ∪ injected-edge graph (utils.py:217-246); used by
    DOSE_aug2's aug feature matrix when feature_ratio < 1 (model.py:941).
    The reference builds that adjacency from a set of (u, i) tuples
    (utils.py:75), so duplicates collapse to weight 1 — aug_union_edges
    reproduces that."""
    from inductive_recommendation_tpu.graph.build import aug_union_edges

    edges = aug_union_edges(np.asarray(dataset.train_array), np.asarray(aug_idx))
    return rank_nodes_from_edges(
        edges, dataset.n_users, dataset.n_items, ranking_metric
    )


def graph_drop_rank_nodes(dataset, ranking_metric: str, drop_edges=None):
    """Rank over a dropped-edge graph (utils.py:248-277). The reference path
    is dead code: utils.py:249 calls generate_drop_daj_mat(dataset) without
    its required aug_rate argument, so any DOSE_drop* model configured with
    feature_ratio < 1 raises TypeError. Here the caller passes the drop
    view's [m, 2] edge list explicitly; with drop_edges=None this falls back
    to the full train graph (the reference's evident intent modulo its bug)."""
    edges = (
        np.asarray(drop_edges) if drop_edges is not None else dataset.train_array
    )
    return rank_nodes_from_edges(
        edges, dataset.n_users, dataset.n_items, ranking_metric
    )


def svd_rank_nodes(edge_array, n_users, n_items, ranking_metric: str, rank=64):
    """SVD-based theoretical node ranking (reference utils.py:143-199,
    commented out — "This is for theoretical analysis").

    The reference's disabled path factorizes the user-item part-adjacency
    with ``torch.svd_lowrank(part_adj, 64)`` (utils.py:196) and scores each
    side with ``greedy_or_sort`` (first definition, utils.py:146-168):

    - ``sort``: metric_i = rowsum(A Aᵀ)_i * ||U_i||² — co-interaction mass
      weighted by the squared norm of the node's rank-``rank`` singular
      factor row.
    - ``greedy``: iterative selection — repeatedly pop the node with the
      currently SMALLEST accumulated metric; popping node i bumps each
      co-interacting neighbor j by ||U_j||² * (A Aᵀ)_ij. A node's metric is
      its pop position, so the LAST node popped ranks first.

    Divergences (documented, both in dead reference code):
    - the factorization is an exact truncated Lanczos SVD
      (scipy.sparse.linalg.svds) instead of torch's randomized sketch;
    - the reference's greedy loop re-inserts the just-popped node through
      its own diagonal entry of A Aᵀ (utils.py:163-166 discard a stale key,
      then add), so some nodes are popped twice and others never — here a
      popped node stays popped (the evident intent);
    - the comment block contains a SECOND ``greedy_or_sort`` definition
      (utils.py:171-183) that shadows the first and ignores the metric
      entirely; we implement the first, which is the one with distinct
      sort/greedy semantics;
    - equal-metric ties: the heap breaks them by node index, while the
      reference's SortedList ``pop(0)`` breaks them by insertion order —
      nodes with identical accumulated metrics (common when ``norm_sq`` is
      ~0 for disconnected/low-rank nodes) can pop in a different order.

    Host-side preprocessing (like the ranking it extends): runs once before
    core selection, never inside a jit. O(nnz(A Aᵀ)) memory for greedy —
    and O(nnz(A Aᵀ) · log n) pure-Python heap time: at full Gowalla scale
    the user co-interaction matrix has tens of millions of nonzeros, so the
    greedy mode takes minutes to hours on the host. Acceptable for a
    run-once theoretical-analysis tool; it is not on any training path.
    """
    import heapq

    import scipy.sparse as sp
    from scipy.sparse.linalg import svds

    row, col, counts = _coalesced_bipartite(
        np.asarray(edge_array), n_users, n_items
    )
    if ranking_metric not in ("sort", "greedy"):
        raise ValueError(
            f"unknown ranking_metric {ranking_metric!r} "
            "(expected 'sort' or 'greedy')"
        )
    ui = row < n_users  # user→item half of the symmetric bipartite adjacency
    part = sp.csr_matrix(
        (counts[ui], (row[ui], col[ui] - n_users)), shape=(n_users, n_items)
    )
    k = min(rank, min(part.shape) - 1)
    if k < 1:
        raise ValueError(f"graph too small for a rank-{rank} SVD: {part.shape}")
    u, _, vt = svds(part.astype(np.float64), k=k)

    def greedy_or_sort(adj, factor):
        norm_sq = np.linalg.norm(factor, axis=1) ** 2
        co = (adj @ adj.T).tocsr()
        if ranking_metric == "sort":
            return np.asarray(co.sum(axis=1)).squeeze(axis=1) * norm_sq

        n = adj.shape[0]
        metrics = np.asarray(adj.sum(axis=1)).squeeze(axis=1) * norm_sq
        order = np.zeros(n, dtype=np.float64)
        heap = [(metrics[i], i) for i in range(n)]
        heapq.heapify(heap)
        popped = np.zeros(n, dtype=bool)
        for nu in range(n):
            while True:
                m, i = heapq.heappop(heap)
                if not popped[i] and m == metrics[i]:  # skip stale entries
                    break
            popped[i] = True
            order[i] = nu
            lo, hi = co.indptr[i], co.indptr[i + 1]
            for j, w in zip(co.indices[lo:hi], co.data[lo:hi]):
                if popped[j]:
                    continue
                metrics[j] += norm_sq[j] * w
                heapq.heappush(heap, (metrics[j], j))
        return order

    user_metrics = greedy_or_sort(part, u)
    item_metrics = greedy_or_sort(part.T.tocsr(), vt.T)
    ranked_users = np.argsort(user_metrics)[::-1].copy()
    ranked_items = np.argsort(item_metrics)[::-1].copy()
    return ranked_users, ranked_items


def rank_nodes_from_edges(edge_array, n_users, n_items, ranking_metric: str):
    """Core ranking over an arbitrary [m, 2] (user, item) edge list."""
    row, col, counts = _coalesced_bipartite(
        np.asarray(edge_array), n_users, n_items
    )
    n = n_users + n_items

    if ranking_metric == "degree":
        metrics = np.zeros(n, dtype=np.float64)
        np.add.at(metrics, row, counts)
    elif ranking_metric in ("sort", "greedy"):
        # column sums of the row-L1-normalized adjacency (utils.py:202-204)
        rowsum = np.zeros(n, dtype=np.float64)
        np.add.at(rowsum, row, counts)
        norm_w = counts / np.where(rowsum[row] == 0.0, 1.0, rowsum[row])
        metrics = np.zeros(n, dtype=np.float64)
        np.add.at(metrics, col, norm_w)
    elif ranking_metric == "page_rank":
        metrics = pagerank(row, col, counts, n)
    else:
        raise ValueError(
            f"unknown ranking_metric {ranking_metric!r} "
            "(expected 'degree', 'sort', 'greedy' or 'page_rank')"
        )

    user_metrics, item_metrics = metrics[:n_users], metrics[n_users:]
    ranked_users = np.argsort(user_metrics)[::-1].copy()
    ranked_items = np.argsort(item_metrics)[::-1].copy()
    return ranked_users, ranked_items
