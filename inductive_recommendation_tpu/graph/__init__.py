"""Sparse bipartite-graph engine: containers, builders, normalization, ranking.

One shared engine replaces the per-model copy-pasted adjacency code of the
reference (model.py repeats ``generate_graph``/``get_rep`` ~20x); every model
here consumes the same static-shape padded sparse containers.
"""

from inductive_recommendation_tpu.graph.sparse import (
    SparseCOO,
    SparseELL,
    coo_from_edges,
    coo_to_device,
    ell_from_coo,
)
from inductive_recommendation_tpu.graph.build import (
    bipartite_edges,
    sym_normalized_adjacency,
    sym_normalize_values,
    row_l1_normalize_values,
    aug_union_edges,
    drop_sample_edges,
    drop_union_edges,
    drop_difference_edges,
    build_feat_matrix,
    device_sym_normalize,
)
from inductive_recommendation_tpu.graph.ranking import (
    graph_aug_rank_nodes,
    graph_drop_rank_nodes,
    graph_rank_nodes,
    rank_nodes_from_edges,
    svd_rank_nodes,
)

__all__ = [
    "SparseCOO",
    "SparseELL",
    "coo_from_edges",
    "coo_to_device",
    "ell_from_coo",
    "bipartite_edges",
    "sym_normalized_adjacency",
    "sym_normalize_values",
    "row_l1_normalize_values",
    "aug_union_edges",
    "drop_sample_edges",
    "drop_union_edges",
    "drop_difference_edges",
    "build_feat_matrix",
    "device_sym_normalize",
    "graph_aug_rank_nodes",
    "graph_drop_rank_nodes",
    "graph_rank_nodes",
    "rank_nodes_from_edges",
    "svd_rank_nodes",
]
