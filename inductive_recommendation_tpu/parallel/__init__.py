"""Distributed execution: device meshes, sharded embedding tables, sharded
train/eval steps.

The reference is single-device (SURVEY §2.7: no torch.distributed anywhere);
this package supplies the north-star parallelism for the TPU build:

- mesh axes ('data', 'model'): batch data-parallelism x row-sharded
  user/item embedding tables
- shardings are expressed as NamedSharding / sharding constraints inside one
  jit — XLA inserts the all-to-all / all-gather / psum collectives over ICI
  (the "pick a mesh, annotate, let XLA do collectives" recipe)
- exact sharded top-k retrieval with k-way merge lives in ops/topk.py and is
  driven from eval via shard_map
- edge-block-sharded SpMM (parallel/spmm.py) scales the GRAPH across devices
  — the sequence-parallel analog for this workload (SURVEY §2.7)
"""

from inductive_recommendation_tpu.parallel.comms import (
    CollectiveStats,
    collective_stats,
)
from inductive_recommendation_tpu.parallel.mesh import make_mesh, shard_params
from inductive_recommendation_tpu.parallel.step import (
    make_edge_sharded_bpr_step,
    make_edge_sharded_dose_step,
    make_edge_sharded_att_igcn_step,
    make_edge_sharded_igcn_step,
    make_edge_sharded_sgl_step,
    make_sharded_bpr_step,
    make_sharded_igcn_step,
)
from inductive_recommendation_tpu.parallel.eval import (
    make_sharded_recommender,
    sharded_recommend_all_users,
)
from inductive_recommendation_tpu.parallel.spmm import (
    build_edge_sharded_spmm,
    make_edge_sharded_propagation,
    make_edge_sharded_spmm,
    shard_operand,
)

__all__ = [
    "CollectiveStats",
    "collective_stats",
    "make_mesh",
    "shard_params",
    "make_edge_sharded_bpr_step",
    "make_edge_sharded_dose_step",
    "make_edge_sharded_att_igcn_step",
    "make_edge_sharded_igcn_step",
    "make_edge_sharded_sgl_step",
    "make_sharded_bpr_step",
    "make_sharded_igcn_step",
    "make_sharded_recommender",
    "sharded_recommend_all_users",
    "build_edge_sharded_spmm",
    "make_edge_sharded_spmm",
    "make_edge_sharded_propagation",
    "shard_operand",
]
