"""Native graph-core: compiles, matches numpy fallbacks and the reference's
python k-core semantics."""

import numpy as np

from inductive_recommendation_tpu.graph.build import (
    aug_union_edges as edge_union_np,
    drop_difference_edges as edge_diff_np,
)
from inductive_recommendation_tpu.native import kcore_masks, native_available


def reference_kcore(user_sets, item_sets, min_inter):
    """Direct port of the reference dict-loop (dataset.py:66-92)."""
    user_sets = {u: set(s) for u, s in user_sets.items()}
    item_sets = {i: set(s) for i, s in item_sets.items()}
    not_stop = True
    while not_stop:
        not_stop = False
        for user in list(user_sets.keys()):
            if len(user_sets[user]) < min_inter:
                not_stop = True
                for item in user_sets[user]:
                    item_sets[item].remove(user)
                user_sets.pop(user)
        for item in list(item_sets.keys()):
            if len(item_sets[item]) < min_inter:
                not_stop = True
                for user in item_sets[item]:
                    user_sets[user].remove(item)
                item_sets.pop(item)
    return set(user_sets.keys()), set(item_sets.keys())


def test_native_compiles():
    assert native_available(), "native graph-core failed to compile"


def test_kcore_matches_reference(rng):
    n_users, n_items, E = 120, 90, 900
    users = rng.integers(0, n_users, E)
    items = rng.integers(0, n_items, E)
    pairs = np.unique(np.stack([users, items], axis=1), axis=0)
    user_sets, item_sets = {}, {}
    for u, i in pairs:
        user_sets.setdefault(int(u), set()).add(int(i))
        item_sets.setdefault(int(i), set()).add(int(u))
    for min_inter in (2, 3, 5):
        ku, ki = kcore_masks(pairs[:, 0], pairs[:, 1], n_users, n_items, min_inter)
        ref_u, ref_i = reference_kcore(user_sets, item_sets, min_inter)
        assert set(np.nonzero(ku)[0].tolist()) == ref_u, min_inter
        assert set(np.nonzero(ki)[0].tolist()) == ref_i, min_inter


def test_edge_set_ops(rng):
    a = rng.integers(0, 50, (300, 2))
    b = rng.integers(0, 50, (100, 2))
    union = edge_union_np(a, b)
    oracle_u = np.unique(np.concatenate([a, b]).astype(np.int64), axis=0)
    np.testing.assert_array_equal(union, oracle_u)

    diff = edge_diff_np(a, b)
    a_u = np.unique(a.astype(np.int64), axis=0)
    b_set = {tuple(e) for e in b.tolist()}
    oracle_d = np.asarray([e for e in a_u.tolist() if tuple(e) not in b_set])
    np.testing.assert_array_equal(diff, oracle_d)


def test_dataset_kcore_via_native():
    from inductive_recommendation_tpu.data.dataset import BasicDataset

    ds = BasicDataset({"name": "BasicDataset", "min_inter": 2})
    user_sets = {10: {0, 1}, 11: {1}, 12: {0, 1, 2}, 17: {2, 3}}
    item_sets = {}
    for u, s in user_sets.items():
        for i in s:
            item_sets.setdefault(i, set()).add(u)
    user_map, item_map = ds.remove_sparse_ui(
        {u: set(s) for u, s in user_sets.items()},
        {i: set(s) for i, s in item_sets.items()},
    )
    ref_u, ref_i = reference_kcore(user_sets, item_sets, 2)
    assert set(user_map.keys()) == ref_u
    assert set(item_map.keys()) == ref_i
    # first-seen-order dense re-indexing
    assert sorted(user_map.values()) == list(range(len(user_map)))
    assert list(user_map.values()) == sorted(user_map.values())
