"""Data layer tests: k-core, split semantics, file format parity, sampler."""

import pytest
import numpy as np
import jax

from inductive_recommendation_tpu.data import (
    BasicDataset,
    ProcessedDataset,
    AuxiliaryDataset,
    SyntheticDataset,
    get_dataset,
    pad_user_lists,
    build_sampler_state,
    sample_bpr_batch,
)


def test_kcore_filtering():
    ds = BasicDataset({"name": "BasicDataset", "min_inter": 2})
    user_sets = {0: {0, 1}, 1: {1}, 2: {0, 1, 2}, 7: {2, 3}}
    item_sets = {}
    for u, items in user_sets.items():
        for i in items:
            item_sets.setdefault(i, set()).add(u)
    user_map, item_map = ds.remove_sparse_ui(
        {u: set(s) for u, s in user_sets.items()},
        {i: set(s) for i, s in item_sets.items()},
    )
    # user 1 (deg 1) removed; then item 3 kept only if deg>=2 etc.
    for u, s in user_sets.items():
        if u in user_map:
            kept = {i for i in s if i in item_map}
            assert len(kept) >= 2
    # dense re-index
    assert sorted(user_map.values()) == list(range(len(user_map)))
    assert sorted(item_map.values()) == list(range(len(item_map)))
    assert ds.n_users == len(user_map) and ds.n_items == len(item_map)


def test_chronological_split_and_quirk():
    ds = BasicDataset(
        {"name": "BasicDataset", "split_ratio": [0.8, 0.1, 0.1]}
    )
    ds.n_users, ds.n_items = 2, 30
    # user 0: 20 interactions with shuffled times; user 1: 5 interactions
    times0 = np.random.default_rng(0).permutation(20)
    ds.user_inter_lists = [
        [[i, int(t)] for i, t in zip(range(20), times0)],
        [[i, i] for i in range(5)],
    ]
    ds.generate_data()
    order0 = np.argsort(times0)
    assert ds.train_data[0] == [int(i) for i in order0[:16]]
    assert ds.val_data[0] == [int(i) for i in order0[16:18]]
    assert ds.test_data[0] == [int(i) for i in order0[18:]]
    # user 1: int(5*0.1)=0 test items -> reference quirks (dataset.py:110-111):
    # val slice lst[4:-0] == lst[4:0] == [] (EMPTY, not the remainder) and
    # test slice lst[-0:] == the whole list
    assert ds.train_data[1] == [0, 1, 2, 3]
    assert ds.val_data[1] == []
    assert ds.test_data[1] == [0, 1, 2, 3, 4]
    # train_array covers train_data
    assert len(ds.train_array) == 16 + 4


def test_processed_dataset_roundtrip(tmp_path):
    d = tmp_path / "proc"
    d.mkdir()
    (d / "train.txt").write_text("0 3 1 7\n1 2\n2\n")
    (d / "val.txt").write_text("0 9\n1\n2 0\n")
    (d / "test.txt").write_text("0 5\n1 11\n2\n")
    ds = get_dataset({"name": "ProcessedDataset", "path": str(d)})
    assert ds.n_users == 3
    assert ds.n_items == 12  # max id 11 + 1
    assert ds.train_data == [[3, 1, 7], [2], []]
    assert np.asarray(ds.train_array).tolist() == [[0, 3], [0, 1], [0, 7], [1, 2]]
    assert len(ds) == 4


def test_synthetic_dataset_pipeline():
    ds = SyntheticDataset(
        {
            "name": "SyntheticDataset",
            "n_users": 50,
            "n_items": 40,
            "n_interactions": 600,
            "seed": 3,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 3,
        }
    )
    assert ds.n_users > 0 and ds.n_items > 0
    assert len(ds.train_array) > 0
    # ids dense
    arr = np.asarray(ds.train_array)
    assert arr[:, 0].max() < ds.n_users and arr[:, 1].max() < ds.n_items


def test_auxiliary_dataset_remap():
    parent = BasicDataset({"name": "BasicDataset"})
    parent.n_users, parent.n_items = 4, 5
    parent.train_data = [[0, 1], [2], [3, 4], []]
    parent.train_array = [[u, i] for u in range(4) for i in parent.train_data[u]]
    user_map = {0: 0, 2: 1}  # core users 0,2
    item_map = {1: 0, 3: 1, 4: 2}  # core items 1,3,4
    aux = AuxiliaryDataset(parent, user_map, item_map)
    assert aux.n_users == 2 and aux.n_items == 3
    assert aux.train_data == [[0], [1, 2]]
    assert len(aux) == len(parent)


def test_pad_user_lists():
    padded, lengths = pad_user_lists([[3, 1], [], [2]], n_items=5)
    assert padded.shape == (3, 2)
    np.testing.assert_array_equal(lengths, [2, 0, 1])
    np.testing.assert_array_equal(padded[0], [1, 3])
    np.testing.assert_array_equal(padded[1], [5, 5])


def test_device_sampler_semantics():
    train_data = [[0, 1, 2], [], [4, 5], [0]]
    n_items = 6
    state = build_sampler_state(train_data, n_items)
    users, pos, neg = jax.jit(
        lambda r: sample_bpr_batch(state, r, 512, neg_ratio=2)
    )(jax.random.key(0))
    users, pos, neg = map(np.asarray, (users, pos, neg))
    assert neg.shape == (512, 2)
    # user 1 has no train items and must never appear
    assert (users != 1).all()
    sets = [set(l) for l in train_data]
    for b in range(512):
        assert int(pos[b]) in sets[users[b]]
        for j in range(2):
            assert int(neg[b, j]) not in sets[users[b]]
    # user distribution ~ uniform over valid users
    counts = np.bincount(users, minlength=4)[np.array([0, 2, 3])]
    assert counts.min() > 100


def test_device_sampler_pos_uniformity():
    train_data = [[0, 1, 2, 3]]
    state = build_sampler_state(train_data, 100)
    _, pos, _ = sample_bpr_batch(state, jax.random.key(1), 4000)
    counts = np.bincount(np.asarray(pos), minlength=4)
    assert counts.min() > 800  # ~1000 each


def test_output_dataset_roundtrip(tmp_path):
    """output_dataset writes the reference text format (dataset.py:40-44,
    133-137) and ProcessedDataset reads it back identically."""
    from inductive_recommendation_tpu import get_dataset

    src = get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 25,
            "n_items": 30,
            "n_interactions": 260,
            "seed": 5,
            "split_ratio": [0.6, 0.2, 0.2],
            "min_inter": 2,
        }
    )
    out = tmp_path / "dump"
    src.output_dataset(str(out))
    # reference row shape: "user item item ..."
    first = (out / "train.txt").read_text().splitlines()[0].split(" ")
    assert first[0] == "0"

    back = get_dataset({"name": "ProcessedDataset", "path": str(out)})
    assert back.n_users == src.n_users
    assert back.train_data == [list(r) for r in src.train_data]
    assert back.val_data == [list(r) for r in src.val_data]
    assert back.test_data == [list(r) for r in src.test_data]
    assert np.asarray(back.train_array).tolist() == (
        np.asarray(src.train_array).tolist()
    )


def test_sampler_complement_exact_distribution():
    """Regression: the complement-rank binary search must not overshoot when
    the rank lands past the LAST positive — previously the item right after
    the last positive was never sampled, later ids shifted +1, and ids could
    reach n_items (out of catalog)."""
    train_data = [[0, 1, 2, 3, 4], [3]]
    n_items = 100
    state = build_sampler_state(train_data, n_items)
    _, _, neg = jax.jit(
        lambda r: sample_bpr_batch(state, r, 4096, neg_ratio=2)
    )(jax.random.key(5))
    users, pos, neg = sample_bpr_batch(state, jax.random.key(5), 8192)
    users, neg = np.asarray(users), np.asarray(neg).ravel()
    assert neg.max() < n_items and neg.min() >= 0
    u0 = neg[users == 0]
    counts = np.bincount(u0, minlength=n_items)
    # items 0-4 are positives of user 0: never negative
    assert counts[:5].sum() == 0
    # item 5 (right after the last positive) must be drawn like any other
    expected = len(u0) / 95
    assert counts[5] > 0.4 * expected, (counts[5], expected)
    # uniformity over the complement (loose chi-square-ish bound)
    live = counts[5:]
    assert live.min() > 0.3 * expected and live.max() < 2.5 * expected


@pytest.mark.slow
def test_sampler_dedups_duplicate_train_items(rng):
    """Duplicate (u, i) pairs (reachable through external train.txt files)
    must not skew exact-complement negative sampling: with duplicates the
    rank map P[j]-j goes non-monotone and some items are NEVER sampled."""
    import jax
    from inductive_recommendation_tpu.data.sampling import (
        build_sampler_state,
        sample_bpr_batch,
    )

    n_items = 8
    train = [[5, 5], [1, 1, 1, 3]]
    state = build_sampler_state(train, n_items)
    assert int(state.deg[0]) == 1 and int(state.deg[1]) == 2
    seen = set()
    for s in range(64):
        users, pos, neg = sample_bpr_batch(state, jax.random.key(s), 32)
        u = np.asarray(users)
        n = np.asarray(neg)[:, 0]
        p = np.asarray(pos)
        for uu, pp, nn in zip(u, p, n):
            assert nn < n_items
            if uu == 0:
                assert pp == 5 and nn != 5
                seen.add(int(nn))
    # all 7 non-positives of user 0 eventually appear (item 4 was never
    # sampled before the dedup fix)
    assert seen == {0, 1, 2, 3, 4, 6, 7}


def test_sampler_full_catalog_user_stays_in_range():
    """A user holding the entire catalog has no true negative; the sampler
    must emit an in-catalog id, not n_items."""
    import jax
    from inductive_recommendation_tpu.data.sampling import (
        build_sampler_state,
        sample_bpr_batch,
    )

    n_items = 4
    state = build_sampler_state([[0, 1, 2, 3]], n_items)
    _, _, neg = sample_bpr_batch(state, jax.random.key(0), 64)
    assert int(np.asarray(neg).max()) < n_items


def test_build_user_inter_lists_matches_per_item_form(rng):
    from inductive_recommendation_tpu.data.dataset import (
        build_user_inter_lists,
        update_user_inter_lists,
    )

    n_users, n_items = 12, 9
    triples = [
        (int(rng.integers(0, n_users + 2)), int(rng.integers(0, n_items + 2)),
         int(rng.integers(0, 1000)))
        for _ in range(400)
    ]
    user_map = {u: u for u in range(n_users)}
    item_map = {i: i for i in range(n_items)}
    ref = [[] for _ in range(n_users)]
    for u, i, t in triples:
        update_user_inter_lists(u, i, t, user_map, item_map, ref)
    bulk = build_user_inter_lists(iter(triples), user_map, item_map, n_users)
    assert ref == bulk


def test_pad_helpers_reject_narrow_pad_to(rng):
    import pytest
    from inductive_recommendation_tpu.data.dataset import (
        device_padded_from_lists,
        pad_user_lists,
    )

    lists = [[0, 1, 2], [3]]
    with pytest.raises(ValueError):
        device_padded_from_lists(lists, 5, pad_to=2)
    with pytest.raises(ValueError):
        pad_user_lists(lists, 5, pad_to=2)
