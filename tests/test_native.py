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


def test_parse_adjacency_native_matches_python(tmp_path):
    from inductive_recommendation_tpu.native import (
        native_available,
        parse_adjacency_file,
    )

    p = tmp_path / "train.txt"
    p.write_text("0 3 1 2\n1 7\n2\n3 0 0 5\n")
    flat, offs = parse_adjacency_file(str(p))
    assert offs.tolist() == [0, 3, 4, 4, 7]
    assert flat.tolist() == [3, 1, 2, 7, 0, 0, 5]
    assert native_available()  # g++ is in this image; the C path must load


def test_parse_gowalla_native_matches_numpy(tmp_path):
    from inductive_recommendation_tpu.native import (
        _load,
        parse_gowalla_file,
    )
    import numpy as np

    p = tmp_path / "Gowalla_totalCheckins.txt"
    rows = [
        "0\t2010-10-19T23:55:27Z\t30.2\t-97.7\t22847",
        "17\t2009-02-28T01:02:03Z\t0.0\t0.0\t5",
        "3\t2012-12-31T23:59:59Z\t-1.5\t2.25\t0",
    ]
    p.write_text("\n".join(rows) + "\n")
    u, i, t = parse_gowalla_file(str(p))
    assert u.tolist() == [0, 17, 3] and i.tolist() == [22847, 5, 0]
    # oracle: numpy datetime64 epoch seconds (UTC)
    expect = np.array(
        ["2010-10-19T23:55:27", "2009-02-28T01:02:03", "2012-12-31T23:59:59"],
        dtype="datetime64[s]",
    ).astype(np.int64)
    assert t.tolist() == expect.tolist()


def test_parse_adjacency_blank_lines_match_python(tmp_path):
    """Interior blank lines are EMPTY ROWS (line order is the user id);
    leading/trailing blanks are dropped — exactly the python fallback's
    read().strip().split('\\n'). The native parser used to skip interior
    blanks, shifting every later user's items onto the wrong user."""
    from inductive_recommendation_tpu.native import _load, parse_adjacency_file

    path = tmp_path / "train.txt"
    path.write_text("\n0 5 3 7\n\n2 1\n3\n  \n4 2 2\n\n\n")
    flat, offs = parse_adjacency_file(str(path))
    # fallback oracle (force the python path)
    lines = path.read_text().strip().split("\n")
    exp_rows = [[int(t) for t in l.split(" ")[1:] if t] for l in lines]
    exp_flat = [i for r in exp_rows for i in r]
    exp_offs = np.cumsum([0] + [len(r) for r in exp_rows]).tolist()
    assert _load() is not None  # the native path must be the one under test
    assert flat.tolist() == exp_flat, (flat.tolist(), exp_flat)
    assert offs.tolist() == exp_offs, (offs.tolist(), exp_offs)


def test_parse_gowalla_rejects_trailing_garbage(tmp_path):
    """'123 junk' in the item field must fail loudly (the reference's int()
    on the tab-split field raises), not silently truncate to 123."""
    from inductive_recommendation_tpu.native import _load
    import ctypes

    lib = _load()
    assert lib is not None
    path = tmp_path / "g.txt"
    path.write_text("0\t2010-10-19T23:55:27Z\t30.2\t-97.8\t123 junk\n")
    cap = 8
    u = np.empty(cap, np.int64)
    i = np.empty(cap, np.int64)
    t = np.empty(cap, np.int64)
    p64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    n = lib.parse_gowalla(str(path).encode(), cap, p64(u), p64(i), p64(t))
    assert n == -2


def test_parse_adjacency_falls_back_on_nonstandard_whitespace(tmp_path):
    """Leading spaces shift the fallback's discarded empty token (every
    numeric token is then an item) and tabs make its int() raise — the
    native parser must return the fallback's exact result for the former
    and not silently re-interpret either."""
    from inductive_recommendation_tpu.native import parse_adjacency_file

    p = tmp_path / "train.txt"
    p.write_text("1 7 8\n 0 5\n2 9\n")
    flat, offs = parse_adjacency_file(str(p))
    # fallback semantics: line.split(' ')[1:] — ' 0 5' discards the EMPTY
    # first token, so both 0 and 5 are items
    assert flat.tolist() == [7, 8, 0, 5, 9]
    assert offs.tolist() == [0, 2, 4, 5]

    p2 = tmp_path / "tabs.txt"
    p2.write_text("0\t3\t4\n1 7\n")
    flat2, offs2 = parse_adjacency_file(str(p2))
    # fallback: '0\t3\t4'.split(' ') is ONE token — the discarded user id —
    # so the tab line is an empty row; the native parser must defer, not
    # parse the tab-separated numbers as items
    assert flat2.tolist() == [7]
    assert offs2.tolist() == [0, 0, 1]


def _yelp_line(u, b, stars, date, text='some "quoted" text, with commas'):
    return (
        '{"review_id":"r","user_id":"%s","business_id":"%s","stars":%s,'
        '"useful":0,"funny":0,"cool":0,"text":"%s","date":"%s"}' % (u, b, stars, text, date)
    )


def _write_yelp(tmp_path, lines):
    d = tmp_path / "yelp"
    d.mkdir(exist_ok=True)
    (d / "yelp_academic_dataset_review.json").write_text("\n".join(lines) + "\n")
    return str(d)


def test_yelp_native_matches_python(tmp_path, monkeypatch):
    """The native Yelp parser must yield a dataset identical to the exact
    json.loads python path — including the tricky bits: free text containing
    a fake '"date":"..."' pattern, integer star values, filtered low-star
    rows, and repeated (u, b) pairs keeping the earliest timestamp."""
    from inductive_recommendation_tpu.data import dataset as D

    rng = np.random.default_rng(0)
    users = [f"u{k:02d}" for k in range(12)]
    bizs = [f"b{k:02d}" for k in range(9)]
    lines = []
    for _ in range(300):
        u = users[rng.integers(len(users))]
        b = bizs[rng.integers(len(bizs))]
        stars = ["1.0", "2.0", "3.0", "4.0", "5.0", "4", "3.5"][rng.integers(7)]
        date = "20%02d-%02d-%02d %02d:%02d:%02d" % (
            rng.integers(10, 20), rng.integers(1, 13), rng.integers(1, 28),
            rng.integers(24), rng.integers(60), rng.integers(60),
        )
        text = 'nice place, \\"date\\":\\"2001-01-01 00:00:00 haha'
        lines.append(_yelp_line(u, b, stars, date, text))
    path = _write_yelp(tmp_path, lines)
    cfg = {"name": "YelpDataset", "path": path, "min_inter": 2,
           "split_ratio": [0.7, 0.15, 0.15]}

    ds_native = D.YelpDataset(dict(cfg))
    monkeypatch.setattr(D, "parse_yelp_file", lambda p: None)
    ds_python = D.YelpDataset(dict(cfg))

    assert ds_native.n_users == ds_python.n_users
    assert ds_native.n_items == ds_python.n_items
    assert ds_native.train_data == ds_python.train_data
    assert ds_native.val_data == ds_python.val_data
    assert ds_native.test_data == ds_python.test_data
    np.testing.assert_array_equal(
        np.asarray(ds_native.train_array), np.asarray(ds_python.train_array)
    )


def test_yelp_native_declines_weird_input(tmp_path):
    """Ids with escapes / malformed dates must make the native parser return
    None (python-fallback signal), never silently misparse."""
    from inductive_recommendation_tpu.native import parse_yelp_file

    path = _write_yelp(
        tmp_path, [_yelp_line('u\\"x', "b0", "4.0", "2015-01-01 00:00:00")]
    )
    assert parse_yelp_file(path + "/yelp_academic_dataset_review.json") is None
    path = _write_yelp(tmp_path, [_yelp_line("u0", "b0", "4.0", "2015-1-1 0:0:0")])
    assert parse_yelp_file(path + "/yelp_academic_dataset_review.json") is None


def test_amazon_native_matches_python(tmp_path, monkeypatch):
    from inductive_recommendation_tpu.data import dataset as D

    rng = np.random.default_rng(1)
    users = [f"A{k:03d}XYZ" for k in range(12)]
    items = [f"00000{k:03d}" for k in range(9)]
    lines = []
    t = 1_400_000_000
    for _ in range(300):
        u = users[rng.integers(len(users))]
        i = items[rng.integers(len(items))]
        r = ["1.0", "2.0", "3.0", "4.0", "5.0"][rng.integers(5)]
        t += int(rng.integers(1, 1000))
        lines.append(f"{u},{i},{r},{t}")
    d = tmp_path / "amazon"
    d.mkdir()
    (d / "ratings_Books.csv").write_text("\n".join(lines) + "\n")
    cfg = {"name": "AmazonDataset", "path": str(d), "min_inter": 2,
           "split_ratio": [0.7, 0.15, 0.15]}

    ds_native = D.AmazonDataset(dict(cfg))
    monkeypatch.setattr(D, "parse_amazon_file", lambda p: None)
    ds_python = D.AmazonDataset(dict(cfg))

    assert ds_native.n_users == ds_python.n_users
    assert ds_native.n_items == ds_python.n_items
    assert ds_native.train_data == ds_python.train_data
    assert ds_native.val_data == ds_python.val_data
    assert ds_native.test_data == ds_python.test_data


def test_amazon_native_declines_extra_fields(tmp_path):
    from inductive_recommendation_tpu.native import parse_amazon_file

    d = tmp_path / "amazon2"
    d.mkdir()
    (d / "ratings_Books.csv").write_text("u0,i0,4.0,123,extra\n")
    assert parse_amazon_file(str(d / "ratings_Books.csv")) is None
