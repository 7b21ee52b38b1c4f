"""Datasets: raw parsers, k-core filtering, chronological split.

Reproduces the semantics of reference dataset.py:
- ``remove_sparse_ui``: iterative k-core until every kept user/item has
  >= min_inter interactions, then dense re-indexing   (dataset.py:66-92)
- ``generate_data``: per-user chronological split      (dataset.py:94-114)
- ``ProcessedDataset``: pre-split train/val/test.txt,
  n_items = max id + 1 across splits                   (dataset.py:140-164)
- raw parsers for Gowalla / Yelp / Amazon-Books        (dataset.py:167-255)
- ``AuxiliaryDataset``: train interactions remapped
  into a model's core (template) id space              (dataset.py:258-273)

Host-side data prep is numpy; the per-batch sampling path lives in
``data/sampling.py`` and runs jitted on device.

Known reference quirks reproduced intentionally: in ``generate_data`` a
user whose ``int(n_inter * split_ratio[2]) == 0`` gets their *entire*
interaction list as test data (python ``lst[-0:]`` is the whole list,
dataset.py:111) AND an *empty* val split (``lst[n_train:-0]`` is
``lst[n_train:0]`` == ``[]``, dataset.py:110). With the usual min_inter
k-core this path is rare, but short-history users are exactly the inductive
cold-start population, so both quirks are mirrored byte-exactly and covered
by the direct reference-source oracle (tests/test_reference_oracles.py
feeds users that hit the branch).
"""

from __future__ import annotations

import json
import os
import time as time_mod

import numpy as np

from inductive_recommendation_tpu.native import (
    parse_adjacency_file,
    parse_amazon_file,
    parse_gowalla_file,
    parse_yelp_file,
)


def get_dataset(config):
    """Registry factory keyed by config['name'] (dataset.py:10-14)."""
    config = dict(config)
    cls = DATASETS[config["name"]]
    return cls(config)


def update_ui_sets(u, i, user_inter_sets, item_inter_sets):
    user_inter_sets.setdefault(u, set()).add(i)
    item_inter_sets.setdefault(i, set()).add(u)


def update_user_inter_lists(u, i, t, user_map, item_map, user_inter_lists):
    """Dedupe repeated (u, i), keeping the earliest timestamp
    (dataset.py:28-37). Per-item reference-parity form; the parsers use the
    O(1)-per-interaction bulk :func:`build_user_inter_lists`."""
    if u in user_map and i in item_map:
        lst = user_inter_lists[user_map[u]]
        for entry in lst:
            if entry[0] == item_map[i]:
                entry[1] = min(entry[1], t)
                return
        lst.append([item_map[i], t])


def build_user_inter_lists(triples, user_map, item_map, n_users):
    """Bulk form of :func:`update_user_inter_lists`: identical output
    (first-seen insertion order per user, earliest timestamp kept) at O(1)
    per interaction — the reference's per-interaction linear scan is
    O(sum deg^2) in pure Python, hours of host time on power-law users at
    Amazon/Gowalla scale."""
    user_inter_lists = [[] for _ in range(n_users)]
    by_item = [{} for _ in range(n_users)]
    for u, i, t in triples:
        cu = user_map.get(u)
        if cu is None:
            continue
        ci = item_map.get(i)
        if ci is None:
            continue
        entry = by_item[cu].get(ci)
        if entry is not None:
            if t < entry[1]:
                entry[1] = t
        else:
            entry = [ci, t]
            user_inter_lists[cu].append(entry)
            by_item[cu][ci] = entry
    return user_inter_lists


def output_data(file_path, data):
    """'user item item ...' rows (dataset.py:40-44)."""
    with open(file_path, "w") as f:
        for user in range(len(data)):
            u_items = [str(user)] + [str(item) for item in data[user]]
            f.write(" ".join(u_items) + "\n")


class BasicDataset:
    """Base dataset: interaction lists + split + train_array.

    Unlike the reference (a torch ``Dataset`` whose ``__getitem__`` does
    per-worker negative sampling, dataset.py:119-131), sampling here is a
    device-side jitted function — see ``data/sampling.py``. ``__len__``
    still reports len(train_array) so epoch sizes match.
    """

    def __init__(self, dataset_config):
        self.config = dataset_config
        self.name = dataset_config["name"]
        self.min_interactions = dataset_config.get("min_inter")
        self.split_ratio = dataset_config.get("split_ratio")
        self.negative_sample_ratio = dataset_config.get("neg_ratio", 1)
        self.shuffle = dataset_config.get("shuffle", False)
        self.n_users = 0
        self.n_items = 0
        self.user_inter_lists = None
        self.train_data = None
        self.val_data = None
        self.test_data = None
        self.train_array = None

    def _init_from_interned(self, users_raw, items_raw, ts_raw):
        """Finish construction from KEPT interactions with dense-interned ids
        (the native parsers' output). Interning is injective and downstream
        re-indexes in first-seen order (remove_sparse_ui), so the result is
        identical to parsing the raw string ids."""
        ul, il, tl = users_raw.tolist(), items_raw.tolist(), ts_raw.tolist()
        user_inter_sets, item_inter_sets = {}, {}
        for u, i in zip(ul, il):
            update_ui_sets(u, i, user_inter_sets, item_inter_sets)
        user_map, item_map = self.remove_sparse_ui(user_inter_sets, item_inter_sets)
        self.user_inter_lists = build_user_inter_lists(
            zip(ul, il, tl), user_map, item_map, self.n_users
        )
        self.generate_data()

    # -- k-core filtering (dataset.py:66-92) --------------------------------
    def remove_sparse_ui(self, user_inter_sets, item_inter_sets):
        """Iterative k-core: drop users/items with < min_inter interactions
        until a fixed point, then dense re-index in first-seen order.

        The k-core of a graph is unique, so peeling order doesn't change the
        surviving set; the surviving ids are numbered in the dicts' insertion
        order exactly as the reference's dict iteration does. The peeling
        itself runs in the native graph-core (C++, O(E)); the reference's
        python dict loops take minutes on raw Gowalla/Yelp/Amazon scale.
        """
        from inductive_recommendation_tpu.native import kcore_masks

        if self.min_interactions is None:
            raise ValueError(
                f"dataset '{self.name}' applies k-core filtering and requires "
                "'min_inter' in its config (reference config.py sets it per "
                "dataset, e.g. 10 for Gowalla)"
            )
        users_order = list(user_inter_sets.keys())
        items_order = list(item_inter_sets.keys())
        uidx = {u: j for j, u in enumerate(users_order)}
        iidx = {i: j for j, i in enumerate(items_order)}
        eu = np.empty(sum(len(s) for s in user_inter_sets.values()), dtype=np.int64)
        ei = np.empty_like(eu)
        pos = 0
        for u, s in user_inter_sets.items():
            for i in s:
                eu[pos] = uidx[u]
                ei[pos] = iidx[i]
                pos += 1
        keep_u, keep_i = kcore_masks(
            eu, ei, len(users_order), len(items_order), self.min_interactions
        )
        user_map = {}
        for j, u in enumerate(users_order):
            if keep_u[j]:
                user_map[u] = len(user_map)
        item_map = {}
        for j, i in enumerate(items_order):
            if keep_i[j]:
                item_map[i] = len(item_map)
        self.n_users = len(user_map)
        self.n_items = len(item_map)
        return user_map, item_map

    # -- chronological split (dataset.py:94-114) ----------------------------
    def generate_data(self):
        self.train_data = [[] for _ in range(self.n_users)]
        self.val_data = [[] for _ in range(self.n_users)]
        self.test_data = [[] for _ in range(self.n_users)]
        self.train_array = []
        average_inters = []
        for user in range(self.n_users):
            self.user_inter_lists[user].sort(key=lambda entry: entry[1])
            if self.shuffle:
                # reference parity (dataset.py:102-103): the GLOBAL np.random
                # stream, seeded by utils.run.set_seed — shuffled splits are
                # reproducible only when set_seed ran first, exactly as there
                np.random.shuffle(self.user_inter_lists[user])
            n_inter_items = len(self.user_inter_lists[user])
            average_inters.append(n_inter_items)
            n_train_items = int(n_inter_items * self.split_ratio[0])
            n_test_items = int(n_inter_items * self.split_ratio[2])
            lst = self.user_inter_lists[user]
            self.train_data[user] += [it[0] for it in lst[:n_train_items]]
            # reference slices lst[n_train:-n_test] / lst[-n_test:]
            # (dataset.py:110-111); for n_test_items == 0 those are python
            # lst[n:0] == [] and lst[-0:] == the whole list, so a
            # short-history user gets an EMPTY val split and their entire
            # list as test (quirks reproduced, see module docstring)
            self.val_data[user] += [it[0] for it in lst[n_train_items:-n_test_items]]
            self.test_data[user] += [it[0] for it in lst[-n_test_items:]]
        for user in range(self.n_users):
            self.train_array.extend([[user, item] for item in self.train_data[user]])
        avg = float(np.mean(average_inters)) if average_inters else 0.0
        print(
            "Users {:d}, Items {:d}, Average number of interactions {:.3f}, "
            "Total interactions {:.1f}".format(
                self.n_users, self.n_items, avg, avg * self.n_users
            )
        )

    def __len__(self):
        return len(self.train_array)

    def output_dataset(self, path):
        if not os.path.exists(path):
            os.mkdir(path)
        output_data(os.path.join(path, "train.txt"), self.train_data)
        output_data(os.path.join(path, "val.txt"), self.val_data)
        output_data(os.path.join(path, "test.txt"), self.test_data)


class ProcessedDataset(BasicDataset):
    """Pre-split text files; the only dataset class reachable from the
    reference config grids (dataset.py:140-164, config.py:2)."""

    def __init__(self, dataset_config):
        super().__init__(dataset_config)
        path = dataset_config["path"]
        self.train_data, flat, offs = self._read(os.path.join(path, "train.txt"))
        self.val_data, _, _ = self._read(os.path.join(path, "val.txt"))
        self.test_data, _, _ = self._read(os.path.join(path, "test.txt"))
        assert len(self.train_data) == len(self.val_data)
        assert len(self.train_data) == len(self.test_data)
        self.n_users = len(self.train_data)
        users = np.repeat(np.arange(self.n_users, dtype=np.int64), np.diff(offs))
        self.train_array = np.stack([users, flat], axis=1)

    def _read(self, file_path):
        # native C parser with python fallback (native/graph_core.cpp);
        # reference semantics (dataset.py:145-164): leading user token
        # discarded, line order = user id, n_items = max id + 1 across files
        flat, offs = parse_adjacency_file(file_path)
        if len(flat):
            self.n_items = max(self.n_items, int(flat.max()) + 1)
        lists = [
            flat[offs[u] : offs[u + 1]].tolist() for u in range(len(offs) - 1)
        ]
        return lists, flat, offs

    def read_data(self, file_path):
        return self._read(file_path)[0]


class GowallaDataset(BasicDataset):
    """Gowalla_totalCheckins.txt: TSV (user, time, lat, lon, item)
    (dataset.py:167-189)."""

    def __init__(self, dataset_config):
        super().__init__(dataset_config)
        input_file_path = os.path.join(
            dataset_config["path"], "Gowalla_totalCheckins.txt"
        )
        # native fixed-format scan (python strptime is minutes at 6.4M
        # lines); timestamps are UTC epoch seconds — the reference's
        # time.mktime (dataset.py:185) was host-timezone dependent, and only
        # the ordering feeds the chronological split
        users_raw, items_raw, ts_raw = parse_gowalla_file(input_file_path)
        ul, il, tl = users_raw.tolist(), items_raw.tolist(), ts_raw.tolist()
        user_inter_sets, item_inter_sets = {}, {}
        for u, i in zip(ul, il):
            update_ui_sets(u, i, user_inter_sets, item_inter_sets)
        user_map, item_map = self.remove_sparse_ui(user_inter_sets, item_inter_sets)
        self.user_inter_lists = build_user_inter_lists(
            zip(ul, il, tl), user_map, item_map, self.n_users
        )
        self.generate_data()


class YelpDataset(BasicDataset):
    """yelp_academic_dataset_review.json stream; keep stars > 3
    (dataset.py:192-225).

    Divergences from the reference, both deliberate: the ~7M-line JSON is
    decoded ONCE (the kept (user, business, date) triples are cached between
    the two passes — JSON decoding dominates load time), and timestamps use
    calendar.timegm (UTC) instead of the host-timezone-dependent time.mktime
    (dataset.py:221) — same fix as the Gowalla parser; only ordering feeds
    the chronological split."""

    def __init__(self, dataset_config):
        super().__init__(dataset_config)
        import calendar

        input_file_path = os.path.join(
            dataset_config["path"], "yelp_academic_dataset_review.json"
        )
        # native fast path: field-scan + string interning in C++ (json.loads
        # per line dominates load time at the ~7M-line full file); declines
        # (None) on anything surprising, falling back to the exact json path
        parsed = parse_yelp_file(input_file_path)
        if parsed is not None:
            self._init_from_interned(*parsed)
            return
        user_inter_sets, item_inter_sets = {}, {}
        kept = []
        with open(input_file_path, "r") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                record = json.loads(line)
                if float(record["stars"]) > 3.0:
                    kept.append(
                        (record["user_id"], record["business_id"], record["date"])
                    )
                    update_ui_sets(
                        record["user_id"],
                        record["business_id"],
                        user_inter_sets,
                        item_inter_sets,
                    )
        user_map, item_map = self.remove_sparse_ui(user_inter_sets, item_inter_sets)
        self.user_inter_lists = build_user_inter_lists(
            (
                (
                    u,
                    i,
                    int(
                        calendar.timegm(
                            time_mod.strptime(date, "%Y-%m-%d %H:%M:%S")
                        )
                    ),
                )
                for u, i, date in kept
            ),
            user_map,
            item_map,
            self.n_users,
        )
        self.generate_data()


class AmazonDataset(BasicDataset):
    """ratings_Books.csv: (user, item, rating, ts); keep rating > 3
    (dataset.py:228-255)."""

    def __init__(self, dataset_config):
        super().__init__(dataset_config)
        input_file_path = os.path.join(dataset_config["path"], "ratings_Books.csv")
        parsed = parse_amazon_file(input_file_path)
        if parsed is not None:
            self._init_from_interned(*parsed)
            return
        user_inter_sets, item_inter_sets = {}, {}
        with open(input_file_path, "r") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                u, i, r, _ = line.split(",")
                if float(r) > 3.0:
                    update_ui_sets(u, i, user_inter_sets, item_inter_sets)
        user_map, item_map = self.remove_sparse_ui(user_inter_sets, item_inter_sets)

        def triples():
            with open(input_file_path, "r") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    u, i, r, t = line.split(",")
                    if float(r) > 3.0:
                        yield u, i, int(t)

        self.user_inter_lists = build_user_inter_lists(
            triples(), user_map, item_map, self.n_users
        )
        self.generate_data()


class SyntheticDataset(BasicDataset):
    """Power-law random bipartite graph with synthetic timestamps.

    Not in the reference (which ships no data); used by tests and benchmarks
    to exercise the full BasicDataset pipeline (k-core, chronological split)
    at any scale without dataset downloads.

    Config keys: n_users, n_items, n_interactions, seed, split_ratio,
    optional min_inter (k-core applied when set).
    """

    def __init__(self, dataset_config):
        super().__init__(dataset_config)
        rng = np.random.default_rng(dataset_config.get("seed", 0))
        n_users = dataset_config["n_users"]
        n_items = dataset_config["n_items"]
        n_inter = dataset_config["n_interactions"]
        # zipfian-ish popularity for users and items
        u_w = (1.0 / np.arange(1, n_users + 1)) ** 0.6
        i_w = (1.0 / np.arange(1, n_items + 1)) ** 0.8
        users = rng.choice(n_users, size=n_inter, p=u_w / u_w.sum())
        items = rng.choice(n_items, size=n_inter, p=i_w / i_w.sum())
        times = rng.integers(0, 10_000_000, size=n_inter)

        user_inter_sets, item_inter_sets = {}, {}
        for u, i in zip(users.tolist(), items.tolist()):
            update_ui_sets(u, i, user_inter_sets, item_inter_sets)
        if self.min_interactions:
            user_map, item_map = self.remove_sparse_ui(
                user_inter_sets, item_inter_sets
            )
        else:
            user_map = {u: idx for idx, u in enumerate(sorted(user_inter_sets))}
            item_map = {i: idx for idx, i in enumerate(sorted(item_inter_sets))}
            self.n_users, self.n_items = len(user_map), len(item_map)

        self.user_inter_lists = build_user_inter_lists(
            zip(users.tolist(), items.tolist(), times.tolist()),
            user_map,
            item_map,
            self.n_users,
        )
        self.generate_data()


class AuxiliaryDataset(BasicDataset):
    """Train interactions remapped to a model's core (template) id space
    (dataset.py:258-273). ``user_map``/``item_map`` may be dicts (reference
    form) or dense -1-padded arrays (this framework's form)."""

    def __init__(self, dataset, user_map, item_map):
        user_map = _as_map_array(user_map, dataset.n_users)
        item_map = _as_map_array(item_map, dataset.n_items)
        self.n_users = int((user_map >= 0).sum())
        self.n_items = int((item_map >= 0).sum())
        self.negative_sample_ratio = 1
        self.train_data = [[] for _ in range(self.n_users)]
        self.length = len(dataset)
        for o_user in range(dataset.n_users):
            cu = user_map[o_user]
            if cu >= 0:
                for o_item in dataset.train_data[o_user]:
                    ci = item_map[o_item]
                    if ci >= 0:
                        self.train_data[cu].append(int(ci))
        self.train_array = []
        for user in range(self.n_users):
            self.train_array.extend([[user, item] for item in self.train_data[user]])

    def __len__(self):
        return self.length


def _as_map_array(mapping, size):
    if isinstance(mapping, dict):
        arr = np.full(size, -1, dtype=np.int64)
        for k, v in mapping.items():
            arr[k] = v
        return arr
    return np.asarray(mapping, dtype=np.int64)


def _flatten_ragged(lists, pad_to):
    """(flat, rows, slots, lengths, pad_to) for ragged per-user lists — the
    one implementation both padding helpers scatter from. Raises on a
    ``pad_to`` narrower than the longest row: the host scatter would raise
    anyway, but JAX DROPS out-of-bounds scatter updates, silently truncating
    exclusion/ground-truth rows."""
    lengths = np.fromiter((len(l) for l in lists), dtype=np.int64, count=len(lists))
    max_len = int(lengths.max(initial=0))
    if pad_to is None:
        pad_to = max(1, max_len)
    elif pad_to < max_len:
        raise ValueError(f"pad_to {pad_to} < longest row {max_len}")
    if lengths.sum() == 0:
        return None, None, None, lengths, pad_to
    flat = np.concatenate([np.asarray(l, dtype=np.int32) for l in lists if len(l)])
    rows = np.repeat(np.arange(len(lists), dtype=np.int32), lengths)
    slots = (
        np.arange(len(flat), dtype=np.int64)
        - np.repeat(np.cumsum(lengths) - lengths, lengths)
    ).astype(np.int32)
    return flat, rows, slots, lengths, pad_to


def device_padded_from_lists(lists, n_items, pad_to=None):
    """[n_users, L] padded item matrix built ON DEVICE from E-sized scatter
    components — uploading the dense padded matrix costs O(n_users * L)
    transfer (hundreds of MB for power-law graphs) where the components are
    O(E)."""
    import jax.numpy as jnp

    flat, rows, slots, lengths, pad_to = _flatten_ragged(lists, pad_to)
    padded = jnp.full((len(lists), pad_to), n_items, dtype=jnp.int32)
    if flat is None:
        return padded
    return padded.at[jnp.asarray(rows), jnp.asarray(slots)].set(jnp.asarray(flat))


def pad_user_lists(lists, n_items, pad_to=None, sort=True):
    """Pad ragged per-user item lists to a [n_users, L] int32 array.

    Padding uses the sentinel ``n_items`` so the rows stay sorted and
    membership tests via searchsorted / -inf scatter through an extra
    column both work. Returns (padded, lengths).
    """
    flat, rows, slots, lengths, pad_to = _flatten_ragged(lists, pad_to)
    padded = np.full((len(lists), pad_to), n_items, dtype=np.int32)
    if flat is not None:
        padded[rows, slots] = flat
        if sort:
            padded.sort(axis=1)
    return padded, lengths.astype(np.int32)


def quick_synthetic_dataset(
    n_users,
    n_items,
    n_interactions,
    seed=0,
    split_ratio=(0.8, 0.1, 0.1),
    name="QuickSynthetic",
):
    """Vectorized synthetic dataset for benchmarks / dry runs.

    Unlike ``SyntheticDataset`` (which exercises the reference-parity k-core
    + chronological pipeline and is O(E * deg) in python), this builds a
    deduped random bipartite graph and per-user random split entirely in
    numpy — millions of edges in well under a second.
    """
    rng = np.random.default_rng(seed)
    u_w = (1.0 / np.arange(1, n_users + 1)) ** 0.6
    i_w = (1.0 / np.arange(1, n_items + 1)) ** 0.8
    users = rng.choice(n_users, size=n_interactions, p=u_w / u_w.sum())
    items = rng.choice(n_items, size=n_interactions, p=i_w / i_w.sum())
    pairs = np.unique(users.astype(np.int64) * n_items + items.astype(np.int64))
    rng.shuffle(pairs)
    users, items = pairs // n_items, pairs % n_items
    order = np.argsort(users, kind="stable")
    users, items = users[order], items[order]
    counts = np.bincount(users, minlength=n_users)
    starts = np.concatenate([[0], np.cumsum(counts)])

    ds = BasicDataset({"name": name, "split_ratio": list(split_ratio)})
    ds.n_users, ds.n_items = n_users, n_items
    ds.train_data = [[] for _ in range(n_users)]
    ds.val_data = [[] for _ in range(n_users)]
    ds.test_data = [[] for _ in range(n_users)]
    train_rows = []
    for u in range(n_users):
        row = items[starts[u] : starts[u + 1]]
        n = len(row)
        n_tr = int(n * split_ratio[0])
        n_te = int(n * split_ratio[2])
        ds.train_data[u] = row[:n_tr].tolist()
        ds.val_data[u] = row[n_tr : n - n_te].tolist()
        ds.test_data[u] = row[n - n_te :].tolist()
        if n_tr:
            train_rows.append(
                np.stack([np.full(n_tr, u, dtype=np.int64), row[:n_tr]], axis=1)
            )
    ds.train_array = (
        np.concatenate(train_rows, axis=0) if train_rows else np.zeros((0, 2), np.int64)
    )
    return ds


DATASETS = {
    "BasicDataset": BasicDataset,
    "ProcessedDataset": ProcessedDataset,
    "GowallaDataset": GowallaDataset,
    "YelpDataset": YelpDataset,
    "AmazonDataset": AmazonDataset,
    "SyntheticDataset": SyntheticDataset,
}
