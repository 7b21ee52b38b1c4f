"""EdgeView engine: masked-base + delta view SpMM vs dense oracles built the
reference way (dedup pair set -> sym-normalized adjacency)."""

import jax
import jax.numpy as jnp
import numpy as np

from inductive_recommendation_tpu.graph.build import (
    aug_union_edges,
    drop_difference_edges,
)
from inductive_recommendation_tpu.graph.views import (
    ViewEngine,
    view_propagate_mean,
    view_spmm,
)


def _dense_view(pairs, n_users, n_items):
    n = n_users + n_items
    A = np.zeros((n, n))
    for u, i in np.asarray(pairs):
        A[u, n_users + i] = 1.0
        A[n_users + i, u] = 1.0
    d = np.maximum(A.sum(1), 1.0) ** -0.5
    return d[:, None] * A * d[None, :]


def test_view_engine_oracles(tiny_graph, rng):
    train_array, n_users, n_items = tiny_graph
    n = n_users + n_items
    eng = ViewEngine(train_array, n_users, n_items, delta_budget=64)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    # 1) random drop (keep 60% of pairs)
    keep = rng.random(len(eng.train_pairs)) < 0.6
    view = eng.make_view(keep_pair_mask=keep)
    dense = _dense_view(eng.train_pairs[keep], n_users, n_items)
    np.testing.assert_allclose(
        np.asarray(view_spmm(eng.base, view, x)), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )

    # 2) set-difference drop of specific pairs
    drop = eng.train_pairs[rng.choice(len(eng.train_pairs), 20, replace=False)]
    mask = eng.keep_mask_from_drop_pairs(drop)
    view = eng.make_view(keep_pair_mask=mask)
    remaining = drop_difference_edges(train_array, drop)
    dense = _dense_view(remaining, n_users, n_items)
    np.testing.assert_allclose(
        np.asarray(view_spmm(eng.base, view, x)), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )

    # 3) union with injected pairs (some overlapping train)
    inject = np.stack(
        [rng.integers(0, n_users, 30), rng.integers(0, n_items, 30)], axis=1
    )
    view = eng.make_view(add_pairs=inject)
    union = aug_union_edges(train_array, inject)
    dense = _dense_view(union, n_users, n_items)
    np.testing.assert_allclose(
        np.asarray(view_spmm(eng.base, view, x)), dense @ np.asarray(x),
        rtol=1e-4, atol=1e-4,
    )

    # 4) propagation + gradient parity on the union view
    w = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    def loss(x):
        return jnp.sum(view_propagate_mean(eng.base, view, x, 2) * w)

    g = np.asarray(jax.grad(loss)(x))
    # dense oracle gradient
    A = dense
    x_np = np.asarray(x)
    # rep = (x + Ax + A^2x)/3 ; dL/dx = (I + A^T + (A^2)^T) w / 3
    gd = (np.asarray(w) + A.T @ np.asarray(w) + A.T @ (A.T @ np.asarray(w))) / 3.0
    np.testing.assert_allclose(g, gd, rtol=1e-3, atol=1e-4)


def test_view_budget_enforced(tiny_graph):
    train_array, n_users, n_items = tiny_graph
    eng = ViewEngine(train_array, n_users, n_items, delta_budget=2)
    inject = np.array([[0, 0], [1, 1], [2, 2], [3, 3], [4, 4]])
    # most of these are likely not in train -> budget exceeded
    try:
        eng.make_view(add_pairs=inject)
    except ValueError as e:
        assert "budget" in str(e)


def test_device_view_matches_host(tiny_graph, rng):
    """make_view_on_device == make_view: same base_scale, same represented
    delta matrix, for drops + adds incl. duplicates and in-train pairs."""
    train_array, n_users, n_items = tiny_graph
    n = n_users + n_items
    eng = ViewEngine(train_array, n_users, n_items, delta_budget=32)

    keep = rng.random(len(eng.train_pairs)) < 0.7
    # adds: some random, some duplicated, some already in train
    adds = np.concatenate(
        [
            np.stack(
                [rng.integers(0, n_users, 10), rng.integers(0, n_items, 10)], axis=1
            ),
            eng.train_pairs[:4],  # in train -> force-keep, no delta
        ]
    )
    adds = np.concatenate([adds, adds[:3]])  # duplicates

    host = eng.make_view(keep_pair_mask=keep, add_pairs=adds)
    dev = eng.make_view_on_device(
        keep_pair_mask=jnp.asarray(keep), add_pairs=jnp.asarray(adds)
    )

    np.testing.assert_allclose(
        np.asarray(dev.base_scale), np.asarray(host.base_scale), rtol=1e-6
    )

    def dense_delta(v):
        A = np.zeros((n, n), np.float64)
        np.add.at(A, (np.asarray(v.d_row), np.asarray(v.d_col)), np.asarray(v.d_val))
        return A

    np.testing.assert_allclose(dense_delta(dev), dense_delta(host), atol=1e-6)
    # transpose copies represent the same matrix too
    def dense_delta_t(v):
        A = np.zeros((n, n), np.float64)
        np.add.at(
            A, (np.asarray(v.dt_row), np.asarray(v.dt_col)), np.asarray(v.dt_val)
        )
        return A

    np.testing.assert_allclose(dense_delta_t(dev), dense_delta(host), atol=1e-6)
    # d_row stays sorted (segment_sum relies on indices_are_sorted)
    assert (np.diff(np.asarray(dev.d_row)) >= 0).all()
    assert (np.diff(np.asarray(dev.dt_col)) >= 0).all()

    # the full view product matches
    x = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(view_spmm(eng.base, dev, x)),
        np.asarray(view_spmm(eng.base, host, x)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_device_view_no_adds_and_keep_all(tiny_graph, rng):
    train_array, n_users, n_items = tiny_graph
    eng = ViewEngine(train_array, n_users, n_items, delta_budget=8)
    host = eng.make_view()
    dev = eng.make_view_on_device()
    np.testing.assert_allclose(
        np.asarray(dev.base_scale), np.asarray(host.base_scale), rtol=1e-6
    )
    assert float(jnp.abs(dev.d_val).sum()) == 0.0


def test_device_keep_mask_matches_host(tiny_graph, rng):
    train_array, n_users, n_items = tiny_graph
    eng = ViewEngine(train_array, n_users, n_items, delta_budget=8)
    drops = np.concatenate(
        [
            eng.train_pairs[rng.integers(0, len(eng.train_pairs), 12)],
            np.stack([rng.integers(0, n_users, 5), rng.integers(0, n_items, 5)], 1),
        ]
    )
    host = eng.keep_mask_from_drop_pairs(drops)
    dev = np.asarray(eng.keep_mask_from_drop_pairs_on_device(jnp.asarray(drops)))
    np.testing.assert_array_equal(host, dev)


def test_device_keep_mask_empty_train_set():
    """Zero-length train set must fall back to the host path (a zero-length
    gather inside jit is undefined and crashed before)."""
    eng = ViewEngine(np.zeros((0, 2), np.int64), 4, 4, delta_budget=2)
    mask = np.asarray(
        eng.keep_mask_from_drop_pairs_on_device(jnp.asarray([[0, 1]]))
    )
    assert mask.shape == (0,)


def test_device_view_overlong_add_pairs_falls_back_to_host(tiny_graph, rng):
    """More raw candidates than the budget is legal when dedup/in-train
    removal brings the count under it (host semantics); the device builder
    must not raise on the raw count."""
    train_array, n_users, n_items = tiny_graph
    eng = ViewEngine(train_array, n_users, n_items, delta_budget=4)
    base = np.stack(
        [rng.integers(0, n_users, 3), rng.integers(0, n_items, 3)], axis=1
    )
    # 9 raw rows, 3 unique — under the budget of 4 after dedup
    add = np.concatenate([base, base, base])
    host = eng.make_view(add_pairs=np.unique(add, axis=0))
    dev = eng.make_view_on_device(add_pairs=jnp.asarray(add))
    np.testing.assert_allclose(
        np.asarray(dev.base_scale), np.asarray(host.base_scale), rtol=1e-6
    )
    d_host = {
        (int(r), int(c)): float(v)
        for r, c, v in zip(host.d_row, host.d_col, host.d_val)
        if v != 0
    }
    d_dev = {
        (int(r), int(c)): float(v)
        for r, c, v in zip(
            np.asarray(dev.d_row), np.asarray(dev.d_col), np.asarray(dev.d_val)
        )
        if v != 0
    }
    assert d_host.keys() == d_dev.keys()
    for k in d_host:
        assert abs(d_host[k] - d_dev[k]) < 1e-5


def test_chunked_delta_spmm_matches_segment_sum():
    """The scatter-free chunked delta (per-epoch structures + gathers +
    chunk cumsum) is numerically the segment-sum delta, forward AND grad,
    across chunk-unaligned budgets, empty rows and a fully concentrated
    row distribution (the top-cos worst case)."""
    import jax
    from inductive_recommendation_tpu.graph.views import (
        _delta_spmm,
        chunked_delta_spmm,
        chunked_segment_structs,
    )

    rng = np.random.default_rng(3)
    n, d = 57, 9
    for B, rows in [
        (37, np.sort(rng.integers(0, n, 37))),          # B % C != 0
        (64, np.sort(rng.integers(0, 5, 64))),          # few distinct rows
        (48, np.full(48, 13)),                          # fully concentrated
        (40, np.sort(rng.choice(n, 40, replace=False))),  # all distinct
    ]:
        d_row = rows.astype(np.int32)
        d_col = rng.integers(0, n, B).astype(np.int32)
        d_val = rng.standard_normal(B).astype(np.float32)
        # transpose copy sorted by col (the EdgeView dt_* convention)
        o = np.argsort(d_col, kind="stable")
        dt_row, dt_col, dt_val = d_row[o], d_col[o], d_val[o]
        x = rng.standard_normal((n, d)).astype(np.float32)
        delta = tuple(
            jnp.asarray(a) for a in (d_row, d_col, d_val, dt_row, dt_col, dt_val)
        )
        fs = chunked_segment_structs(delta[0], delta[1], delta[2], n)
        bs = chunked_segment_structs(delta[4], delta[3], delta[5], n)
        ref = _delta_spmm(delta, jnp.asarray(x))
        out = chunked_delta_spmm(fs, bs, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=1e-5)

        w = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        g_ref = jax.grad(lambda x: jnp.sum(_delta_spmm(delta, x) * w))(jnp.asarray(x))
        g_out = jax.grad(lambda x: jnp.sum(chunked_delta_spmm(fs, bs, x) * w))(
            jnp.asarray(x)
        )
        np.testing.assert_allclose(
            np.asarray(g_out), np.asarray(g_ref), rtol=2e-4, atol=1e-5
        )


def test_chunked_rect_dropout_matches_segment_sum_oracle():
    """chunked_rect_delta_spmm_dropout draws the SAME entry-key hash masks
    as delta_spmm_rect_dropout (forward and grad match it exactly), and the
    no-dropout rect pair matches delta_spmm_rect."""
    import jax
    from inductive_recommendation_tpu.graph.views import (
        chunked_delta_spmm,
        chunked_rect_delta_spmm_dropout,
        delta_spmm_rect,
        delta_spmm_rect_dropout,
        rect_chunk_pair,
    )

    rng = np.random.default_rng(5)
    n_out, n_in, n_cols, B, d = 41, 23, 23, 53, 7
    d_row = np.sort(rng.integers(0, n_out, B)).astype(np.int32)
    d_col = rng.integers(0, n_cols, B).astype(np.int32)
    d_val = rng.standard_normal(B).astype(np.float32)
    o = np.argsort(d_col, kind="stable")
    delta = tuple(
        jnp.asarray(a)
        for a in (d_row, d_col, d_val, d_row[o], d_col[o], d_val[o])
    )
    x = jnp.asarray(rng.standard_normal((n_in, d)).astype(np.float32))
    fs, bs = rect_chunk_pair(delta, n_out, n_in, n_cols)

    # no dropout: == delta_spmm_rect
    np.testing.assert_allclose(
        np.asarray(chunked_delta_spmm(fs, bs, x)),
        np.asarray(delta_spmm_rect(n_out, delta, x)),
        rtol=2e-4, atol=1e-5,
    )

    kd = jax.random.key_data(jax.random.key(11))
    p = jnp.float32(0.4)
    ref = delta_spmm_rect_dropout(n_out, n_cols, delta, kd, p, x)
    out = chunked_rect_delta_spmm_dropout(fs, bs, kd, p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=1e-5)

    w = jnp.asarray(rng.standard_normal((n_out, d)).astype(np.float32))
    g_ref = jax.grad(
        lambda x: jnp.sum(delta_spmm_rect_dropout(n_out, n_cols, delta, kd, p, x) * w)
    )(x)
    g_out = jax.grad(
        lambda x: jnp.sum(chunked_rect_delta_spmm_dropout(fs, bs, kd, p, x) * w)
    )(x)
    np.testing.assert_allclose(
        np.asarray(g_out), np.asarray(g_ref), rtol=2e-4, atol=1e-5
    )
