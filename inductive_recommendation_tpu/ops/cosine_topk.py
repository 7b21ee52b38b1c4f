"""Blockwise cosine-similarity top-k over the full user x item grid.

The DOSE family selects edge candidates by ranking all n_users*n_items
cosine similarities (model.py:503-545) — the reference materializes the full
matrix on the CPU with sklearn. Here similarity blocks are streamed on
device inside one jitted scan (the framework's analog of blockwise/ring-
attention memory behavior).

Selection cost notes (r5, measured on v5e — EPOCH_BOUNDARY_r05.json):
the flat form (``lax.top_k`` with k=aug_num over every [block x n_items]
panel) dominates the DOSE epoch boundary: 4.4 s at Gowalla scale, 18.1 s
at Amazon, while the similarity matmuls total ~6 ms. ``lax.top_k`` over a
21M panel measures ~69 ms REGARDLESS of k (1k..500k — it is a sort), so
the cost floor for any exact method that sorts every element is ~N-bound.

A two-stage form (per-row top-``row_cap`` + one merge, in-jit exactness
fallback) is kept behind ``row_cap=<int>`` but is NOT the default: the
DOSE_aug selection (top-k of NEGATED cos) is heavily skewed — at Gowalla
scale 981 rows own more than 128 winners each and 59 rows more than 512 —
so the truncation fallback always fires and the two-stage run pays both
stages (measured 4.9 s vs 4.4 s flat).

A threshold-prefilter form (:func:`blockwise_cosine_topk_hinted` — last
epoch's k-th value as a hint, per-chunk max prefilter, nothing bigger than
~2M sorted, unconditional exactness via budget checks + flat fallback)
was built, proven exact, and ALSO measured dead on the real workload: the
DOSE k-th value drifts massively between epochs (0.163 -> 0.680 after ONE
Gowalla epoch) and the cosine density near the threshold busts any
per-block budget even at zero drift (count within 0.02 of the k-th
exceeds 131k/block), so the fallback always fires. bf16 sorting buys 8%
(69.5 -> 63.8 ms per 21M panel — the sort is compare-bound, not
bandwidth-bound). Flat is the measured floor; it stays the default.

Divergence (documented): the reference splits the flattened matrix into two
halves and un-flattens the second half's indices with an ``aug_num//2`` offset
instead of ``numel//2`` (model.py:537-540), mapping those pairs onto
near-zero user ids. We implement the evident intent: one exact global top-k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(x, eps=1e-12):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _flat_topk(un_blocks, itn, n_users, n_items, k, block_rows):
    """The exact flat form: per block, one top-k over the whole
    [block_rows x n_items] panel, merged through the scan carry."""
    n_blocks = un_blocks.shape[0]

    def body(carry, inp):
        best_vals, best_uid, best_iid = carry
        block, block_idx = inp
        sims = block @ itn.T  # [block_rows, n_items]
        row_ids = block_idx * block_rows + jnp.arange(block_rows)[:, None]
        valid = row_ids < n_users
        sims = jnp.where(valid, sims, -jnp.inf)
        kk = min(k, block_rows * n_items)
        flat = sims.reshape(-1)
        vals, flat_idx = jax.lax.top_k(flat, kk)
        uid = block_idx * block_rows + flat_idx // n_items
        iid = flat_idx % n_items
        cand_vals = jnp.concatenate([best_vals, vals])
        cand_uid = jnp.concatenate([best_uid, uid.astype(jnp.int32)])
        cand_iid = jnp.concatenate([best_iid, iid.astype(jnp.int32)])
        new_vals, pos = jax.lax.top_k(cand_vals, k)
        return (new_vals, cand_uid[pos], cand_iid[pos]), None

    init = (
        jnp.full((k,), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((k,), dtype=jnp.int32),
        jnp.zeros((k,), dtype=jnp.int32),
    )
    (vals, uid, iid), _ = jax.lax.scan(
        body, init, (un_blocks, jnp.arange(n_blocks))
    )
    return vals, uid, iid


def blockwise_cosine_topk(
    users_r: jnp.ndarray,
    items_r: jnp.ndarray,
    k: int,
    negate_items: bool = False,
    block_rows: int = 512,
    row_cap: int | None = None,
):
    """Exact top-k (u, i) pairs by cosine similarity, streamed blockwise.

    ``negate_items=True`` reproduces DOSE_aug's ``all_items_r *= -1``
    (model.py:509): top-k of cos(u, -i) == the k *lowest*-similarity pairs.

    Returns (values [k], user_idx [k], item_idx [k]).
    """
    n_users = users_r.shape[0]
    n_items = items_r.shape[0]
    un = _l2_normalize(users_r.astype(jnp.float32))
    itn = _l2_normalize(items_r.astype(jnp.float32))
    if negate_items:
        itn = -itn

    n_blocks = -(-n_users // block_rows)
    pad_rows = n_blocks * block_rows - n_users
    un = jnp.pad(un, ((0, pad_rows), (0, 0)))
    un_blocks = un.reshape(n_blocks, block_rows, -1)

    if row_cap is None:
        return _flat_topk(un_blocks, itn, n_users, n_items, k, block_rows)
    cap = min(row_cap, n_items)
    if k > n_users * cap or n_items <= cap or k * 4 >= n_users * n_items:
        # two-stage cannot yield k candidates / no reduction to be had
        return _flat_topk(un_blocks, itn, n_users, n_items, k, block_rows)

    # stage 1: per-row top-cap along the item axis (cheap), streamed
    def body(carry, inp):
        block, block_idx = inp
        sims = block @ itn.T  # [block_rows, n_items]
        row_ids = block_idx * block_rows + jnp.arange(block_rows)[:, None]
        sims = jnp.where(row_ids < n_users, sims, -jnp.inf)
        vals_r, idx_r = jax.lax.top_k(sims, cap)  # [block_rows, cap]
        return carry, (vals_r, idx_r.astype(jnp.int32))

    _, (vals_all, idx_all) = jax.lax.scan(
        body, None, (un_blocks, jnp.arange(n_blocks))
    )
    flat_vals = vals_all.reshape(-1)  # [n_blocks * block_rows * cap]
    uid_all = jnp.broadcast_to(
        jnp.arange(n_blocks * block_rows, dtype=jnp.int32)[:, None],
        (n_blocks * block_rows, cap),
    ).reshape(-1)
    iid_all = idx_all.reshape(-1)

    # stage 2: one merge over the survivors
    merged_vals, pos = jax.lax.top_k(flat_vals, k)
    merged_uid = uid_all[pos]
    merged_iid = iid_all[pos]

    # exactness check: a row whose LAST kept value ties or beats the merged
    # k-th value may have had more entries above the global bar than cap —
    # rerun the exact flat form for that (rare) case. >= is conservative on
    # ties; padded rows carry -inf and never fire.
    kth = merged_vals[k - 1]
    truncated = jnp.any(vals_all[..., -1] >= kth)

    def exact(_):
        return _flat_topk(un_blocks, itn, n_users, n_items, k, block_rows)

    def fast(_):
        return merged_vals, merged_uid, merged_iid

    return jax.lax.cond(truncated, exact, fast, operand=None)


def blockwise_cosine_topk_hinted(
    users_r: jnp.ndarray,
    items_r: jnp.ndarray,
    k: int,
    threshold_hint,
    negate_items: bool = False,
    block_rows: int = 512,
    chunk: int = 1024,
    budget_chunks: int = 2048,
    collect_k: int = 131072,
):
    """Exact top-k with a sub-sort-cost fast path driven by a THRESHOLD HINT
    (typically last epoch's k-th value minus a margin — selection runs once
    per epoch and the representations drift slowly).

    Fast path: one cheap pass computes, per user block, the [rows x C]
    per-chunk maxima (C = item chunks of ``chunk``), gathers only the
    ``budget_chunks`` highest-max chunks, and keeps their top ``collect_k``
    entries — so nothing larger than ~2M elements is ever sorted, vs the
    flat form's full [block x n_items] sort per block (~69 ms per 21M panel
    regardless of k; see the module docstring). One final merge over the
    per-block survivors yields the top-k.

    EXACTNESS is unconditional: the pass also counts entries >= hint and
    chunk activity, and a ``lax.cond`` falls back to the flat form whenever
    (a) fewer than k entries clear the hint (hint too high / first epoch —
    pass +inf to force it), (b) any block has more active chunks than
    ``budget_chunks``, or (c) any block holds more clearing entries than
    ``collect_k``. Every returned result therefore equals the flat form's
    up to ties.

    Returns (values [k], user_idx [k], item_idx [k]); ``values[k-1]`` is
    the next epoch's natural hint basis."""
    n_users = users_r.shape[0]
    n_items = items_r.shape[0]
    un = _l2_normalize(users_r.astype(jnp.float32))
    itn = _l2_normalize(items_r.astype(jnp.float32))
    if negate_items:
        itn = -itn
    thr = jnp.asarray(threshold_hint, jnp.float32)

    n_blocks = -(-n_users // block_rows)
    pad_rows = n_blocks * block_rows - n_users
    un = jnp.pad(un, ((0, pad_rows), (0, 0)))
    un_blocks = un.reshape(n_blocks, block_rows, -1)

    C = -(-n_items // chunk)
    pad_cols = C * chunk - n_items
    itn_p = jnp.pad(itn, ((0, pad_cols), (0, 0)))
    col_valid = (jnp.arange(C * chunk) < n_items)[None, :]  # [1, C*chunk]
    n_ch = block_rows * C
    bc = min(budget_chunks, n_ch)
    ck = min(collect_k, bc * chunk)
    if ck * n_blocks < k:
        # cannot even represent k survivors — hint machinery pointless here
        return _flat_topk(un_blocks, itn, n_users, n_items, k, block_rows)

    def body(carry, inp):
        block, block_idx = inp
        sims = block @ itn_p.T  # [rows, C*chunk]
        row_ids = block_idx * block_rows + jnp.arange(block_rows)[:, None]
        sims = jnp.where((row_ids < n_users) & col_valid, sims, -jnp.inf)
        cnt = jnp.sum(sims >= thr)
        simsc = sims.reshape(n_ch, chunk)
        cmax = jnp.max(simsc, axis=1)  # [n_ch]
        n_act = jnp.sum(cmax >= thr)
        _, act_idx = jax.lax.top_k(cmax, bc)  # [bc]
        gathered = jnp.take(simsc, act_idx, axis=0)  # [bc, chunk]
        gvals, gpos = jax.lax.top_k(gathered.reshape(-1), ck)
        slot = act_idx[gpos // chunk]  # chunk id within block
        p = gpos % chunk
        uid = (block_idx * block_rows + slot // C).astype(jnp.int32)
        iid = ((slot % C) * chunk + p).astype(jnp.int32)
        violated = (n_act > bc) | (cnt > ck)
        return carry, (gvals, uid, iid, cnt, violated)

    _, (gv, gu, gi, cnts, viol) = jax.lax.scan(
        body, None, (un_blocks, jnp.arange(n_blocks))
    )

    def fast(_):
        vals, pos = jax.lax.top_k(gv.reshape(-1), k)
        return vals, gu.reshape(-1)[pos], gi.reshape(-1)[pos]

    def exact(_):
        return _flat_topk(un_blocks, itn, n_users, n_items, k, block_rows)

    bad = jnp.any(viol) | (jnp.sum(cnts) < k)
    return jax.lax.cond(bad, exact, fast, operand=None)
