"""Full-catalog retrieval evaluation + the inductive six-slice protocol.

Mirrors BasicTrainer.eval / inductive_eval (trainer.py:146-253) with the
TPU-shaped differences:

- the model's full representation is computed ONCE per eval (jitted) and
  reused for every user batch (the reference re-propagates the whole graph
  for every 512-user batch, trainer.py:151-153);
- scoring + exclusion masking (-inf scatter through padded index rows,
  replacing the per-batch python lists of trainer.py:155-167) + top-k run
  in a single jitted function per batch, with all large arrays passed as
  jit arguments (remote-compile friendly);
- metrics are one vectorized host pass (eval/metrics.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.data.dataset import pad_user_lists
from inductive_recommendation_tpu.eval.metrics import calculate_metrics
from inductive_recommendation_tpu.ops.topk import masked_topk


def _format_results(metrics, topks):
    """Exact format of trainer.py:175-182."""
    precision = "".join("{:.3f}, ".format(metrics["Precision"][k] * 100.0) for k in topks)
    recall = "".join("{:.3f}, ".format(metrics["Recall"][k] * 100.0) for k in topks)
    ndcg = "".join("{:.3f}, ".format(metrics["NDCG"][k] * 100.0) for k in topks)
    return "Precision: {:s}Recall: {:s}NDCG: {:s}".format(precision, recall, ndcg)


class Evaluator:
    def __init__(self, dataset, topks, test_batch_size=512, mesh=None):
        """``mesh``: optional jax Mesh with a 'model' axis — retrieval then
        runs item-sharded with per-device top-k + k-way merge
        (parallel/eval.py); results are bitwise-identical to the
        single-device path."""
        self.dataset = dataset
        self.topks = list(topks)
        # small catalogs: cannot retrieve more items than exist
        self.k_max = min(max(self.topks), dataset.n_items)
        self.test_batch_size = int(test_batch_size)
        self.mesh = mesh
        n_items = dataset.n_items
        # padded exclusion rows (sentinel n_items scatters into a dropped
        # col); uploaded to device ONCE — per-batch host slicing costs an
        # H2D transfer per batch, which dominates eval on remote backends
        self._train_excl, _ = pad_user_lists(dataset.train_data, n_items, sort=False)
        trainval = [
            list(t) + list(v) for t, v in zip(dataset.train_data, dataset.val_data)
        ]
        self._trainval_excl, _ = pad_user_lists(trainval, n_items, sort=False)
        from inductive_recommendation_tpu.data.dataset import device_padded_from_lists

        self._train_excl_dev = device_padded_from_lists(dataset.train_data, n_items)
        self._trainval_excl_dev = device_padded_from_lists(trainval, n_items)
        # jit caches keyed per model object (the evaluator outlives none of
        # them, but stays correct if several models share one dataset)
        self._fn_cache = {}

    def _fns(self, model):
        key = id(model)
        if key in self._fn_cache and self._fn_cache[key][0] is not model:
            # id() reuse after a model was garbage-collected
            del self._fn_cache[key]
        if key not in self._fn_cache:
            k_max = self.k_max

            def scoring_state(params, buffers):
                return model.make_scoring_state(params, buffers=buffers)

            def rec_masked(state, users, excl_full, banned):
                scores = model.score(state, users)
                excl = excl_full[users]
                return masked_topk(scores, k_max, exclude_idx=excl, banned_mask=banned)[1]

            def rec_plain(state, users):
                scores = model.score(state, users)
                return jax.lax.top_k(scores, k_max)[1]

            self._fn_cache[key] = (
                model,  # keeps the model alive so its id cannot be reused
                jax.jit(scoring_state),
                jax.jit(rec_masked),
                jax.jit(rec_plain),
            )
        return self._fn_cache[key][1:]

    def recommend(self, model, params, stage, banned_items=None):
        """Top-k_max recommended items for every user -> [n_users, k_max]."""
        ds = self.dataset
        n_users, n_items = ds.n_users, ds.n_items
        if stage == "test":
            excl, excl_dev = self._trainval_excl, self._trainval_excl_dev
        elif stage == "val":
            excl, excl_dev = self._train_excl, self._train_excl_dev
        else:
            excl = excl_dev = None
        banned = None
        if banned_items is not None:
            b = np.zeros(n_items, dtype=bool)
            b[np.asarray(banned_items)] = True
            banned = jnp.asarray(b)

        state_fn, rec_masked, rec_plain = self._fns(model)
        state = state_fn(params, model.buffers)

        if self.mesh is not None:
            from inductive_recommendation_tpu.parallel.eval import (
                sharded_recommend_all_users,
            )

            rep = state if not isinstance(state, (tuple, dict)) else None
            if rep is not None and getattr(rep, "ndim", 0) == 2:
                return sharded_recommend_all_users(
                    self.mesh,
                    rep,
                    n_users,
                    n_items,
                    k=self.k_max,
                    exclude_rows=np.asarray(excl) if excl is not None else None,
                    banned_items=banned_items,
                    batch_size=self.test_batch_size,
                )
            # models without a rep-matrix scoring state (MultiVAE, NeuMF,
            # ItemKNN) fall through to the single-device path

        B = self.test_batch_size
        rec = []
        for start in range(0, n_users, B):
            users = np.arange(start, min(start + B, n_users))
            pad = B - len(users)
            users_p = np.concatenate([users, np.zeros(pad, dtype=users.dtype)])
            if excl_dev is None and banned is None:
                items = rec_plain(state, jnp.asarray(users_p))
            else:
                e = (
                    excl_dev
                    if excl_dev is not None
                    else jnp.full((n_users, 1), n_items, jnp.int32)
                )
                bb = banned if banned is not None else jnp.zeros(n_items, bool)
                items = rec_masked(state, jnp.asarray(users_p), e, bb)
            # keep device handles; a per-batch np.asarray would serialize on
            # the device->host round trip instead of pipelining dispatches
            rec.append((items, len(users)))
        fetched = jax.device_get([r for r, _ in rec])
        return np.concatenate(
            [np.asarray(r)[:k] for r, (_, k) in zip(fetched, rec)], axis=0
        )

    def evaluate(self, model, params, stage, banned_items=None, eval_data=None):
        """-> (results_str, metrics dict); parity with trainer.py:146-210."""
        ds = self.dataset
        if eval_data is None:
            eval_data = getattr(ds, stage + "_data")
        rec_items = self.recommend(model, params, stage, banned_items=banned_items)
        metrics = calculate_metrics(eval_data, rec_items, self.topks)
        return _format_results(metrics, self.topks), metrics

    # -- six-slice inductive protocol (trainer.py:212-253) -------------------
    def inductive_eval(self, model, params, n_old_users, n_old_items, verbose=True):
        ds = self.dataset
        test = ds.test_data
        out = {}

        def run(tag, eval_data, banned=None):
            results, metrics = self.evaluate(
                model, params, "test", banned_items=banned, eval_data=eval_data
            )
            if verbose:
                print("{:s} result. {:s}".format(tag, results))
            out[tag] = metrics

        run("All users and all items", [list(t) for t in test])

        old_u = [list(t) if u < n_old_users else [] for u, t in enumerate(test)]
        run("Old users and all items", old_u)

        new_u = [[] if u < n_old_users else list(t) for u, t in enumerate(test)]
        run("New users and all items", new_u)

        old_i = [[i for i in t if i < n_old_items] for t in test]
        run(
            "All users and old items",
            old_i,
            banned=np.arange(n_old_items, ds.n_items),
        )

        new_i = [[i for i in t if i >= n_old_items] for t in test]
        run("All users and new items", new_i, banned=np.arange(n_old_items))

        old_uo = [
            [i for i in t if i < n_old_items] if u < n_old_users else []
            for u, t in enumerate(test)
        ]
        run(
            "Old users and old items",
            old_uo,
            banned=np.arange(n_old_items, ds.n_items),
        )
        return out
