"""DOSE family (reference model.py:367-3877): IGCN + graph data augmentation
+ InfoNCE contrastive learning. Thirteen variants differing only in

1. how candidate (u, i) pairs are selected — cosine-similarity extremes
   (blockwise streamed top-k on device), random pairs,
   degree-tail-restricted pairs, or a similarity threshold;
2. which auxiliary graph(s) are built — edge injection (union), random
   subsample, set difference, or the reference's no-op "drop" (union);
3. which representations feed the InfoNCE term.

The reference repeats ~290 LoC per variant; here each variant is a small
subclass of ``_DOSEBase`` declaring its selection + view recipe.

Views are EdgeViews (graph/views.py): keep-mask + injected-delta over one
shared raw-train bucketed layout. Per-epoch regeneration
(``update_aug_adj``) writes fixed-shape scale/delta arrays — the jitted
train step never retraces, view propagation rides the gather-only SpMM
fast path, and the per-epoch host work is one vectorized key membership.

Documented divergences from the reference (intended-semantics fixes):
- cos-sim selection is one exact global top-k; the reference splits the
  flattened matrix in two halves and mis-offsets the second half's indices
  by aug_num//2 instead of numel//2 (model.py:537-540);
- ``DOSE_aug.update_aug_adj`` regenerates the AUG graph (the reference calls
  a nonexistent ``generate_drop_graph`` -> AttributeError, model.py:571-575);
- ``DOSE_aug_drop2`` gets an ``update_aug_adj`` (the reference has none but
  its trainer calls it -> AttributeError at the first epoch end);
- selection uses eval-mode representations (no feature dropout); the
  reference leaves train-mode dropout on during epoch-end selection;
- ``DOSE_aug4``'s threshold selection keeps the top ``aug_num`` pairs with
  cos >= pai (the reference's unbounded torch.where list would be
  dynamically sized).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from inductive_recommendation_tpu.graph.ranking import graph_rank_nodes
from inductive_recommendation_tpu.graph.views import (
    ViewEngine,
    bake_view,
    random_keep_mask_on_device as _rand_keep_jit,
    random_pairs_on_device as _rand_pairs_jit,
    view_propagate_mean,
)
from inductive_recommendation_tpu.models.base import l2_sq_rows
from inductive_recommendation_tpu.models.igcn import IGCN
from inductive_recommendation_tpu.ops import blockwise_cosine_topk
from inductive_recommendation_tpu.train.losses import info_nce


class _DOSEBase(IGCN):
    """IGCN + auxiliary contrastive views."""

    #: view buffer names regenerated each epoch
    view_keys: tuple = ("aug_adj",)
    #: whether any view recipe injects pairs; drop-only variants override
    #: to False so the view engine gets delta_budget 0 — otherwise every
    #: view SpMM pays a dead all-zero 2*aug_num-entry delta gather +
    #: segment-sum per layer per train step (aug_num is the DROP count
    #: there, commonly thousands)
    injects_pairs: bool = True

    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self.aug_num = int(model_config.get("aug_num", 0))
        self.aug_rate = model_config.get("aug_rate", 0.2)
        self.aug_ratio = model_config.get("aug_ratio", 0.2)
        self.pai = model_config.get("pai", 0.9)
        # stored for config parity only: the reference also defines taugh but
        # never passes it to InfoNCE (model.py:564 constructs
        # InfoNCE(negative_mode='unpaired') with the package default
        # temperature 0.1) — so configured taugh values are inert there too
        self.taugh = model_config.get("taugh", 0.2)
        self._aug_seed = int(model_config.get("aug_seed", 0))
        self._np_rng = np.random.default_rng(model_config.get("aug_seed", 0))
        self._views_updated = False
        self._aug_counter_base = 0
        self._establish_views(dataset)

    def _establish_views(self, dataset):
        """(Re)build the view engine + initial view buffers for ``dataset``."""
        budget = max(self.aug_num, 1) if self.injects_pairs else 0
        if (
            getattr(self, "_view_engine_for", None) is not dataset
            or self.view_engine.delta_budget != budget
        ):
            # checkpoint restores pass the SAME dataset object — rebuilding
            # the engine then repeats the O(E log E) host bucketing and the
            # O(E) base-layout re-upload for an identical result
            self.view_engine = ViewEngine(
                dataset.train_array,
                self.n_users,
                self.n_items,
                delta_budget=budget,
            )
            self._view_engine_for = dataset
        self._dedup_train = self.view_engine.train_pairs
        # the selection jits trace over the catalog sizes and the restrict
        # cache holds device uploads of tail arrays — both go stale (and
        # would stay pinned forever) across attach_dataset
        self._cos_jit_cache = {}
        self._restrict_dev_cache = {}
        self._thr_jits = {}
        self.buffers = dict(self.buffers, view_base=self.view_engine.base)
        # unbaked views, keyed like the buffers: the edge-sharded trainer
        # (parallel/step.py make_edge_sharded_dose_step) consumes the
        # global-eid base_scale + delta that baking folds into layout values
        self.edge_views = {}
        if getattr(self, "_defer_views", False):
            # checkpoint restore of an already-updated run: rebuild_views
            # (trainer hook) regenerates the real views right after and
            # resets the rng counter to its snapshot — building (and baking)
            # the initial views here would be multi-dispatch work thrown away
            return
        # this build makes INITIAL views: snapshot the rng counter so a
        # save that happens before the next update_aug_adj replays exactly
        # these draws (a mid-run attach_dataset lands here; the previous
        # update's snapshot refers to the OLD engine/catalog)
        self._initial_counter_base = getattr(self, "_aug_counter", 0)
        self._views_updated = False
        # initial views: the reference builds them in __init__ from the
        # INITIAL parameters; selection-based recipes fall back to the plain
        # train view until the first update_aug_adj
        for k in self.view_keys:
            # views are BAKED: the per-epoch keep-mask x normalization is
            # folded into a per-view copy of the layout values, so the train
            # step pays no per-step scale gathers (graph/views.py BakedView)
            v = self._initial_view(k)
            self.edge_views[k] = v
            self.buffers[k] = bake_view(self.view_engine.base, v)

    def _build_graph_buffers(self, dataset):
        """IGCN's rebuild (restore_aux / attach_dataset) replaces
        self.buffers wholesale — re-establish the view buffers on top, or
        every later train step dies on a missing 'view_base'."""
        super()._build_graph_buffers(dataset)
        if hasattr(self, "view_engine"):  # not yet set during IGCN.__init__
            self._establish_views(dataset)

    # -- per-variant recipe ---------------------------------------------------
    def _make_view(self, key, params):
        """EdgeView for view ``key`` given current params."""
        raise NotImplementedError

    def _initial_view(self, key):
        """View before any params exist (default: the full train graph)."""
        return self.view_engine.make_view_on_device()

    # -- machinery ------------------------------------------------------------
    def update_aug_adj(self, params=None):
        # snapshot the device-rng counter so a checkpoint restore can replay
        # THIS update's draws exactly (rebuild_views)
        self._aug_counter_base = getattr(self, "_aug_counter", 0)
        self._views_updated = True
        self._update_views(params)

    def _update_views(self, params):
        """Regenerate the per-epoch view buffers (per-variant override)."""
        new = dict(self.buffers)
        views = {}
        for k in self.view_keys:
            v = self._make_view(k, params)
            views[k] = v
            new[k] = bake_view(self.view_engine.base, v)
        self.buffers = new
        self.edge_views = views

    def rebuild_views(self, params=None):
        """Called by the trainer after a checkpoint load (with the restored
        params): regenerate the exact views the saved run was training on —
        random recipes replay their counter sequence from the snapshot,
        cos-sim recipes re-select deterministically from the restored params
        and annealed buffers. (The reference's load leaves a fresh model's
        __init__ views in place, model.py:601-613 — ours reproduces the
        actual training state.)"""
        if self._views_updated:
            self._aug_counter = self._aug_counter_base
            self._update_views(params)

    def checkpoint_aux(self):
        aux = dict(super().checkpoint_aux())
        aux["aug_counter"] = int(getattr(self, "_aug_counter", 0))
        aux["aug_counter_base"] = int(self._aug_counter_base)
        aux["initial_counter_base"] = int(getattr(self, "_initial_counter_base", 0))
        aux["views_updated"] = bool(self._views_updated)
        return aux

    def restore_aux(self, aux):
        """NOTE: the trainer's load paths always follow this with
        rebuild_views(params) — for an already-updated run the view buffers
        are deferred to that call (see _establish_views)."""
        if not aux:
            return
        aux = dict(aux)
        counter = int(aux.pop("aug_counter", 0))
        base = int(aux.pop("aug_counter_base", 0))
        init_base = int(aux.pop("initial_counter_base", 0))
        updated = bool(aux.pop("views_updated", False))
        # replay the saved run's initial-view draw window while the initial
        # views rebuild (fresh-run restores only; updated runs defer to
        # rebuild_views). init_base is 0 for __init__'s views and the
        # pre-draw counter when a mid-run attach_dataset re-established them
        self._aug_counter = init_base
        self._defer_views = updated
        try:
            super().restore_aux(aux)  # -> _build_graph_buffers -> _establish_views
        finally:
            self._defer_views = False
        self._aug_counter = counter
        self._aug_counter_base = base
        self._initial_counter_base = init_base
        self._views_updated = updated

    def _cos_pairs(self, params, k, negate_items, restrict=None, device=False):
        """Top-k (u, i) pairs by (optionally negated-item) cosine similarity
        of the current main representations, streamed blockwise.

        The whole selection (propagation + blockwise scan + top-k) runs as
        ONE jitted program per (k, negate, restrict-shape) — eager execution
        here costs a dispatch round trip per op on remote backends."""
        if not hasattr(self, "_cos_jit_cache"):
            self._cos_jit_cache = {}
            self._restrict_dev_cache = {}
        n_u = self.n_users if restrict is None else len(restrict[0])
        n_i = self.n_items if restrict is None else len(restrict[1])
        k = min(k, n_u * n_i)  # small catalogs: cannot select more pairs
        if restrict is None:
            r_users = r_items = None
        else:
            # static arrays (e.g. DOSE_aug_drop2's degree tails): upload once,
            # not per epoch (H2D is ~MB/s on tunneled backends). The cache
            # value HOLDS the host arrays — keying by id() alone would go
            # stale if CPython recycled a freed array's id
            rid = (id(restrict[0]), id(restrict[1]))
            hit = self._restrict_dev_cache.get(rid)
            if hit is None or hit[0] is not restrict[0] or hit[1] is not restrict[1]:
                hit = (
                    restrict[0],
                    restrict[1],
                    jnp.asarray(restrict[0]),
                    jnp.asarray(restrict[1]),
                )
                self._restrict_dev_cache[rid] = hit
            r_users, r_items = hit[2], hit[3]
        cache_key = (
            k,
            negate_items,
            None if restrict is None else (len(restrict[0]), len(restrict[1])),
        )
        if cache_key not in self._cos_jit_cache:

            def select(params, buffers, r_users, r_items):
                rep = self.get_rep(params, training=False, buffers=buffers)
                users_r = rep[: self.n_users]
                items_r = rep[self.n_users :]
                if r_users is not None:
                    users_r = users_r[r_users]
                    items_r = items_r[r_items]
                _, uid, iid = blockwise_cosine_topk(
                    users_r, items_r, k, negate_items=negate_items
                )
                # restrict remap + pair stacking stay INSIDE the jit — the
                # tunneled backend charges ~seconds per eager dispatch
                if r_users is not None:
                    uid, iid = r_users[uid], r_items[iid]
                return jnp.stack(
                    [uid.astype(jnp.int32), iid.astype(jnp.int32)], axis=1
                )

            self._cos_jit_cache[cache_key] = jax.jit(select)
        pairs = self._cos_jit_cache[cache_key](
            params, self.buffers, r_users, r_items
        )
        return pairs if device else np.asarray(pairs)

    def _random_keep_mask(self, rate):
        n_pairs = len(self._dedup_train)
        keep = np.zeros(n_pairs, dtype=bool)
        n_keep = int(n_pairs * rate)
        keep[self._np_rng.choice(n_pairs, size=n_keep, replace=False)] = True
        return keep

    # device variants: generate the randomness ON DEVICE (jitted, integer
    # counter folded into the key) so epoch updates upload nothing
    def _device_key(self):
        self._aug_counter = getattr(self, "_aug_counter", 0) + 1
        return self._aug_counter

    def _random_pairs_device(self, n):
        return _rand_pairs_jit(
            jnp.int32(self._device_key()),
            n=int(n),
            n_users=self.n_users,
            n_items=self.n_items,
            seed=self._aug_seed,
        )

    def _random_keep_mask_device(self, rate):
        n_pairs = len(self._dedup_train)
        return _rand_keep_jit(
            jnp.int32(self._device_key()),
            n_pairs=n_pairs,
            n_keep=int(n_pairs * rate),
            seed=self._aug_seed,
        )

    def _view_x0(self, params, buffers, rng, training):
        """Layer-0 input for view propagation (overridable: DOSE_aug2 feeds
        the aug feature matrix here)."""
        return self.inductive_rep_layer(params, buffers, rng=rng, training=training)

    def view_users(self, params, buffers, key, users, rng, training):
        """User rows of the representation propagated over view ``key``;
        feature-matrix dropout is re-drawn per view, as each reference
        get_*_rep call re-applies dropout (model.py:488-501)."""
        x0 = self._view_x0(params, buffers, rng, training)
        rep = view_propagate_mean(
            buffers["view_base"], buffers[key], x0, self.n_layers
        )
        return rep[users]

    # -- forward --------------------------------------------------------------
    def _main_forward(self, params, users, pos_items, neg_items, rng, training, b):
        rep = self.get_rep(params, rng=rng, training=training, buffers=b)
        users_r = rep[users]
        pos_r = rep[self.n_users + pos_items]
        neg_r = rep[self.n_users + neg_items]
        return users_r, pos_r, neg_r, l2_sq_rows(users_r, pos_r, neg_r)

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        b = self._buf(buffers)
        rng = rng if rng is not None else jax.random.key(0)
        r_main, r_view = jax.random.split(rng)
        users_r, pos_r, neg_r, l2 = self._main_forward(
            params, users, pos_items, neg_items, r_main, training, b
        )
        contrastive = self._contrastive(params, b, users, users_r, r_view, training)
        return users_r, pos_r, neg_r, l2, contrastive

    def _contrastive(self, params, b, users, users_r, rng, training):
        v = self.view_users(params, b, self.view_keys[0], users, rng, training)
        return info_nce(users_r, v, v)


# ---------------------------------------------------------------------------
# injection variants
# ---------------------------------------------------------------------------


class DOSE_aug(_DOSEBase):
    """Inject the aug_num LOWEST-cos-sim pairs (items negated before the
    top-k, model.py:503-545) into the adjacency (union)."""

    view_keys = ("aug_adj",)

    def _make_view(self, key, params):
        pairs = self._cos_pairs(params, self.aug_num, negate_items=True, device=True)
        return self.view_engine.make_view_on_device(add_pairs=pairs)


class DOSE_aug2(DOSE_aug):
    """DOSE_aug whose selection takes the HIGHEST-similarity pairs
    (model.py:1034-1051 has no negation) and which also rebuilds the feature
    matrix over the augmented graph (model.py:935-978).

    The aug feature matrix is STATIC-SHAPED: a bucketed base layout over the
    train edges (built once; annealed per epoch via with_annealed_values with
    the VIEW's row sums) plus a fixed-budget injected-entry delta COO
    (graph/views.py device_make_feat_delta + delta_spmm_rect) — per-epoch
    regeneration writes new value/delta arrays of fixed shapes, so the
    jitted train step never retraces (the repo's static-shape invariant;
    an earlier revision rebuilt a fresh bucketed layout per epoch, which
    recompiled the step every epoch)."""

    def _make_view(self, key, params):
        pairs_dev = self._cos_pairs(
            params, self.aug_num, negate_items=False, device=True
        )
        # pairs stay ON DEVICE; the host copy is fetched lazily only for the
        # one-time aug-core ranking (feature_ratio < 1) or the 32-bit-range
        # host fallback
        self._last_aug_pairs_dev = pairs_dev
        self._last_aug_pairs_host = None
        return self.view_engine.make_view_on_device(add_pairs=pairs_dev)

    def _aug_pairs_host(self):
        if getattr(self, "_last_aug_pairs_host", None) is None:
            self._last_aug_pairs_host = np.asarray(self._last_aug_pairs_dev)
        return self._last_aug_pairs_host

    def _aug_core_maps(self):
        """Core maps for the AUG feature matrix. With feature_ratio < 1 the
        reference re-selects the core from a ranking over the aug graph on
        the first build (graph_aug_rank_nodes, model.py:941) and keeps those
        maps on later epoch updates (is_updating=True); core sizes match the
        main maps so the shared embedding table indexes both."""
        if self.feature_ratio >= 1.0:
            return self.user_map, self.item_map
        if not hasattr(self, "aug_user_map"):
            from inductive_recommendation_tpu.graph.ranking import (
                graph_aug_rank_nodes,
            )

            ranked_u, ranked_i = graph_aug_rank_nodes(
                self.dataset, self.ranking_metric, self._aug_pairs_host()
            )
            # core sizes must EQUAL user_dim/item_dim (the shared embedding
            # table's layout) — recomputing int(n_users * ratio) here would
            # overflow the table after an attach_dataset grew the catalog
            core_u = ranked_u[: self.user_dim]
            core_i = ranked_i[: self.item_dim]
            um = np.full(self.n_users, -1, dtype=np.int64)
            um[core_u] = np.arange(len(core_u))
            im = np.full(self.n_items, -1, dtype=np.int64)
            im[core_i] = np.arange(len(core_i))
            self.aug_user_map, self.aug_item_map = um, im
        return self.aug_user_map, self.aug_item_map

    def attach_dataset(self, dataset):
        # extend the cached aug core maps with -1 for newly-appeared nodes,
        # exactly as IGCN.attach_dataset extends the main maps — stale
        # short maps would IndexError in the aug-feat rebuild
        if hasattr(self, "aug_user_map"):
            um = np.full(dataset.n_users, -1, dtype=np.int64)
            um[: len(self.aug_user_map)] = self.aug_user_map
            im = np.full(dataset.n_items, -1, dtype=np.int64)
            im[: len(self.aug_item_map)] = self.aug_item_map
            self.aug_user_map, self.aug_item_map = um, im
        super().attach_dataset(dataset)

    def checkpoint_aux(self):
        aux = dict(super().checkpoint_aux())
        if hasattr(self, "aug_user_map"):
            # the aug-core selection is made once from the FIRST aug graph
            # (is_updating=True keeps it thereafter) — persist it, a restore
            # must not re-select from a later epoch's pairs
            aux["aug_user_map"] = np.asarray(self.aug_user_map)
            aux["aug_item_map"] = np.asarray(self.aug_item_map)
        return aux

    def restore_aux(self, aux):
        if not aux:
            return
        aux = dict(aux)
        if "aug_user_map" in aux:
            self.aug_user_map = np.asarray(aux.pop("aug_user_map"))
            self.aug_item_map = np.asarray(aux.pop("aug_item_map"))
        super().restore_aux(aux)

    def _build_graph_buffers(self, dataset):
        # attach_dataset / restore rebuild everything; the static aug-feat
        # base (train edges + maps + row sums) is stale with it
        for attr in ("_aug_feat_base", "_aug_feat_static"):
            if hasattr(self, attr):
                delattr(self, attr)
        super()._build_graph_buffers(dataset)

    def _establish_views(self, dataset):
        super()._establish_views(dataset)
        if getattr(self, "_defer_views", False) or len(self._dedup_train) == 0:
            return
        # seed the aug-feat buffers with the train-only matrix (+ an
        # all-in-train, hence all-zero, delta) whenever the core maps are
        # already known (feature_ratio >= 1 -> the main maps; or maps
        # restored from a checkpoint): the buffers pytree is then
        # structurally stable from step 1 — without the seed the first
        # update_aug_adj ADDS the aug_feat/aug_feat_delta keys and the
        # whole train step retraces (minutes through the remote toolchain).
        # feature_ratio < 1 fresh runs select their core from the FIRST
        # real aug graph (reference model.py:941) and keep that one-time
        # retrace instead.
        if self.feature_ratio >= 1.0 or hasattr(self, "aug_user_map"):
            k = min(self.aug_num, self.n_users * self.n_items)  # _cos_pairs clamp
            self._last_aug_pairs_dev = jnp.tile(
                jnp.asarray(self._dedup_train[:1], jnp.int32), (k, 1)
            )
            self._last_aug_pairs_host = None
            self._update_aug_feat()

    def _update_views(self, params):
        super()._update_views(params)
        self._update_aug_feat()

    def _update_aug_feat(self):
        # aug feature matrix over train ∪ aug (model.py:935-978); the aug
        # pairs are self._last_aug_pairs_dev
        aug_user_map, aug_item_map = self._aug_core_maps()
        if self.n_users * self.n_items + max(self.aug_num, 1) >= 2**31:
            # pair keys exceed the 32-bit lattice: host rebuild fallback
            # (same matrix, per-epoch retrace cost)
            self._update_aug_feat_host(aug_user_map, aug_item_map)
            return
        from inductive_recommendation_tpu.graph import build_feat_matrix
        from inductive_recommendation_tpu.graph.views import device_make_feat_delta
        from inductive_recommendation_tpu.ops import build_bucketed_spmm

        if not hasattr(self, "_aug_feat_base"):
            row, col, counts, base_row_sum = build_feat_matrix(
                self._dedup_train,
                self.n_users,
                self.n_items,
                aug_user_map,
                aug_item_map,
            )
            self._aug_feat_base = build_bucketed_spmm(
                row,
                col,
                counts,
                (self.n_users + self.n_items, self.feat_n_cols),
                symmetric=False,
            )
            self._aug_feat_static = {
                "base_row_sum": jnp.asarray(base_row_sum),
                "user_map": jnp.asarray(aug_user_map, jnp.int32),
                "item_map": jnp.asarray(aug_item_map, jnp.int32),
            }
        s = self._aug_feat_static
        row_sum_view, *delta = device_make_feat_delta(
            self.view_engine._device_buffers()["train_keys"],
            s["user_map"],
            s["item_map"],
            s["base_row_sum"],
            self._last_aug_pairs_dev,
            jnp.float32(self.alpha),
            budget=max(self.aug_num, 1),
            n_users=self.n_users,
            n_items=self.n_items,
            user_dim=self.user_dim,
        )
        # annealed weights baked at rebuild time (the rebuild happens right
        # after feat_mat_anneal each epoch, so alpha is current); per-step
        # dropout is in-layout (spmm_bucketed_dropout / the delta entry
        # hash). The delta's per-epoch CHUNKED structures make the per-step
        # application scatter-free (graph/views.py chunked_* — 1.9x over
        # the segment-sum at 1M entries); the raw tuple stays as the oracle.
        from inductive_recommendation_tpu.graph.views import rect_chunk_pair

        if not hasattr(self, "_rect_ck_jit"):
            self._rect_ck_jit = jax.jit(
                rect_chunk_pair, static_argnames=("n_out", "n_in", "n_cols")
            )
        self.buffers = dict(
            self.buffers,
            aug_feat=self._anneal_jit(self._aug_feat_base, row_sum_view, self.alpha),
            aug_feat_delta=tuple(delta),
            aug_feat_delta_ck=self._rect_ck_jit(
                tuple(delta),
                n_out=self.n_users + self.n_items,
                n_in=self.feat_n_cols,
                n_cols=self.feat_n_cols,
            ),
        )

    def _update_aug_feat_host(self, aug_user_map, aug_item_map):
        from inductive_recommendation_tpu.graph import build_feat_matrix
        from inductive_recommendation_tpu.graph.build import aug_union_edges
        from inductive_recommendation_tpu.ops import build_bucketed_spmm

        union = aug_union_edges(self._dedup_train, self._aug_pairs_host())
        row, col, counts, row_sum = build_feat_matrix(
            union, self.n_users, self.n_items, aug_user_map, aug_item_map
        )
        aug_feat = build_bucketed_spmm(
            row,
            col,
            counts,
            (self.n_users + self.n_items, self.feat_n_cols),
            symmetric=False,
        )
        new = dict(
            self.buffers,
            aug_feat=self._anneal_jit(aug_feat, jnp.asarray(row_sum), self.alpha),
        )
        new.pop("aug_feat_delta", None)
        self.buffers = new

    def _view_x0(self, params, buffers, rng, training):
        if "aug_feat" not in buffers:
            # only reachable before the aug feat exists (feature_ratio < 1
            # fresh runs, whose core maps are selected from the FIRST real
            # aug graph): plain train-feat fallback
            return super()._view_x0(params, buffers, rng, training)
        from inductive_recommendation_tpu.graph.views import (
            delta_spmm_rect,
            delta_spmm_rect_dropout,
        )
        from inductive_recommendation_tpu.ops import spmm_bucketed
        from inductive_recommendation_tpu.ops.bucketed_spmm import (
            spmm_bucketed_dropout,
        )

        emb = params["embedding"][: self.feat_n_cols]
        delta = buffers.get("aug_feat_delta")
        ck = buffers.get("aug_feat_delta_ck")
        n_nodes = self.n_users + self.n_items
        if training and self.dropout > 0.0:
            x0 = spmm_bucketed_dropout(buffers["aug_feat"], emb, rng, self.dropout)
            if ck is not None:
                # scatter-free chunked delta with the SAME entry-key hash
                # masks as delta_spmm_rect_dropout (graph/views.py)
                from inductive_recommendation_tpu.graph.views import (
                    chunked_rect_delta_spmm_dropout,
                )

                x0 = x0 + chunked_rect_delta_spmm_dropout(
                    ck[0],
                    ck[1],
                    jax.random.key_data(rng),
                    jnp.asarray(self.dropout, jnp.float32),
                    emb,
                )
            elif delta is not None:  # segment-sum oracle fallback
                x0 = x0 + delta_spmm_rect_dropout(
                    n_nodes,
                    self.feat_n_cols,
                    delta,
                    jax.random.key_data(rng),
                    jnp.asarray(self.dropout, jnp.float32),
                    emb,
                )
        else:
            x0 = spmm_bucketed(buffers["aug_feat"], emb)
            if ck is not None:
                from inductive_recommendation_tpu.graph.views import (
                    chunked_delta_spmm,
                )

                x0 = x0 + chunked_delta_spmm(ck[0], ck[1], emb)
            elif delta is not None:
                x0 = x0 + delta_spmm_rect(n_nodes, delta, emb)
        return x0


class DOSE_aug3(_DOSEBase):
    """Random edge injection (model.py:1162-1176)."""

    view_keys = ("aug_adj",)

    def _make_view(self, key, params):
        return self.view_engine.make_view_on_device(
            add_pairs=self._random_pairs_device(self.aug_num)
        )

    def _initial_view(self, key):
        return self._make_view(key, None)


class DOSE_aug4(_DOSEBase):
    """Threshold injection: pairs with cos >= pai (model.py:750-769), capped
    at aug_num (see module docstring)."""

    view_keys = ("aug_adj",)

    def _make_view(self, key, params):
        # the pair-count cap is a trace constant: cache per k, or a stale
        # closure keeps the pre-attach_dataset catalog's (smaller) cap after
        # the catalog grows
        k = max(min(self.aug_num, self.n_users * self.n_items), 1)
        cache = getattr(self, "_thr_jits", None)
        if cache is None:
            cache = self._thr_jits = {}
        ck = (k, self.n_users, self.n_items)
        if ck not in cache:

            def select(params, buffers, pai, k=k):
                rep = self.get_rep(params, training=False, buffers=buffers)
                vals, uid, iid = blockwise_cosine_topk(
                    rep[: self.n_users], rep[self.n_users :], k, negate_items=False
                )
                pairs = jnp.stack(
                    [uid.astype(jnp.int32), iid.astype(jnp.int32)], axis=1
                )
                return pairs, vals >= pai

            cache[ck] = jax.jit(select)
        pairs, valid = cache[ck](params, self.buffers, jnp.float32(self.pai))
        return self.view_engine.make_view_on_device(add_pairs=pairs, add_valid=valid)


# ---------------------------------------------------------------------------
# drop variants
# ---------------------------------------------------------------------------


class DOSE_drop(_DOSEBase):
    """Drop the aug_num HIGHEST-cos-sim train pairs (set difference,
    model.py:1407-1418 + utils.py:123-141)."""

    view_keys = ("aug_adj",)
    injects_pairs = False  # drop-only: no delta entries in the hot step

    def _make_view(self, key, params):
        pairs = self._cos_pairs(params, self.aug_num, negate_items=False, device=True)
        return self.view_engine.make_view_on_device(
            keep_pair_mask=self.view_engine.keep_mask_from_drop_pairs_on_device(pairs)
        )


class DOSE_drop2(_DOSEBase):
    """Random drop keeping aug_rate of the train edges (model.py:1726-1736)."""

    view_keys = ("aug_adj",)
    injects_pairs = False  # drop-only (and TEST/TEST2 below): no delta entries

    def _make_view(self, key, params):
        return self.view_engine.make_view_on_device(
            keep_pair_mask=self._random_keep_mask_device(self.aug_rate)
        )

    def _initial_view(self, key):
        return self._make_view(key, None)


class DOSE_drop3(DOSE_drop):
    """Drop the aug_num LOWEST-cos-sim pairs (items negated before top-k,
    model.py:2748-2790)."""

    def _make_view(self, key, params):
        pairs = self._cos_pairs(params, self.aug_num, negate_items=True, device=True)
        return self.view_engine.make_view_on_device(
            keep_pair_mask=self.view_engine.keep_mask_from_drop_pairs_on_device(pairs)
        )


class TEST(DOSE_drop2):
    """DOSE_drop2 variant whose MAIN adjacency is also a random-drop graph
    (model.py:1989-1990; static for the run).

    The dropped MAIN graph is a bucketed layout (the per-step hot path must
    stay gather-only), and its keep mask is persisted in the checkpoint —
    restore_aux's buffer rebuild must restore THIS run's graph, not the full
    one (and not a resample; the reference's load would silently score on a
    freshly-sampled drop graph, model.py:601-613 + 1989-1990)."""

    def __init__(self, model_config, dataset):
        super().__init__(model_config, dataset)
        self._main_keep = self._random_keep_mask(self.aug_rate)
        self._apply_main_drop()

    def _apply_main_drop(self):
        from inductive_recommendation_tpu.graph.build import (
            sym_normalized_adjacency,
        )
        from inductive_recommendation_tpu.ops import build_bucketed_spmm

        pairs = self._dedup_train[self._main_keep]
        r, c, v = sym_normalized_adjacency(pairs, self.n_users, self.n_items)
        n = self.n_users + self.n_items
        self.buffers = dict(
            self.buffers,
            norm_adj=build_bucketed_spmm(r, c, v, (n, n), symmetric=True),
        )

    def _build_graph_buffers(self, dataset):
        super()._build_graph_buffers(dataset)
        if hasattr(self, "_main_keep"):
            if len(self._main_keep) != len(self._dedup_train):
                # dataset changed (inductive attach_dataset): resample at the
                # configured rate over the new edge set
                self._main_keep = self._random_keep_mask(self.aug_rate)
            self._apply_main_drop()

    def checkpoint_aux(self):
        aux = dict(super().checkpoint_aux())
        aux["main_keep"] = np.asarray(self._main_keep)
        return aux

    def restore_aux(self, aux):
        if not aux:
            return
        aux = dict(aux)
        if "main_keep" in aux:
            self._main_keep = np.asarray(aux.pop("main_keep")).astype(bool)
        super().restore_aux(aux)


class TEST2(DOSE_drop2):
    """Two random-drop views; InfoNCE BETWEEN the views (SGL-style on the
    IGCN base, model.py:2279-2280 + 2499-2514)."""

    view_keys = ("aug_adj", "aug_adj2")

    def _contrastive(self, params, b, users, users_r, rng, training):
        r1, r2 = jax.random.split(rng)
        v1 = self.view_users(params, b, "aug_adj", users, r1, training)
        v2 = self.view_users(params, b, "aug_adj2", users, r2, training)
        return info_nce(v1, v2, v2)


# ---------------------------------------------------------------------------
# combined variants
# ---------------------------------------------------------------------------


class DOSE_aug_drop(_DOSEBase):
    """Random-inject graph + random-drop graph, two InfoNCE terms summed.

    Reference quirk reproduced: BOTH view reps are propagated over the AUG
    graph (model.py:3140-3142 passes norm_aug_adj to get_drop_rep too), so
    the two terms differ only by feature-dropout noise; the drop graph is
    still built and regenerated."""

    view_keys = ("aug_adj", "drop_adj")

    def _make_view(self, key, params):
        if key == "aug_adj":
            return self.view_engine.make_view_on_device(
                add_pairs=self._random_pairs_device(self.aug_num)
            )
        return self.view_engine.make_view_on_device(
            keep_pair_mask=self._random_keep_mask_device(self.aug_rate)
        )

    def _initial_view(self, key):
        return self._make_view(key, None)

    def _contrastive(self, params, b, users, users_r, rng, training):
        r1, r2 = jax.random.split(rng)
        v_aug = self.view_users(params, b, "aug_adj", users, r1, training)
        v_drop = self.view_users(params, b, "aug_adj", users, r2, training)
        return info_nce(users_r, v_aug, v_aug) + info_nce(users_r, v_drop, v_drop)


class DOSE_aug_drop2(_DOSEBase):
    """Degree-ranked TAIL (cold) users/items only: inject the top-cos pairs
    among them (model.py:3291-3325); the 'drop' graph uses the reference's
    no-op drop (union, utils.py:105-121); loss uses the drop view only
    (model.py:3394-3407)."""

    view_keys = ("aug_adj", "drop_adj")

    def __init__(self, model_config, dataset):
        aug_ratio = model_config.get("aug_ratio", 0.2)
        self._rank_tails(dataset, aug_ratio)
        super().__init__(model_config, dataset)

    def _rank_tails(self, dataset, aug_ratio):
        ranked_users, ranked_items = graph_rank_nodes(dataset, "degree")
        self._tail_users = ranked_users[int(dataset.n_users * aug_ratio) :].copy()
        self._tail_items = ranked_items[int(dataset.n_items * aug_ratio) :].copy()

    def attach_dataset(self, dataset):
        # re-rank over the NEW dataset: the degree tail is exactly where
        # newly-appeared cold nodes live — the variant's selection must be
        # able to target them on the inductive path
        self._rank_tails(dataset, self.aug_ratio)
        super().attach_dataset(dataset)

    def _select(self, params):
        return self._cos_pairs(
            params,
            self.aug_num,
            negate_items=False,
            restrict=(self._tail_users, self._tail_items),
            device=True,
        )

    def _make_view(self, key, params):
        pairs = self._select(params)
        # both 'aug' and 'drop' resolve to the union (no-op drop quirk)
        return self.view_engine.make_view_on_device(add_pairs=pairs)

    def _update_views(self, params):
        # one selection, one view build/bake: both keys ARE the same union
        # graph (the reference's no-op drop) — do not run the full-catalog
        # cos-topk selection twice per epoch
        ev = self._make_view("aug_adj", params)
        v = bake_view(self.view_engine.base, ev)
        self.buffers = dict(self.buffers, aug_adj=v, drop_adj=v)
        self.edge_views = {"aug_adj": ev, "drop_adj": ev}

    def _contrastive(self, params, b, users, users_r, rng, training):
        v = self.view_users(params, b, "drop_adj", users, rng, training)
        return info_nce(users_r, v, v)


class DOSE_aug_drop3(_DOSEBase):
    """One top-cos selection feeds BOTH an injection graph and a difference
    drop graph (model.py:3473-3497); loss uses the drop view only
    (model.py:3626-3639)."""

    view_keys = ("aug_adj", "drop_adj")

    def _update_views(self, params):
        # ONE cos-topk selection feeds both graphs (model.py:3473-3497) —
        # a per-key _make_view recipe would re-run the full-catalog
        # selection twice
        eng = self.view_engine
        pairs = self._cos_pairs(params, self.aug_num, negate_items=False, device=True)
        aug = eng.make_view_on_device(add_pairs=pairs)
        drop = eng.make_view_on_device(
            keep_pair_mask=eng.keep_mask_from_drop_pairs_on_device(pairs)
        )
        self.buffers = dict(
            self.buffers,
            aug_adj=bake_view(eng.base, aug),
            drop_adj=bake_view(eng.base, drop),
        )
        self.edge_views = {"aug_adj": aug, "drop_adj": drop}

    def _contrastive(self, params, b, users, users_r, rng, training):
        v = self.view_users(params, b, "drop_adj", users, rng, training)
        return info_nce(users_r, v, v)


class DOSE_test(DOSE_aug):
    """DOSE_aug variant whose bpr_forward returns the aug-view user reps in
    the contrastive slot (model.py:3843-3855); DOSEtestTrainer then takes
    .mean() of it as the 'contrastive' regularizer — reproduced literally."""

    def bpr_forward(
        self, params, users, pos_items, neg_items, rng=None, training=True, buffers=None
    ):
        b = self._buf(buffers)
        rng = rng if rng is not None else jax.random.key(0)
        r_main, r_view = jax.random.split(rng)
        users_r, pos_r, neg_r, l2 = self._main_forward(
            params, users, pos_items, neg_items, r_main, training, b
        )
        aug_users_r = self.view_users(params, b, "aug_adj", users, r_view, training)
        return users_r, pos_r, neg_r, l2, aug_users_r
