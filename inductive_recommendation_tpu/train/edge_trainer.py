"""Edge-sharded training from the product surface.

`EdgeShardedTrainer` runs the SAME epoch / early-stop / checkpoint loop as
every other trainer, but with the graph, the embedding table AND the
optimizer moments edge-block-sharded over the mesh ``axis`` — per-device
memory O((|E| + n·d)/S). This is the MEMORY scale-out path (the reference's
single-device HBM ceiling on full-graph propagation, model.py:100-110); the
``mesh=`` data-parallel path in trainer.py is the THROUGHPUT scale-out.

Supported model/loss families (each routed to its parallel/step.py step):

- LightGCN -> BPR + L2 (``make_edge_sharded_bpr_step``)
- IGCN / IMF -> + aux BPR on the core table (``make_edge_sharded_igcn_step``;
  IMF is the n_layers=0 case)
- DOSE variants (ALL 13) -> + the variant's contrastive term over the
  per-epoch view(s) (``make_edge_sharded_dose_step``): single-view InfoNCE
  (DOSE_aug/aug2/aug3/aug4, DOSE_drop/2/3, DOSE_aug_drop2/3, TEST — whose
  main adjacency layout is built from its static dropped pair set),
  two-draw summed InfoNCE (DOSE_aug_drop), cross-view InfoNCE (TEST2), the
  literal view-mean slot (DOSE_test); view regeneration reaches the sharded
  layout through ``prepare_view``. DOSE_aug2's AUG feature matrix rides the
  step's ``aug_feat`` path: a static edge-sharded layout over the train
  feat entries + a fixed-budget injected-entry delta, re-valued per epoch
  (``prepare_aug_feat``) — fixed shapes, no retrace
- SGL / HALF -> BPR + rep-L2 + cross-view / main-vs-view InfoNCE over the
  LightGCN base (``make_edge_sharded_sgl_step``)
- AttIGCN -> attention-weighted inductive layer with the per-edge softmax
  itself sharded (``make_edge_sharded_att_igcn_step`` + parallel/attention.py)

Evaluation computes the main representation with the SAME edge-sharded
layouts (forward-only; layouts ride the evaluator's jitted scoring through
a buffers dict — never closure constants) and feeds the standard fused
device-metrics pipeline. Best-model checkpoints are saved in the MODEL's
own param layout, so they interoperate with single-device trainers and the
reference-checkpoint importer; ``save_state``/``load_state`` keep the edge
layout (full resume).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from inductive_recommendation_tpu.data.dataset import AuxiliaryDataset
from inductive_recommendation_tpu.data.sampling import build_sampler_state
from inductive_recommendation_tpu.train.checkpoint import (
    load_checkpoint,
    restore_like,
    save_checkpoint,
)
from inductive_recommendation_tpu.train.trainer import BasicTrainer, _epoch_mean

#: DOSE variants -> (contrastive mode, view keys feeding the loss);
#: see make_edge_sharded_dose_step's mode semantics
_DOSE_SUPPORTED = {
    "DOSE_aug": ("single", ("aug_adj",)),
    # aug2 additionally reads the AUG feature matrix in its view branch —
    # routed through the step's aug_feat path (fixed-budget sharded layout)
    "DOSE_aug2": ("single", ("aug_adj",)),
    "DOSE_aug3": ("single", ("aug_adj",)),
    "DOSE_aug4": ("single", ("aug_adj",)),
    "DOSE_drop": ("single", ("aug_adj",)),
    "DOSE_drop2": ("single", ("aug_adj",)),
    "DOSE_drop3": ("single", ("aug_adj",)),
    "DOSE_aug_drop2": ("single", ("drop_adj",)),  # drop view (== union quirk)
    "DOSE_aug_drop3": ("single", ("drop_adj",)),  # difference-drop view
    # both reference terms propagate over the AUG view (model.py:3140-3142)
    "DOSE_aug_drop": ("double_same", ("aug_adj",)),
    "TEST2": ("cross", ("aug_adj", "aug_adj2")),
    # TEST's MAIN adjacency is a static dropped graph (model.py:1989-1990):
    # the main layout is built from the dropped pair set instead of the
    # full train graph; its contrastive view is DOSE_drop2's
    "TEST": ("single", ("aug_adj",)),
    "DOSE_test": ("mean", ("aug_adj",)),
}


class _EdgeRepScoring:
    """Model shim for the evaluator: scoring state = the main representation
    computed over the edge-sharded layouts (carried in ``buffers`` — jit
    ARGUMENTS, never closure constants). Everything else delegates."""

    def __init__(self, model, rep_fn, extra_buffers):
        self._model = model
        self._rep = rep_fn
        self._extra = extra_buffers

    @property
    def buffers(self):
        # rebuilt per access: the model's buffers change per epoch (alpha)
        return dict(self._model.buffers, **self._extra)

    def make_scoring_state(self, params, buffers=None):
        return self._rep(params, self.buffers if buffers is None else buffers)

    def trace_signature(self):
        return ("edge_rep", self._model.trace_signature())

    def __getattr__(self, name):
        return getattr(self._model, name)


class EdgeShardedTrainer(BasicTrainer):
    """See module docstring. Config keys beyond BasicTrainer's: ``mesh``
    (required), ``edge_axis`` (default 'model'), the family's regs
    (``l2_reg`` always; ``aux_reg`` for IGCN/DOSE; ``contrastive_reg`` for
    DOSE)."""

    def __init__(self, trainer_config, dataset, model):
        cfg = dict(trainer_config)
        mesh = cfg.pop("mesh", None)
        if mesh is None:
            raise ValueError("EdgeShardedTrainer requires a mesh")
        self.edge_mesh = mesh
        self.axis = cfg.get("edge_axis", "model")
        self.n_shards = mesh.shape[self.axis]
        # BasicTrainer bookkeeping WITHOUT its data-parallel mesh plumbing
        super().__init__(cfg, dataset, model)
        # …but eval/serving ARE mesh-aware (round-4): rebuild the evaluator
        # around the edge mesh so `evaluate` shards each user batch across
        # every device and `recommend` takes the item-sharded k-way-merge
        # path (parallel/eval.py) with the edge rep — the catalog sizes edge
        # mode targets are exactly where single-layout serving stops fitting
        from inductive_recommendation_tpu.eval.evaluator import Evaluator

        self.evaluator = Evaluator(
            dataset, self.topks, cfg.get("test_batch_size", 512), mesh=mesh
        )
        self._family, self._view_key = self._detect_family(model)
        self.l2_reg = cfg["l2_reg"]
        self.aux_reg = cfg.get("aux_reg", 0.0)
        self.contrastive_reg = cfg.get("contrastive_reg", 0.0)
        # model-layout template (shapes/dtypes only) for checkpoint interop —
        # captured from the dense init params BEFORE the edge re-layout
        self._model_template = jax.tree_util.tree_map(
            lambda v: np.zeros(np.shape(v), np.asarray(v).dtype), self.params
        )
        self.initialize_optimizer()
        self.sampler = build_sampler_state(dataset.train_data, dataset.n_items)
        self._build_steps()
        # replace the dense init params with the padded sharded layout
        self.params = self._shard_model_params(self.params)
        self.opt_state = self.optimizer.init(self.params)

    # -- family routing -------------------------------------------------------
    @staticmethod
    def _detect_family(model):
        from inductive_recommendation_tpu.models.att_igcn import AttIGCN
        from inductive_recommendation_tpu.models.dose import _DOSEBase
        from inductive_recommendation_tpu.models.idcf import IDCF_LGCN
        from inductive_recommendation_tpu.models.igcn import IGCN, IMF
        from inductive_recommendation_tpu.models.imcgae import IMCGAE
        from inductive_recommendation_tpu.models.lightgcn import LightGCN
        from inductive_recommendation_tpu.models.ngcf import NGCF
        from inductive_recommendation_tpu.models.sgl import SGL

        name = type(model).__name__
        if isinstance(model, _DOSEBase):
            if name not in _DOSE_SUPPORTED:
                raise ValueError(
                    f"{name} has no edge-sharded routing; "
                    f"supported: {sorted(_DOSE_SUPPORTED)}"
                )
            return "dose", _DOSE_SUPPORTED[name]
        if isinstance(model, AttIGCN):
            return "att_igcn", None
        if isinstance(model, (IGCN, IMF)):
            return "igcn", None
        if isinstance(model, SGL):
            from inductive_recommendation_tpu.models.sgl import HALF

            if isinstance(model, HALF):
                return "sgl", ("single", ("aug_adj1",))
            return "sgl", ("cross", ("aug_adj1", "aug_adj2"))
        if isinstance(model, LightGCN):
            return "bpr", None
        if isinstance(model, NGCF):
            return "ngcf", None
        if isinstance(model, IMCGAE):
            return "imcgae", None
        if isinstance(model, IDCF_LGCN):
            return "idcf", None
        raise ValueError(
            f"{name} has no edge-sharded step (supported: every full-graph "
            f"propagation model — LightGCN, SGL/HALF, NGCF, IMCGAE, "
            f"IDCF_LGCN, IGCN/IMF/AttIGCN and every DOSE variant; MF/NeuMF/"
            f"MultiVAE/ItemKNN have no O(|E|) propagation to shard — use "
            f"mesh_mode='data')"
        )

    # -- step + eval construction ---------------------------------------------
    def _build_steps(self):
        from inductive_recommendation_tpu.parallel.spmm import (
            build_edge_sharded_spmm,
        )
        from inductive_recommendation_tpu.parallel.step import (
            make_edge_sharded_bpr_step,
            make_edge_sharded_dose_step,
            make_edge_sharded_igcn_step,
        )

        ds, model, mesh, S = self.dataset, self.model, self.edge_mesh, self.n_shards
        n = ds.n_users + ds.n_items
        row_spec = NamedSharding(mesh, P(self.axis, None))
        self._row_spec = row_spec

        if self._family in ("bpr", "sgl"):
            from inductive_recommendation_tpu.graph.build import (
                sym_normalized_adjacency,
            )

            r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
            emat = build_edge_sharded_spmm(r, c, v, (n, n), S)
            self._emat = emat
            if self._family == "bpr":
                estep = make_edge_sharded_bpr_step(
                    emat,
                    mesh,
                    self.optimizer,
                    self.sampler,
                    self.batch_size,
                    self.l2_reg,
                    ds.n_users,
                    model.n_layers,
                    axis=self.axis,
                    base_seed=self.seed,
                )
                self._run_step = lambda seed: estep(self.params, self.opt_state, seed)
            else:
                from inductive_recommendation_tpu.parallel.step import (
                    make_edge_sharded_sgl_step,
                )

                mode, _keys = self._view_key
                estep, prep = make_edge_sharded_sgl_step(
                    model,
                    mesh,
                    self.optimizer,
                    self.sampler,
                    self.batch_size,
                    self.l2_reg,
                    self.contrastive_reg,
                    axis=self.axis,
                    base_seed=self.seed,
                    adj_emat=emat,
                    contrastive=mode,
                )
                self._prep_view = prep
                self._vstate = self._prepare_views()
                self._run_step = lambda seed: estep(
                    self.params, self.opt_state, seed, self._vstate
                )
            # eval rep = the STEP's own propagation over the main adjacency
            # (SGL/HALF score with the main rep too, models/sgl.py) — one
            # forward definition per family, shared train/eval
            self._scoring = _EdgeRepScoring(
                model, estep.eval_rep, {"edge_fwd": emat.fwd, "edge_bwd": emat.bwd}
            )
            return

        if self._family in ("ngcf", "imcgae", "idcf"):
            from inductive_recommendation_tpu.parallel.step import (
                make_edge_sharded_idcf_step,
                make_edge_sharded_imcgae_step,
                make_edge_sharded_ngcf_step,
            )

            common = dict(axis=self.axis, base_seed=self.seed)
            if self._family == "ngcf":
                estep = make_edge_sharded_ngcf_step(
                    model, mesh, self.optimizer, self.sampler,
                    self.batch_size, self.l2_reg, **common,
                )
                self._emat = estep.emat
                extra = {"edge_fwd": estep.emat.fwd, "edge_bwd": estep.emat.bwd}
            elif self._family == "imcgae":
                estep = make_edge_sharded_imcgae_step(
                    model, mesh, self.optimizer, self.sampler,
                    self.batch_size, self.l2_reg, **common,
                )
                self._emat = estep.emat
                extra = {"edge_fwd": estep.emat.fwd, "edge_bwd": estep.emat.bwd}
            else:
                estep = make_edge_sharded_idcf_step(
                    model, mesh, self.optimizer, self.sampler,
                    self.batch_size, self.l2_reg, self.contrastive_reg,
                    **common,
                )
                # IDCF's trainable params are all small/replicated; the
                # sharded objects are the graph layouts + the frozen table
                self._emat = estep.adj_emat
                extra = {
                    "edge_feat_fwd": estep.feat_emat.fwd,
                    "edge_feat_bwd": estep.feat_emat.bwd,
                    "edge_adj_fwd": estep.adj_emat.fwd,
                    "edge_adj_bwd": estep.adj_emat.bwd,
                    "edge_frozen": estep.frozen_sh,
                }
            self._run_step = lambda seed: estep(self.params, self.opt_state, seed)
            self._scoring = _EdgeRepScoring(model, estep.eval_rep, extra)
            return

        # IGCN / DOSE: shared feat + adjacency layouts for step AND eval
        from inductive_recommendation_tpu.graph import build_feat_matrix
        from inductive_recommendation_tpu.graph.build import sym_normalized_adjacency

        frow, fcol, fval, row_sum = build_feat_matrix(
            ds.train_array, ds.n_users, ds.n_items, model.user_map, model.item_map
        )
        feat_emat = build_edge_sharded_spmm(
            frow, fcol, fval, (n, model.feat_n_cols), S
        )
        from inductive_recommendation_tpu.models.dose import TEST

        if isinstance(model, TEST):
            # TEST's main adjacency is its static dropped graph
            # (model.py:1989-1990) — the layout must be built from the SAME
            # pair set the model scored with (snapshot for stale detection
            # after a checkpoint restore)
            self._test_main_keep = np.asarray(model._main_keep).copy()
            pairs = model._dedup_train[model._main_keep]
            r, c, v = sym_normalized_adjacency(pairs, ds.n_users, ds.n_items)
        else:
            r, c, v = sym_normalized_adjacency(ds.train_array, ds.n_users, ds.n_items)
        adj_emat = build_edge_sharded_spmm(r, c, v, (n, n), S)
        self._emat = feat_emat

        aux = AuxiliaryDataset(ds, model.user_map, model.item_map)
        self.aux_sampler = build_sampler_state(aux.train_data, aux.n_items)

        from inductive_recommendation_tpu.models.igcn import IMF

        # IMF's rep is the inductive layer ONLY (model.py:4290-4297): the
        # propagation loop degenerates to rep = x0 at zero layers
        n_layers_eff = 0 if isinstance(model, IMF) else model.n_layers

        # attention pieces are built ONCE and shared by the step and the
        # eval path (build_attention_perm is an O(S·n) host pass)
        attn_fn = attn_perm = None
        if self._family == "att_igcn":
            from inductive_recommendation_tpu.parallel.attention import (
                build_attention_perm,
                make_edge_sharded_attention,
            )

            attn_fn = make_edge_sharded_attention(
                feat_emat, mesh, self.axis, temperature=model.temperature
            )
            attn_perm = build_attention_perm(feat_emat)

        if self._family == "att_igcn":
            from inductive_recommendation_tpu.parallel.step import (
                make_edge_sharded_att_igcn_step,
            )

            estep = make_edge_sharded_att_igcn_step(
                model,
                mesh,
                self.optimizer,
                self.sampler,
                self.aux_sampler,
                self.batch_size,
                self.l2_reg,
                self.aux_reg,
                axis=self.axis,
                base_seed=self.seed,
                feat_emat=feat_emat,
                adj_emat=adj_emat,
                feat_coo=(frow, fcol, fval, row_sum),
                attn_fn=attn_fn,
                attn_perm=attn_perm,
            )
            self._run_step = lambda seed: estep(self.params, self.opt_state, seed)
        elif self._family == "igcn":
            estep = make_edge_sharded_igcn_step(
                feat_emat,
                adj_emat,
                frow,
                row_sum,
                mesh,
                self.optimizer,
                self.sampler,
                self.aux_sampler,
                self.batch_size,
                self.l2_reg,
                self.aux_reg,
                ds.n_users,
                model.user_dim,
                n_layers_eff,
                model.dropout,
                axis=self.axis,
                base_seed=self.seed,
            )
            self._run_step = lambda seed: estep(
                self.params, self.opt_state, seed, alpha=self.model.alpha
            )
        else:
            mode, _keys = self._view_key
            # DOSE_aug2's aug-feat layout needs the AUG core maps; with
            # feature_ratio < 1 those are selected from the FIRST real aug
            # graph (models/dose.py) — until then the step runs in the plain
            # DOSE_aug shape and _refresh_views activates the layout later
            use_aug_feat = self._uses_aug_feat() and self._aug_feat_ready()
            estep, prep, _ = make_edge_sharded_dose_step(
                model,
                mesh,
                self.optimizer,
                self.sampler,
                self.aux_sampler,
                self.batch_size,
                self.l2_reg,
                self.aux_reg,
                self.contrastive_reg,
                axis=self.axis,
                base_seed=self.seed,
                feat_emat=feat_emat,
                adj_emat=adj_emat,
                contrastive=mode,
                feat_coo=(frow, fcol, fval, row_sum),
                aug_feat=use_aug_feat,
            )
            self._aug_feat_active = use_aug_feat
            self._estep = estep
            self._prep_view = prep
            self._vstate = self._prepare_views()
            self._aug_state = (
                estep.prepare_aug_feat(
                    self.model._last_aug_pairs_dev, self.model.alpha
                )
                if use_aug_feat
                else None
            )
            self._run_step = lambda seed: estep(
                self.params,
                self.opt_state,
                seed,
                self._vstate,
                alpha=self.model.alpha,
                aug_state=self._aug_state,
            )

        # eval rep = the STEP's own forward (one definition per family,
        # parallel/step.py) over buffers carried as jit arguments; alpha
        # rides the MODEL buffers (updated by feat_mat_anneal), so the
        # evaluator's jitted scoring never retraces per epoch
        frow_st = jax.device_put(
            np.asarray(frow, np.int32)[np.asarray(feat_emat.eid_map)], row_spec
        )
        extra = {
            "edge_feat_fwd": feat_emat.fwd,
            "edge_feat_bwd": feat_emat.bwd,
            "edge_adj_fwd": adj_emat.fwd,
            "edge_adj_bwd": adj_emat.bwd,
            "edge_frow": frow_st,
            "edge_rs": jnp.asarray(row_sum, jnp.float32),
        }
        if self._family == "att_igcn":
            extra["edge_attn_perm"] = attn_perm
        self._scoring = _EdgeRepScoring(model, estep.eval_rep, extra)

    def _prepare_views(self):
        """Re-index the model's freshly regenerated EdgeView(s) into the
        sharded layout's local edge space (once per epoch)."""
        _, keys = self._view_key
        states = tuple(self._prep_view(self.model.edge_views[k]) for k in keys)
        return states if len(states) > 1 else states[0]

    # -- DOSE_aug2 aug-feat activation/refresh --------------------------------
    def _uses_aug_feat(self):
        from inductive_recommendation_tpu.models.dose import DOSE_aug2

        return self._family == "dose" and isinstance(self.model, DOSE_aug2)

    def _aug_feat_ready(self):
        """The AUG core maps exist (feature_ratio >= 1 -> the main maps;
        < 1 -> selected from the first real aug graph or restored)."""
        return self.model.feature_ratio >= 1.0 or hasattr(
            self.model, "aug_user_map"
        )

    def _refresh_views(self):
        """Recompute the per-epoch sharded view state — and DOSE_aug2's
        aug-feat state — from the model's freshly (re)generated views."""
        if (
            self._uses_aug_feat()
            and not self._aug_feat_active
            and self._aug_feat_ready()
        ):
            # the aug core maps just appeared (first update_aug_adj of a
            # feature_ratio<1 run, or a restore that brought them): build
            # the aug-feat layout — the edge analog of the single-device
            # path's one-time retrace (models/dose.py _establish_views)
            self._build_steps()
            return
        self._vstate = self._prepare_views()
        if getattr(self, "_aug_feat_active", False):
            self._aug_state = self._estep.prepare_aug_feat(
                self.model._last_aug_pairs_dev, self.model.alpha
            )

    # -- params layout conversion ---------------------------------------------
    def _shard_model_params(self, params):
        """Model-layout params -> padded edge layout on the mesh. Only the
        embedding table re-lays out; nested sub-dicts (AttIGCN's weight_q/
        weight_k) and vectors are copied (the step donates params).
        IMCGAE's table splits: personal rows sharded, the 3 shared rows
        (identical/general-user/general-item) replicated."""
        if self._family == "imcgae":
            emb = jnp.asarray(params["embedding"])
            n = self.dataset.n_users + self.dataset.n_items
            pers = emb[:n]
            pad = self._emat.n_cols_pad - n
            pers = jnp.concatenate(
                [pers, jnp.zeros((pad, emb.shape[1]), emb.dtype)]
            )
            return {
                "embedding": jax.device_put(pers, self._row_spec),
                "special": jnp.array(emb[n : n + 3]),
            }
        out = {}
        for k, v in params.items():
            if k == "embedding":
                v = jnp.asarray(v)
                pad = self._emat.n_cols_pad - v.shape[0]
                if pad < 0:
                    v = v[: self._emat.n_cols_pad]
                    pad = 0
                v = jnp.concatenate([v, jnp.zeros((pad, v.shape[1]), v.dtype)])
                out[k] = jax.device_put(v, self._row_spec)
            else:
                out[k] = jax.tree_util.tree_map(jnp.array, v)
        return out

    def _to_model_params(self, params):
        """Edge-layout params -> the model's own init_params layout (host)."""
        if self._family == "imcgae":
            t = np.asarray(self._model_template["embedding"])
            n = self.dataset.n_users + self.dataset.n_items
            out = np.zeros(t.shape, t.dtype)
            out[:n] = np.asarray(jax.device_get(params["embedding"]))[:n]
            out[n : n + 3] = np.asarray(jax.device_get(params["special"]))
            return {"embedding": out}

        def conv(t, s):
            src = np.asarray(jax.device_get(s))
            t = np.asarray(t)
            if src.shape == t.shape:
                return src
            dst = np.zeros(t.shape, t.dtype)
            m = min(t.shape[0], src.shape[0])
            dst[:m] = src[:m]
            return dst

        return jax.tree_util.tree_map(conv, self._model_template, dict(params))

    def _shard(self, tree):
        """Re-place restored host arrays: edge-padded tables (and their adam
        moments) back onto the mesh; everything else replicated."""
        if not hasattr(self, "_emat"):  # init-time call before _build_steps
            return tree
        rows = self._emat.n_cols_pad

        def place(v):
            if hasattr(v, "ndim") and getattr(v, "ndim", 0) == 2 and v.shape[0] == rows:
                return jax.device_put(jnp.asarray(v), self._row_spec)
            return v

        return jax.tree_util.tree_map(place, tree)

    # -- inductive catalog growth (reference trainer.py:212-253 +
    # model.py:4177-4200) ------------------------------------------------------
    def attach_dataset(self, dataset):
        """Inductive protocol under edge mode: attach the grown dataset
        (train ∪ new interactions) to the model AND rebuild the sharded
        layouts, samplers and evaluator around it — trained params and
        optimizer state are KEPT (the IGCN family's table is core-sized, so
        catalog growth changes only the graph layouts, never the table)."""
        if not hasattr(self.model, "attach_dataset"):
            raise ValueError(
                f"{type(self.model).__name__} has no inductive attach path "
                f"(retrain-free catalog growth is the IGCN family's "
                f"template-row property)"
            )
        self.model.attach_dataset(dataset)
        self._rebind_dataset(dataset)

    def _rebind_dataset(self, dataset):
        from inductive_recommendation_tpu.eval.evaluator import Evaluator

        self.dataset = dataset
        self.steps_per_epoch = max(1, -(-len(dataset) // self.batch_size))
        self.sampler = build_sampler_state(dataset.train_data, dataset.n_items)
        self.evaluator = Evaluator(
            dataset,
            self.topks,
            self.config.get("test_batch_size", 512),
            mesh=self.edge_mesh,
        )
        # rebuilds every layout, the aux sampler, the per-epoch view state
        # and the eval scoring from the grown graph; params keep their
        # (unchanged) edge layout — feat_n_cols is fixed by the core maps
        self._build_steps()

    # -- training loop ---------------------------------------------------------
    def _check_dataset_unchanged(self):
        # a DIRECT model.attach_dataset(...) (the single-device UX) leaves
        # the sharded layouts stale — rebuild them around the model's
        # current dataset instead of failing
        if self.model.dataset is not self.dataset:
            self._rebind_dataset(self.model.dataset)

    def train_one_epoch(self):
        self._check_dataset_unchanged()
        losses = []
        with self.edge_mesh:
            for _ in range(self.steps_per_epoch):
                self.params, self.opt_state, loss = self._run_step(
                    self._next_seed()
                )
                losses.append(loss)
        if self._family in ("igcn", "att_igcn", "dose"):
            # AttIGCN's alpha is pinned at 0, so its anneal is a numeric
            # no-op — called anyway to keep model buffers/aux in sync with
            # the single-device IGCNTrainer epoch
            self.model.feat_mat_anneal()
        if self._family == "dose":
            # the EDGE params feed the selection directly: every model read
            # slices [:feat_n_cols] itself, so no layout conversion — and no
            # full-table device->host->device round trip — is needed
            self.model.update_aug_adj(self.params)
            self._refresh_views()
        elif self._family == "sgl":
            # random drop views: no param read (trainer.py:458)
            self.model.update_aug_adj()
            self._vstate = self._prepare_views()
        return _epoch_mean(losses)

    # -- evaluation -------------------------------------------------------------
    def eval(self, val_or_test, banned_items=None):
        self._check_dataset_unchanged()
        with self.edge_mesh:
            return self.evaluator.evaluate(
                self._scoring, self.params, val_or_test, banned_items=banned_items
            )

    def inductive_eval(self, n_old_users, n_old_items):
        self._check_dataset_unchanged()
        with self.edge_mesh:
            return self.evaluator.inductive_eval(
                self._scoring, self.params, n_old_users, n_old_items
            )

    def recommend(self, stage="test", banned_items=None):
        """Serving from the edge-sharded rep: the scoring state is the
        step's own forward over the sharded layouts, and the mesh evaluator
        routes it through the item-sharded per-device-top-k + k-way merge
        (parallel/eval.py) — results match the single-device trainer's
        ``recommend`` on the same params."""
        self._check_dataset_unchanged()
        with self.edge_mesh:
            return self.evaluator.recommend(
                self._scoring, self.params, stage, banned_items=banned_items
            )

    # -- checkpointing -----------------------------------------------------------
    def _save_model(self, path):
        # best-model checkpoints use the MODEL's layout: interoperable with
        # single-device trainers and the reference importer
        save_checkpoint(
            path, self._to_model_params(self.params), aux=self.model.checkpoint_aux()
        )

    def _load_model(self, path):
        payload = load_checkpoint(path)
        mp = restore_like(self._model_template, payload["params"])
        self.model.restore_aux(payload.get("aux", {}))
        # restore-THEN-rebuild, like BasicTrainer._load_model: the DOSE view
        # regeneration must select from the RESTORED params, not the
        # pre-restore ones (model reads slice [:feat_n_cols], so the edge
        # layout is directly consumable)
        self.params = self._shard_model_params(mp)
        self._rebuild_model_views()
        self._check_test_main_graph()
        if self._family in ("dose", "sgl"):
            self._refresh_views()

    def load_state(self, path):
        super().load_state(path)  # edge-layout params/opt restored + _shard
        self._check_test_main_graph()
        if self._family in ("dose", "sgl"):
            self._refresh_views()

    def _check_test_main_graph(self):
        """TEST's main-graph layout was built from the construction-time drop
        mask; a restore that brings a DIFFERENT mask (checkpoint from another
        seed/run) would leave it silently stale — rebuild the layouts."""
        if getattr(self, "_test_main_keep", None) is None:
            return
        cur = np.asarray(self.model._main_keep)
        if cur.shape == self._test_main_keep.shape and np.array_equal(
            cur, self._test_main_keep
        ):
            return
        self._build_steps()
