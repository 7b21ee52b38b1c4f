"""Import reference torch ``.pth`` checkpoints into this framework.

The reference persists trained artifacts in two torch formats:

- ``BasicModel.save`` (reference model.py:49-53): a raw ``state_dict``
  (tensor names like ``embedding.weight``, ``mlp_layers.0.bias``);
- the IGCN family — IGCN/IMF and every DOSE variant (model.py:4208-4220 and
  the per-variant copies, e.g. model.py:601-613): a wrapper dict
  ``{'sate_dict' (sic), 'user_map', 'item_map', 'alpha'}`` whose maps are
  python dicts ``{node_id: core_index}``.

This module converts either into this framework's msgpack checkpoint
(:mod:`inductive_recommendation_tpu.train.checkpoint`): params pytrees use
the repo's names/layouts (linear weights transposed to ``x @ w + b`` form,
core maps densified to -1-padded arrays), so ``Trainer._load_model`` /
``IDCF_LGCN(lgcn_path=...)`` consume them directly. Converted IGCN-family
checkpoints restore like the reference's own ``load``: maps + alpha + table,
with graph buffers (and DOSE views) rebuilt from the current dataset
(model.py:612-613; fresh-view semantics per model.py:601-613).

Row padding: repo tables may be row-aligned for the mesh 'model' axis
(``table_align``); pass the target model's ``init_params`` output as
``template`` (or use :func:`import_for_model`) to zero-pad the imported
tables to the aligned shapes. Padding rows are never indexed.
"""

from __future__ import annotations

import numpy as np

from inductive_recommendation_tpu.train.checkpoint import save_checkpoint

#: reference model classes whose ``save`` writes the IGCN-family wrapper
IGCN_FAMILY = (
    "IGCN",
    "IMF",
    "AttIGCN",
    "DOSE_aug",
    "DOSE_aug2",
    "DOSE_aug3",
    "DOSE_aug4",
    "DOSE_drop",
    "DOSE_drop2",
    "DOSE_drop3",
    "TEST",
    "TEST2",
    "DOSE_aug_drop",
    "DOSE_aug_drop2",
    "DOSE_aug_drop3",
    "DOSE_test",
)

#: reference models saving a single ``embedding.weight`` table
TABLE_MODELS = ("LightGCN", "SGL", "HALF", "IMCGAE", "IDCF_LGCN_pretrain")


def _np(x):
    """torch tensor / numpy / scalar -> numpy array on host."""
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _dense_map(map_like, length=None):
    """Reference core map (dict {node_id: core_idx} — model.py:4150-4156 —
    or already-dense array) -> -1-padded dense int64 array of ``length``."""
    if isinstance(map_like, dict):
        if not map_like:
            return np.full(int(length or 0), -1, dtype=np.int64)
        keys = np.asarray([int(k) for k in map_like.keys()], dtype=np.int64)
        vals = np.asarray([int(v) for v in map_like.values()], dtype=np.int64)
        n = int(length) if length is not None else int(keys.max()) + 1
        if keys.max() >= n:
            raise ValueError(
                f"core map has node id {keys.max()} but catalog size is {n} "
                "(pass the true n_users/n_items)"
            )
        out = np.full(n, -1, dtype=np.int64)
        out[keys] = vals
        return out
    arr = _np(map_like).astype(np.int64)
    if length is not None and len(arr) < int(length):
        arr = np.concatenate(
            [arr, np.full(int(length) - len(arr), -1, dtype=np.int64)]
        )
    return arr


def _linear(sd, prefix):
    """torch ``Linear`` (weight [out, in], bias [out]) -> repo
    ``{"w": [in, out], "b": [out]}`` (models/base.py::init_linear)."""
    w = _np(sd[prefix + ".weight"]).astype(np.float32)
    out = {"w": w.T.copy()}
    bias = prefix + ".bias"
    if bias in sd:
        out["b"] = _np(sd[bias]).astype(np.float32)
    else:
        out["b"] = np.zeros(w.shape[0], dtype=np.float32)
    return out


def _linear_list(sd, prefix):
    layers = []
    i = 0
    while f"{prefix}.{i}.weight" in sd:
        layers.append(_linear(sd, f"{prefix}.{i}"))
        i += 1
    return layers


def infer_model_name(payload):
    """Best-effort reference model class from a loaded ``.pth`` payload."""
    if isinstance(payload, dict) and "sate_dict" in payload:
        return "IGCN"  # any IGCN-family wrapper converts identically
    keys = set(payload.keys())
    if {"user_embedding.weight", "item_embedding.weight"} <= keys:
        return "MF"
    if "mf_user_embedding.weight" in keys:
        return "NeuMF"
    if "encoder_layers.0.weight" in keys:
        return "MultiVAE"
    if "gc_layers.0.weight" in keys:
        return "NGCF"
    if "gat_units.0.wq.weight" in keys:
        return "IDCF_LGCN"
    if {"embedding.weight", "w"} <= keys:
        return "IGCN"
    if "embedding.weight" in keys:
        return "LightGCN"
    raise ValueError(f"cannot infer reference model from keys {sorted(keys)[:8]}")


def convert_reference_state(payload, model_name=None, n_users=None, n_items=None):
    """Loaded torch payload -> (params pytree, aux dict) in repo layout.

    ``payload``: the object ``torch.load`` returns (raw state_dict or the
    IGCN-family wrapper); tensors may already be numpy. ``n_users``/
    ``n_items``: catalog sizes for densifying IGCN-family core maps (dict
    maps default to max-key+1, which under-sizes the array whenever the
    tail nodes are not core members — pass the true sizes).
    """
    model_name = model_name or infer_model_name(payload)

    aux = {}
    sd = payload
    if isinstance(payload, dict) and "sate_dict" in payload:
        if model_name not in IGCN_FAMILY:
            raise ValueError(
                f"wrapper checkpoint ('sate_dict') but model {model_name} is "
                "not in the IGCN family"
            )
        sd = payload["sate_dict"]
        aux = {
            "user_map": _dense_map(payload["user_map"], n_users),
            "item_map": _dense_map(payload["item_map"], n_items),
            "alpha": float(payload["alpha"]),
        }

    def table(key):
        return _np(sd[key]).astype(np.float32)

    if model_name in IGCN_FAMILY:
        params = {"embedding": table("embedding.weight")}
        if "w" in sd:
            params["w"] = _np(sd["w"]).astype(np.float32)
        else:
            # SGL-lineage variants keep w commented out (model.py:150);
            # repo IGCN always has it — the reference's effective scoring
            # weight is all-ones
            params["w"] = np.ones(params["embedding"].shape[1], np.float32)
        return params, aux
    if model_name in TABLE_MODELS:
        return {"embedding": table("embedding.weight")}, aux
    if model_name == "MF":
        return (
            {
                "user_embedding": table("user_embedding.weight"),
                "item_embedding": table("item_embedding.weight"),
            },
            aux,
        )
    if model_name == "NGCF":
        return (
            {
                "embedding": table("embedding.weight"),
                "gc_layers": _linear_list(sd, "gc_layers"),
                "bi_layers": _linear_list(sd, "bi_layers"),
            },
            aux,
        )
    if model_name == "MultiVAE":
        return (
            {
                "encoder": _linear_list(sd, "encoder_layers"),
                "decoder": _linear_list(sd, "decoder_layers"),
            },
            aux,
        )
    if model_name == "IDCF_LGCN":
        # the frozen pretrained table is a BUFFER here (loaded from
        # lgcn_path at construction), not a parameter; converting the same
        # .pth with model_name='LightGCN' extracts it as an lgcn checkpoint
        units = []
        i = 0
        while f"gat_units.{i}.wq.weight" in sd:
            units.append(
                {
                    "wq": _linear(sd, f"gat_units.{i}.wq"),
                    "wk": _linear(sd, f"gat_units.{i}.wk"),
                    "wv": _linear(sd, f"gat_units.{i}.wv"),
                }
            )
            i += 1
        return {"gat_units": units, "w_out": _linear(sd, "w_out")}, aux
    if model_name == "NeuMF":
        params = {
            "mf_user_embedding": table("mf_user_embedding.weight"),
            "mf_item_embedding": table("mf_item_embedding.weight"),
            "mlp_user_embedding": table("mlp_user_embedding.weight"),
            "mlp_item_embedding": table("mlp_item_embedding.weight"),
            "mlp_layers": _linear_list(sd, "mlp_layers"),
            # fusion layer is bias-free [1, D] (model.py:4426) -> [D]
            "output_w": _np(sd["output_layer.weight"]).astype(np.float32).ravel(),
        }
        # the reference persists the 3-phase arch implicitly via which run
        # saved it; repo BCETrainer restores arch from aux when present
        return params, aux
    raise ValueError(
        f"unsupported reference model {model_name!r}; supported: "
        f"{('MF', 'NGCF', 'MultiVAE', 'NeuMF', 'IDCF_LGCN') + TABLE_MODELS + IGCN_FAMILY}"
    )


def pad_like(params, template):
    """Zero-pad imported tables up to the template's row-aligned shapes
    (``table_align`` mesh padding; extra rows are never indexed)."""
    import jax

    def pad(t, p):
        t = np.asarray(t)
        p = np.asarray(p)
        if p.shape == t.shape:
            return p.astype(t.dtype)
        if (
            p.ndim == t.ndim
            and p.ndim >= 1
            and p.shape[1:] == t.shape[1:]
            and p.shape[0] <= t.shape[0]
        ):
            out = np.zeros(t.shape, t.dtype)
            out[: p.shape[0]] = p
            return out
        raise ValueError(f"imported leaf {p.shape} does not fit template {t.shape}")

    return jax.tree_util.tree_map(pad, template, params)


def load_torch_payload(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def import_reference_checkpoint(
    src, dst, model_name=None, n_users=None, n_items=None, template=None
):
    """Convert a reference ``.pth`` at ``src`` into a repo msgpack checkpoint
    at ``dst``. Returns (params, aux). ``template``: optional params pytree
    (e.g. ``model.init_params(key)``) to row-pad tables against."""
    payload = load_torch_payload(src)
    params, aux = convert_reference_state(
        payload, model_name=model_name, n_users=n_users, n_items=n_items
    )
    if template is not None:
        params = pad_like(params, template)
    save_checkpoint(dst, params, aux=aux)
    return params, aux


def import_for_model(src, dst, model, rng_seed: int = 0):
    """Convert against a constructed repo model: tables are padded to the
    model's aligned ``init_params`` shapes and core maps densified to its
    catalog sizes. The written checkpoint loads via ``Trainer._load_model``."""
    import jax

    template = model.init_params(jax.random.key(rng_seed))
    return import_reference_checkpoint(
        src,
        dst,
        model_name=type(model).__name__,
        n_users=model.n_users,
        n_items=model.n_items,
        template=template,
    )
