"""Reference checkpoint importer: torch ``.pth`` state_dicts (raw and the
IGCN-family wrapper, reference model.py:49-53 / 4208-4220) convert into
msgpack checkpoints that load through the repo's own restore paths."""

import subprocess
import sys

import jax
import numpy as np
import pytest
import torch

from inductive_recommendation_tpu import get_dataset, get_model
from inductive_recommendation_tpu.train.checkpoint import (
    load_checkpoint,
    restore_like,
)
from inductive_recommendation_tpu.train.import_reference import (
    convert_reference_state,
    import_for_model,
    import_reference_checkpoint,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ds():
    return get_dataset(
        {
            "name": "SyntheticDataset",
            "n_users": 30,
            "n_items": 25,
            "n_interactions": 400,
            "seed": 5,
            "split_ratio": [0.8, 0.1, 0.1],
            "min_inter": 2,
        }
    )


def _t(rng, *shape):
    return torch.tensor(rng.normal(size=shape).astype(np.float32))


def test_lightgcn_table_roundtrip_with_alignment(ds, tmp_path, rng):
    n = ds.n_users + ds.n_items
    src, dst = tmp_path / "ref.pth", tmp_path / "out.ckpt"
    emb = _t(rng, n, 16)
    torch.save({"embedding.weight": emb}, src)

    model = get_model(
        {"name": "LightGCN", "embedding_size": 16, "n_layers": 2, "table_align": 8},
        ds,
    )
    import_for_model(src, dst, model)
    params = model.init_params(jax.random.key(0))
    payload = load_checkpoint(dst)
    restored = restore_like(params, payload["params"])
    # table rows land intact; alignment padding rows are zero
    np.testing.assert_array_equal(
        np.asarray(restored["embedding"])[:n], emb.numpy()
    )
    assert np.all(np.asarray(restored["embedding"])[n:] == 0)
    rep = model.get_rep(restored)
    assert np.isfinite(np.asarray(rep)).all()


def test_igcn_wrapper_with_dict_maps(ds, tmp_path, rng):
    model = get_model(
        {
            "name": "IGCN",
            "embedding_size": 8,
            "n_layers": 2,
            "dropout": 0.0,
            "feature_ratio": 0.8,
            "table_align": 8,
        },
        ds,
    )
    # reference-side maps are python dicts {node: core_idx}
    # (model.py:4150-4156); rebuild them from the repo model's core
    user_map = {
        int(u): int(model.user_map[u])
        for u in range(ds.n_users)
        if model.user_map[u] >= 0
    }
    item_map = {
        int(i): int(model.item_map[i])
        for i in range(ds.n_items)
        if model.item_map[i] >= 0
    }
    emb = _t(rng, model.feat_n_cols, 8)
    w = torch.tensor(rng.uniform(0.5, 1.5, 8).astype(np.float32))
    src, dst = tmp_path / "igcn.pth", tmp_path / "igcn.ckpt"
    torch.save(
        {
            "sate_dict": {"embedding.weight": emb, "w": w},
            "user_map": user_map,
            "item_map": item_map,
            "alpha": 0.97,
        },
        src,
    )
    import_for_model(src, dst, model)
    payload = load_checkpoint(dst)
    params = restore_like(model.init_params(jax.random.key(0)), payload["params"])
    np.testing.assert_array_equal(
        np.asarray(params["embedding"])[: model.feat_n_cols], emb.numpy()
    )
    np.testing.assert_array_equal(np.asarray(params["w"]), w.numpy())
    # restore like Trainer._load_model: maps + alpha then buffer rebuild
    model.restore_aux(payload["aux"])
    assert model.alpha == pytest.approx(0.97)
    np.testing.assert_array_equal(
        model.user_map, np.asarray(payload["aux"]["user_map"])
    )
    rep = model.get_rep(params)
    assert np.isfinite(np.asarray(rep)).all()


def test_idcf_runs_from_torch_lgcn_pth(ds, tmp_path, rng):
    """The VERDICT bar: IDCF_LGCN constructs from a torch-produced lgcn.pth
    converted by the CLI tool."""
    n = ds.n_users + ds.n_items
    src, dst = tmp_path / "lgcn.pth", tmp_path / "lgcn.ckpt"
    emb = _t(rng, n, 8)
    torch.save({"embedding.weight": emb}, src)
    out = subprocess.run(
        [sys.executable, "tools/import_reference_ckpt.py", str(src), str(dst)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    model = get_model(
        {
            "name": "IDCF_LGCN",
            "embedding_size": 8,
            "n_layers": 2,
            "n_headers": 2,
            "n_samples": 5,
            "lgcn_path": str(dst),
        },
        ds,
    )
    np.testing.assert_array_equal(
        np.asarray(model.buffers["frozen_embedding"]), emb.numpy()
    )
    params = model.init_params(jax.random.key(1))
    rep = model.get_rep(params)
    assert np.isfinite(np.asarray(rep)).all()


def test_idcf_trained_state_dict_converts(ds, tmp_path, rng):
    d, heads = 8, 2
    sd = {"embedding.weight": _t(rng, ds.n_users + ds.n_items, d)}
    for i in range(heads):
        for part in ("wq", "wk", "wv"):
            sd[f"gat_units.{i}.{part}.weight"] = _t(rng, d, d)
            sd[f"gat_units.{i}.{part}.bias"] = _t(rng, d)
    sd["w_out.weight"] = _t(rng, d, d * heads)
    sd["w_out.bias"] = _t(rng, d)
    params, aux = convert_reference_state(sd)
    assert len(params["gat_units"]) == heads
    # torch Linear weight [out, in] -> repo x @ w form
    x = rng.normal(size=(3, d * heads)).astype(np.float32)
    expect = x @ sd["w_out.weight"].numpy().T + sd["w_out.bias"].numpy()
    np.testing.assert_allclose(
        x @ np.asarray(params["w_out"]["w"]) + np.asarray(params["w_out"]["b"]),
        expect,
        rtol=1e-6,
    )


def test_mf_ngcf_neumf_multivae_convert_and_restore(ds, tmp_path, rng):
    """Every remaining trainable family round-trips into its repo param tree
    through restore_like (strict name/shape validation) and computes."""
    cases = []

    mf_sd = {
        "user_embedding.weight": _t(rng, ds.n_users, 8),
        "item_embedding.weight": _t(rng, ds.n_items, 8),
    }
    cases.append(
        ("MF", mf_sd, {"name": "MF", "embedding_size": 8, "table_align": 8})
    )

    ngcf_sd = {"embedding.weight": _t(rng, ds.n_users + ds.n_items, 8)}
    for kind in ("gc_layers", "bi_layers"):
        for i, (fin, fout) in enumerate([(8, 8), (8, 4)]):
            ngcf_sd[f"{kind}.{i}.weight"] = _t(rng, fout, fin)
            ngcf_sd[f"{kind}.{i}.bias"] = _t(rng, fout)
    cases.append(
        (
            "NGCF",
            ngcf_sd,
            {
                "name": "NGCF",
                "embedding_size": 8,
                "layer_sizes": [8, 4],
                "dropout": 0.0,
                "table_align": 1,
            },
        )
    )

    neumf_sd = {
        "mf_user_embedding.weight": _t(rng, ds.n_users, 8),
        "mf_item_embedding.weight": _t(rng, ds.n_items, 8),
        "mlp_user_embedding.weight": _t(rng, ds.n_users, 8),
        "mlp_item_embedding.weight": _t(rng, ds.n_items, 8),
        "mlp_layers.0.weight": _t(rng, 8, 16),
        "mlp_layers.0.bias": _t(rng, 8),
        "output_layer.weight": _t(rng, 1, 16),
    }
    cases.append(
        (
            "NeuMF",
            neumf_sd,
            {
                "name": "NeuMF",
                "embedding_size": 8,
                "layer_sizes": [16, 8],
                "table_align": 8,
            },
        )
    )

    n_items = ds.n_items
    vae_sd = {}
    sizes = [n_items, 16, 2 * 8]  # encoder ends at 2*mid (mu ++ logvar)
    dsizes = [8, 16, n_items]
    for i in range(2):
        vae_sd[f"encoder_layers.{i}.weight"] = _t(rng, sizes[i + 1], sizes[i])
        vae_sd[f"encoder_layers.{i}.bias"] = _t(rng, sizes[i + 1])
        vae_sd[f"decoder_layers.{i}.weight"] = _t(rng, dsizes[i + 1], dsizes[i])
        vae_sd[f"decoder_layers.{i}.bias"] = _t(rng, dsizes[i + 1])
    cases.append(
        (
            "MultiVAE",
            vae_sd,
            {
                "name": "MultiVAE",
                "layer_sizes": [16, 8],
                "dropout": 0.0,
                "table_align": 1,
            },
        )
    )

    for name, sd, mcfg in cases:
        src = tmp_path / f"{name}.pth"
        dst = tmp_path / f"{name}.ckpt"
        torch.save(sd, src)
        model = get_model(mcfg, ds)
        import_for_model(src, dst, model)
        template = model.init_params(jax.random.key(0))
        restored = jax.tree_util.tree_map(
            jax.numpy.asarray, restore_like(template, load_checkpoint(dst)["params"])
        )
        state = model.make_scoring_state(restored)
        scores = model.score(state, np.arange(4, dtype=np.int32))
        assert np.isfinite(np.asarray(scores)).all(), name
        assert np.asarray(scores).shape == (4, ds.n_items), name


def test_model_inference_and_unsupported(rng):
    sd = {"embedding.weight": _t(rng, 10, 4)}
    params, aux = convert_reference_state(sd)
    assert set(params) == {"embedding"} and aux == {}
    sd_igcn = {"embedding.weight": _t(rng, 10, 4), "w": _t(rng, 4)}
    params, _ = convert_reference_state(sd_igcn)
    assert set(params) == {"embedding", "w"}
    with pytest.raises(ValueError, match="cannot infer"):
        convert_reference_state({"mystery.weight": _t(rng, 3, 3)})


def test_dict_map_needs_catalog_size(tmp_path, rng):
    """A dict map whose keys stop short of the catalog must densify to the
    full length when sizes are passed (tail nodes -> -1)."""
    src = tmp_path / "igcn.pth"
    torch.save(
        {
            "sate_dict": {"embedding.weight": _t(rng, 6, 4), "w": _t(rng, 4)},
            "user_map": {0: 0, 2: 1},
            "item_map": {1: 0},
            "alpha": 1.0,
        },
        src,
    )
    params, aux = convert_reference_state(
        torch.load(src, weights_only=False), n_users=5, n_items=4
    )
    np.testing.assert_array_equal(aux["user_map"], [0, -1, 1, -1, -1])
    np.testing.assert_array_equal(aux["item_map"], [-1, 0, -1, -1])
