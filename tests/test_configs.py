"""Config grid parity: every entry resolves to registered components and the
counts/hyperparameters match the reference grids."""

from inductive_recommendation_tpu import configs
from inductive_recommendation_tpu.data.dataset import DATASETS
from inductive_recommendation_tpu.models import MODELS
from inductive_recommendation_tpu.train import TRAINERS


def _check_grid(grid):
    for dcfg, mcfg, tcfg in grid:
        assert dcfg["name"] in DATASETS
        assert mcfg["name"] in MODELS, mcfg["name"]
        assert tcfg["name"] in TRAINERS, tcfg["name"]
        assert tcfg["topks"][0] == 1 or tcfg["topks"] == [20]  # yelp NeuMF quirk
        if tcfg["name"] != "BasicTrainer":
            assert tcfg["n_epochs"] == 1000
            assert "lr" in tcfg and "l2_reg" in tcfg


def test_all_grids_resolve():
    sizes = {}
    for name in ["gowalla", "yelp", "amazon", "alibaba", "ml"]:
        grid = getattr(configs, f"get_{name}_config")(None)
        _check_grid(grid)
        sizes[name] = len(grid)
    # entry counts mirror reference config.py
    assert sizes == {"gowalla": 13, "yelp": 13, "amazon": 11, "alibaba": 13, "ml": 13}


def test_gowalla_spotchecks():
    grid = configs.get_gowalla_config(None)
    d, m, t = grid[0]
    assert m["name"] == "MF" and t["lr"] == 1e-4 and t["l2_reg"] == 1e-3
    d, m, t = grid[2]
    assert m["name"] == "IGCN" and t["name"] == "IGCNTrainer"
    assert t["aux_reg"] == 0.01 and m["dropout"] == 0.3
    d, m, t = grid[10]
    assert m["name"] == "DOSE_aug" and m["aug_num"] == 500000
    assert t["contrastive_reg"] == 0.1 and t["aux_reg"] == 0.001
    # NeuMF has neg_ratio on the dataset config and bce pretrain schedule
    d, m, t = grid[9]
    assert m["name"] == "NeuMF" and d["neg_ratio"] == 4
    assert t["mf_pretrain_epochs"] == 100 and t["test_batch_size"] == 64


def test_yelp_quirks():
    grid = configs.get_yelp_config(None)
    # DOSE_drop2 paired with IGCNTrainer (config.py:146-151)
    names = [(m["name"], t["name"]) for _, m, t in grid]
    assert ("DOSE_drop2", "IGCNTrainer") in names
    # yelp NeuMF uses lr 1e-2 and topks [20]
    for _, m, t in grid:
        if m["name"] == "NeuMF":
            assert t["lr"] == 1e-2 and t["topks"] == [20]


def test_main_driver_list(capsys):
    import main as main_mod

    main_mod.main(["--grid", "gowalla", "--list"])
    out = capsys.readouterr().out
    assert "LightGCN" in out and "DOSE_aug" in out


def test_cli_preprocess_roundtrip(tmp_path, capsys):
    """--preprocess parses a raw Gowalla file, k-cores, splits, and writes
    train/val/test.txt loadable by ProcessedDataset (the reference's implied
    offline step: raw dataset class -> output_dataset, dataset.py:133-137)."""
    import main as main_mod
    from inductive_recommendation_tpu import get_dataset

    lines = []
    for u in range(4):
        for j, i in enumerate(range(5)):
            lines.append(f"{u}\t2010-10-1{j}T0{u}:00:00Z\t0.0\t0.0\t{i}")
    (tmp_path / "Gowalla_totalCheckins.txt").write_text("\n".join(lines))
    out_dir = tmp_path / "time"
    main_mod.main(
        [
            "--preprocess", "gowalla",
            "--data-path", str(tmp_path),
            "--out-path", str(out_dir),
            "--min-inter", "2",
            "--split", "0.6", "0.2", "0.2",
        ]
    )
    assert "4 users x 5 items" in capsys.readouterr().out
    ds = get_dataset({"name": "ProcessedDataset", "path": str(out_dir)})
    assert ds.n_users == 4 and ds.n_items == 5
    assert all(len(ds.train_data[u]) == 3 for u in range(4))
    assert all(len(ds.test_data[u]) == 1 for u in range(4))
