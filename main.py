"""Experiment driver.

The reference ships no entry script (SURVEY §3: the driver is implied —
init_run -> get_*_config -> get_dataset/get_model/get_trainer -> train ->
inductive_eval). This is that driver, as a thin CLI:

    python main.py --grid gowalla --index 1                # LightGCN
    python main.py --grid gowalla --index 2 --stage test   # IGCN, test eval
    python main.py --grid ml --list                        # show the grid
"""

from __future__ import annotations

import argparse
import json


def build_argparser():
    p = argparse.ArgumentParser(description="TPU inductive-recommendation runner")
    p.add_argument(
        "--grid",
        choices=["gowalla", "yelp", "amazon", "alibaba", "ml"],
        default="gowalla",
    )
    p.add_argument("--index", type=int, default=0, help="grid entry index")
    p.add_argument("--list", action="store_true", help="print the grid and exit")
    p.add_argument("--log-path", default=None, help="redirect output via init_run")
    p.add_argument("--seed", type=int, default=2021)
    p.add_argument("--n-epochs", type=int, default=None, help="override epochs")
    p.add_argument(
        "--stage", choices=["val", "test"], default="val", help="final eval split"
    )
    p.add_argument(
        "--inductive",
        nargs=2,
        type=int,
        metavar=("N_OLD_USERS", "N_OLD_ITEMS"),
        default=None,
        help="run the six-slice inductive evaluation after training",
    )
    p.add_argument("--writer", action="store_true", help="TensorBoard logging")
    p.add_argument(
        "--mesh",
        default=None,
        metavar="N_DATA,N_MODEL",
        help="train over a ('data','model') device mesh, e.g. '2,4': batches "
        "shard over 'data' (data parallel), embedding tables row-shard over "
        "'model'; evaluation runs the mesh evaluator. 'auto' uses all "
        "devices. Same-seed losses match the single-device run.",
    )
    p.add_argument(
        "--mesh-mode",
        choices=["data", "edge"],
        default="data",
        help="'data' (default): data-parallel batches + row-sharded tables. "
        "'edge': edge-block-shard the GRAPH and the table over the 'model' "
        "axis — per-device memory O((|E|+n*d)/S), the HBM scale-out path "
        "(every full-graph-propagation family). With '--mesh D,S' and D>1 "
        "edge mode runs the HYBRID composition: batches additionally shard "
        "over 'data' while collectives stay inside each S-sized edge group "
        "(BASELINE.md's (D,S) scaling table).",
    )
    p.add_argument(
        "--preprocess",
        choices=["gowalla", "yelp", "amazon"],
        default=None,
        help="parse a raw dataset, k-core filter, chronologically split, and "
        "write train/val/test.txt (the reference's implied offline step: "
        "GowallaDataset/... -> output_dataset, dataset.py:133-137)",
    )
    p.add_argument("--data-path", default=None, help="raw dataset directory")
    p.add_argument(
        "--out-path", default=None, help="output dir for train/val/test.txt"
    )
    p.add_argument("--min-inter", type=int, default=10, help="k-core threshold")
    p.add_argument(
        "--split",
        nargs=3,
        type=float,
        metavar=("TRAIN", "VAL", "TEST"),
        default=[0.7, 0.1, 0.2],
        help="chronological split ratios",
    )
    return p


def preprocess(args):
    from inductive_recommendation_tpu import get_dataset

    if not args.data_path or not args.out_path:
        raise SystemExit("--preprocess requires --data-path and --out-path")
    name = {
        "gowalla": "GowallaDataset",
        "yelp": "YelpDataset",
        "amazon": "AmazonDataset",
    }[args.preprocess]
    dataset = get_dataset(
        {
            "name": name,
            "path": args.data_path,
            "min_inter": args.min_inter,
            "split_ratio": list(args.split),
        }
    )
    dataset.output_dataset(args.out_path)
    print(
        f"{name}: {dataset.n_users} users x {dataset.n_items} items, "
        f"{len(dataset.train_array)} train interactions -> {args.out_path}"
    )
    return dataset


def main(argv=None):
    args = build_argparser().parse_args(argv)

    if args.preprocess:
        return preprocess(args)

    from inductive_recommendation_tpu import configs, get_dataset, get_model, get_trainer
    from inductive_recommendation_tpu.utils import init_run, set_seed

    grid = getattr(configs, f"get_{args.grid}_config")(None)
    if args.list:
        for i, (d, m, t) in enumerate(grid):
            print(f"[{i}] {m['name']} + {t['name']} on {d['path']}")
        return None

    if args.log_path:
        init_run(args.log_path, args.seed)
    else:
        set_seed(args.seed)

    dataset_config, model_config, trainer_config = grid[args.index]
    trainer_config = dict(trainer_config, seed=args.seed)
    if args.n_epochs is not None:
        trainer_config["n_epochs"] = args.n_epochs

    mesh = None
    if args.mesh:
        from inductive_recommendation_tpu.parallel import make_mesh

        if args.mesh == "auto":
            mesh = make_mesh()
        else:
            n_data, n_model = (int(x) for x in args.mesh.split(","))
            mesh = make_mesh(n_data=n_data, n_model=n_model)
        print(f"mesh: {dict(mesh.shape)} over {mesh.size} devices")

    dataset = get_dataset(dataset_config)
    if mesh is not None and args.mesh_mode == "data":
        # row-shardable tables must pad to the 'model' axis size
        model_config = dict(model_config, table_align=mesh.shape["model"])
    model = get_model(model_config, dataset)
    trainer = get_trainer(
        trainer_config, dataset, model, mesh=mesh, mesh_mode=args.mesh_mode
    )

    writer = None
    if args.writer:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter()

    best_ndcg = trainer.train(verbose=True, writer=writer)
    print(f"Best NDCG: {best_ndcg:.5f}")

    results, metrics = trainer.eval(args.stage)
    print(f"{args.stage} result. {results}")
    if args.inductive:
        trainer.inductive_eval(*args.inductive)
    print(
        json.dumps(
            {
                "model": model_config["name"],
                "trainer": trainer_config["name"],
                "best_val_ndcg": float(best_ndcg),
                f"{args.stage}_ndcg@20": metrics["NDCG"].get(20),
                f"{args.stage}_recall@20": metrics["Recall"].get(20),
            }
        )
    )
    return best_ndcg


if __name__ == "__main__":
    main()
