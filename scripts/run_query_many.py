"""Sequential multi-dataset CLQA harness + CSV (rewrite of
script/run_query_many.py).

  python scripts/run_query_many.py -c config/ultraquery/transductive.yaml \
      -d FB15k237LogicalQuery,NELL995LogicalQuery \
      --qe_ckpt /root/reference/ckpts/ultraquery.pth --threshold 0.8
"""

import argparse
import csv
import logging
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultra_tpu.utils import config as config_lib

SEEDS = [1024, 42, 1337, 512, 256]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-d", "--datasets", required=True)
    parser.add_argument("-reps", "--repeats", type=int, default=1)
    parser.add_argument("--qe_ckpt", default=None)
    parser.add_argument("--ultra_ckpt", default=None)
    parser.add_argument("--threshold", type=float, default=0.0)
    parser.add_argument("--bs", type=int, default=16)
    parser.add_argument("--root", default="./query-datasets")
    parser.add_argument("--output", default=None)
    args, _ = parser.parse_known_args()

    logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")
    logger = logging.getLogger("ultra_tpu")

    import jax

    from ultra_tpu.query.datasets import build_query_dataset
    from ultra_tpu.query.executor import QueryConfig
    from ultra_tpu.query.trainer import evaluate_queries, prepare_query_graph
    from ultra_tpu.train import runner
    from ultra_tpu.train.loop import init_ultra_params
    from ultra_tpu.utils import ckpt as ckpt_lib

    out_csv = args.output or f"ultraquery_results_{time.strftime('%Y-%m-%d-%H-%M-%S')}.csv"
    cfg = config_lib.load_config(
        args.config,
        context={"dataset": "_", "epochs": 0, "bs": args.bs, "bpe": "null",
                 "threshold": args.threshold, "ultra_ckpt": args.ultra_ckpt,
                 "qe_ckpt": args.qe_ckpt},
    )
    ultra_cfg = runner.model_config_from_dict(cfg["model"]["model"])
    qcfg = QueryConfig(
        logic=cfg["model"].get("logic", "product"),
        threshold=args.threshold,
        dropout_ratio=0.0,
    )
    if args.qe_ckpt:
        params = ckpt_lib.load_model_checkpoint(args.qe_ckpt)
    elif args.ultra_ckpt:
        params = ckpt_lib.load_model_checkpoint(args.ultra_ckpt)
    else:
        params = init_ultra_params(ultra_cfg, jax.random.key(SEEDS[0]))

    for target in [d.strip() for d in args.datasets.split(",") if d.strip()]:
        if ":" in target:
            name, version = target.split(":")
            kwargs = {"version": version}
        else:
            name, kwargs = target, {}
        dataset = build_query_dataset(name, args.root, **kwargs).load()
        (_, _), (_, _), (lo, hi) = dataset.split_ranges()
        from ultra_tpu.models.nbfnet import sum_only_aggregators

        graph = prepare_query_graph(
            dataset.graphs[2], v2_sort_slots=sum_only_aggregators(ultra_cfg))
        t0 = time.time()
        m = evaluate_queries(
            params, ultra_cfg, qcfg, graph, dataset, np.arange(lo, hi),
            batch_size=args.bs, metric_names=cfg["task"].get("metric", ("mrr", "hits@10")),
            restrict_nodes=dataset.graphs[2].restrict_nodes,
        )
        row = {"dataset": target, "time_s": round(time.time() - t0, 1)}
        row.update({k: round(v, 4) for k, v in m.items()})
        write_header = not os.path.exists(out_csv)
        with open(out_csv, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(row.keys()))
            if write_header:
                writer.writeheader()
            writer.writerow(row)
        logger.warning("%s: EPFO mrr %.4f", target, m.get("[EPFO] mrr", float("nan")))

    logger.warning("results written to %s", out_csv)


if __name__ == "__main__":
    main()
