"""UltraQuery train / zero-shot CLQA eval CLI (rewrite of script/run_query.py).

  python scripts/run_query.py -c config/ultraquery/transductive.yaml \
      --dataset FB15k237LogicalQuery --epochs 0 --bs 32 --bpe null \
      --threshold 0.8 --ultra_ckpt null --qe_ckpt /root/reference/ckpts/ultraquery.pth
"""

import logging
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ultra_tpu.utils import config as config_lib


def main():
    args, vars_ = config_lib.parse_args()
    cfg = config_lib.load_config(args.config, context=vars_)

    # multi-host launch (reference: torch.distributed.launch, README.md:248):
    # ULTRA_DIST="coordinator:port,num_processes,proc_id"; evaluation shards
    # queries across processes (query_utils.py:238-282 gather semantics)
    dist = os.environ.get("ULTRA_DIST")
    if dist:
        addr, nproc, pid = dist.split(",")
        from ultra_tpu.parallel import multihost

        multihost.initialize(addr, int(nproc), int(pid))

    logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")
    logger = logging.getLogger("ultra_tpu")
    # ULTRA_WORKDIR pins the working directory across restarts (same
    # contract as run.py/pretrain.py; scripts/supervise.py relies on it)
    workdir = os.environ.get("ULTRA_WORKDIR") or os.path.join(
        os.path.expanduser(cfg.get("output_dir", "./output")),
        time.strftime("%Y-%m-%d-%H-%M-%S"),
    )
    os.makedirs(workdir, exist_ok=True)
    logger.warning("config: %s", dict(cfg))

    import jax

    from ultra_tpu.query.datasets import build_query_dataset
    from ultra_tpu.query.executor import QueryConfig
    from ultra_tpu.query.trainer import (
        evaluate_queries,
        prepare_query_graph,
        train_queries,
    )
    from ultra_tpu.train import runner
    from ultra_tpu.train.loop import init_ultra_params
    from ultra_tpu.utils import ckpt as ckpt_lib

    ds_cfg = dict(cfg["dataset"])
    name = ds_cfg.pop("class")
    root = os.path.expanduser(ds_cfg.pop("root", "./query-datasets"))
    dataset = build_query_dataset(name, root, **ds_cfg).load()

    from ultra_tpu.models.nbfnet import sum_only_aggregators

    model_cfg = cfg["model"]
    ultra_cfg = runner.model_config_from_dict(model_cfg["model"])
    sort_v2 = sum_only_aggregators(ultra_cfg)
    qcfg = QueryConfig(
        logic=model_cfg.get("logic", "product"),
        threshold=float(model_cfg.get("threshold") or 0.0),
        dropout_ratio=float(model_cfg.get("dropout_ratio", 0.25)),
        more_dropout=float(model_cfg.get("more_dropout", 0.0)),
    )

    if cfg.get("ultraquery_ckpt"):
        params = ckpt_lib.load_model_checkpoint(cfg["ultraquery_ckpt"])
    elif cfg.get("ultra_ckpt"):
        params = ckpt_lib.load_model_checkpoint(cfg["ultra_ckpt"])
    else:
        params = init_ultra_params(ultra_cfg, jax.random.key(args.seed))

    if isinstance(dataset, list):
        # JointQueryDataset mixture: multigraph pretraining, per-member eval
        from ultra_tpu.query.pretrain import QueryPretrainGraphs, pretrain_queries

        graphs = QueryPretrainGraphs(dataset, v2_sort_slots=sort_v2)
        params = pretrain_queries(
            cfg, ultra_cfg, qcfg, params, graphs, workdir, seed=args.seed
        )
        batch_size = int(cfg["train"].get("batch_size", 8))
        for gi, member in enumerate(dataset):
            (_, _), (_, _), (lo, hi) = member.split_ranges()
            graph = prepare_query_graph(member.graphs[2], v2_sort_slots=sort_v2)
            m = evaluate_queries(
                params, ultra_cfg, qcfg, graph, member, np.arange(lo, hi),
                batch_size=batch_size,
                metric_names=cfg["task"].get("metric", ("mrr",)),
                restrict_nodes=member.graphs[2].restrict_nodes,
            )
            logger.warning("test metrics [%s]:", member.name)
            for k in sorted(m):
                logger.warning("  %s: %.4f", k, m[k])
        return

    params = train_queries(cfg, ultra_cfg, qcfg, params, dataset, workdir, seed=args.seed)

    ranges = dataset.split_ranges()
    batch_size = int(cfg["train"].get("batch_size", 8))
    for split, (lo, hi) in zip(("valid", "test"), ranges[1:]):
        graph = prepare_query_graph(
            dataset.graphs[("train", "valid", "test").index(split)],
            v2_sort_slots=sort_v2,
        )
        m = evaluate_queries(
            params, ultra_cfg, qcfg, graph, dataset, np.arange(lo, hi),
            batch_size=batch_size, metric_names=cfg["task"].get("metric", ("mrr",)),
            restrict_nodes=dataset.graphs[("train", "valid", "test").index(split)].restrict_nodes,
        )
        logger.warning("%s metrics:", split)
        for k in sorted(m):
            logger.warning("  %s: %.4f", k, m[k])


if __name__ == "__main__":
    main()
