"""One-command zero-shot CLQA parity run vs the reference README tables.

The query-side twin of scripts/parity_run.py: checks which BetaE-format
query datasets are staged (scripts/fetch_data.py -d query_all, see
DATA_MANIFEST.md), evaluates a checkpoint zero-shot on each test split,
and compares group aggregates against the reference's published CLQA
numbers (/root/reference/README.md:361-431, UltraQuery paper/PyG rows).

  python scripts/parity_run_query.py --ckpt /root/reference/ckpts/ultraquery.pth
  python scripts/parity_run_query.py -d query_transductive \
      --ckpt /root/reference/ckpts/ultraquery.pth --threshold 0.8
"""

import argparse
import csv
import json
import logging
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultra_tpu.data.zoo import (  # noqa: E402
    QUERY_GROUPS, instantiate_query, iter_targets, query_is_staged, target_name,
)

logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")
logger = logging.getLogger("ultra_tpu")

# README.md:361-431 — group -> row -> (EPFO mrr, EPFO h@10, neg mrr, neg h@10)
REFERENCE_CLQA = {
    "query_all": {
        "ultraquery_paper": (0.301, 0.428, 0.152, 0.264),
        "ultraquery_pyg": (0.309, 0.432, 0.178, 0.286),
    },
    "query_transductive": {"ultraquery_pyg": (0.411, None, None, None)},
    "query_inductive_e": {"ultraquery_pyg": (0.312, None, None, None)},
    "query_inductive_er": {"ultraquery_pyg": (0.280, None, None, None)},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--datasets",
                    default="query_transductive,query_inductive_e,query_inductive_er")
    ap.add_argument("--ckpt", required=True, help="ultraquery checkpoint or 'null'")
    ap.add_argument("--root", default="./query-datasets")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="score threshold (README.md:359 multi-source fix)")
    ap.add_argument("--logic", default="product")
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--output", default=None)
    ap.add_argument("--seed", type=int, default=1024)
    args = ap.parse_args()

    import jax

    from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
    from ultra_tpu.query.executor import QueryConfig
    from ultra_tpu.query.trainer import evaluate_queries, prepare_query_graph
    from ultra_tpu.train.loop import init_ultra_params
    from ultra_tpu.utils import ckpt as ckpt_lib
    import numpy as np

    targets = list(dict.fromkeys(iter_targets(args.datasets)))
    present = [(n, v) for n, v in targets if query_is_staged(n, v, args.root)]
    missing = [t for t in targets if t not in present]
    if missing:
        logger.warning(
            "missing raw data for %d query dataset(s): %s — stage with "
            "scripts/fetch_data.py -d query_all",
            len(missing), ",".join(target_name(n, v) for n, v in missing),
        )
    if not present:
        print(json.dumps({"error": "no query datasets staged",
                          "missing": [target_name(n, v) for n, v in missing]}))
        return

    dims = (64,) * 6
    ultra_cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=64, hidden_dims=dims, num_relation=4),
        entity_model=NBFNetConfig(input_dim=64, hidden_dims=dims, num_relation=1,
                                  project_relations=True),
    )
    qcfg = QueryConfig(logic=args.logic, threshold=args.threshold,
                       dropout_ratio=0.0)
    if args.ckpt and args.ckpt != "null":
        params = ckpt_lib.load_model_checkpoint(args.ckpt)
    else:
        params = init_ultra_params(ultra_cfg, jax.random.key(args.seed))

    stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
    out_csv = args.output or f"parity_query_results_{stamp}.csv"
    rows = []
    for name, version in present:
        tgt = target_name(name, version)
        logger.warning(">>> %s", tgt)
        t0 = time.time()
        try:
            ds = instantiate_query(name, version, args.root).load()
            (_, _), (_, _), (lo, hi) = ds.split_ranges()
            from ultra_tpu.models.nbfnet import sum_only_aggregators

            graph = prepare_query_graph(
                ds.graphs[2], v2_sort_slots=sum_only_aggregators(ultra_cfg))
            m = evaluate_queries(
                params, ultra_cfg, qcfg, graph, ds, np.arange(lo, hi),
                batch_size=args.bs, metric_names=("mrr", "hits@10"),
                restrict_nodes=ds.graphs[2].restrict_nodes,
            )
        except Exception as exc:  # noqa: BLE001 — keep sweeping
            logger.warning("%s FAILED: %s: %s", tgt, type(exc).__name__,
                           str(exc)[:300])
            rows.append({"dataset": tgt, "error": type(exc).__name__})
            continue
        row = {"dataset": tgt,
               "epfo_mrr": round(m.get("[EPFO] mrr", float("nan")), 4),
               "epfo_hits@10": round(m.get("[EPFO] hits@10", float("nan")), 4),
               "neg_mrr": round(m.get("[negation] mrr", float("nan")), 4),
               "neg_hits@10": round(m.get("[negation] hits@10", float("nan")), 4),
               "time_s": round(time.time() - t0, 1)}
        rows.append(row)
        logger.warning("%s: %s", tgt, row)
        with open(out_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row.keys()) + ["error"])
            if f.tell() == 0:
                w.writeheader()
            w.writerow(row)

    by_name = {r["dataset"]: r for r in rows if "epfo_mrr" in r}
    report = {"ckpt": args.ckpt, "threshold": args.threshold, "rows": rows,
              "groups": {}}
    for group, refs in REFERENCE_CLQA.items():
        members = [target_name(n, v) for n, v in QUERY_GROUPS[group]]
        got = [by_name[m] for m in members if m in by_name]
        if not got:
            continue
        import math

        def mean(key):
            vals = [r[key] for r in got if not math.isnan(r[key])]
            return round(sum(vals) / len(vals), 4) if vals else None

        entry = {"n_run": len(got), "n_total": len(members),
                 "complete": len(got) == len(members),
                 "epfo_mrr": mean("epfo_mrr"), "epfo_hits@10": mean("epfo_hits@10"),
                 "neg_mrr": mean("neg_mrr"), "neg_hits@10": mean("neg_hits@10"),
                 "reference": refs}
        if entry["complete"] and entry["epfo_mrr"] is not None:
            for ck, (rm, *_rest) in refs.items():
                entry[f"delta_epfo_mrr_vs_{ck}"] = round(entry["epfo_mrr"] - rm, 4)
        report["groups"][group] = entry
        logger.warning("group %s: %s", group, entry)

    with open(f"parity_query_report_{stamp}.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
