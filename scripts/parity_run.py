"""One-command zero-shot parity run vs the reference README tables.

Runs the moment raw files exist (stage them with scripts/fetch_data.py or
drop them at the DATA_MANIFEST.md paths): checks presence per dataset,
evaluates a checkpoint zero-shot with `precision: highest` (exact-f32
kernels — the README-table comparison mode, see PARITY.md), writes
per-dataset MRR/H@10 rows plus group aggregates, and compares the
aggregates against the reference's published numbers
(/root/reference/README.md:104-145, ULTRA 3g/4g PyG rows).

  python scripts/parity_run.py -d FB15k237,WN18RR \
      --ckpt /root/reference/ckpts/ultra_3g.pth
  python scripts/parity_run.py -d inductive_e,inductive_er \
      --ckpt /root/reference/ckpts/ultra_3g.pth --root ./kg-datasets

Datasets whose raw files are absent are listed and skipped (rc stays 0 if
at least one ran); the report lands in parity_report.json + a CSV.
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
    GROUPS, INDUCTIVE_CLASSES, instantiate, iter_targets, target_name,
)

logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")
logger = logging.getLogger("ultra_tpu")

# Reference aggregate rows (README.md:118-144): group -> ckpt -> (MRR, H@10)
REFERENCE_AGGREGATES = {
    "inductive_e": {
        "ultra_3g_paper": (0.430, 0.566), "ultra_4g_paper": (0.439, 0.580),
        "ultra_3g_pyg": (0.420, 0.562), "ultra_4g_pyg": (0.444, 0.588),
    },
    "inductive_er": {
        "ultra_3g_paper": (0.345, 0.512), "ultra_4g_paper": (0.352, 0.518),
        "ultra_3g_pyg": (0.344, 0.511), "ultra_4g_pyg": (0.344, 0.513),
    },
}


def _repo_root():
    # anchored on the package, not __file__ — this script is also driven via
    # exec() from test fixtures where __file__ is the driver's path
    import ultra_tpu

    return os.path.dirname(os.path.dirname(os.path.abspath(ultra_tpu.__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config",
                    default=os.path.join(_repo_root(), "config",
                                         "transductive", "inference.yaml"))
    ap.add_argument("--inductive-config",
                    default=os.path.join(_repo_root(), "config",
                                         "inductive", "inference.yaml"))
    ap.add_argument("-d", "--datasets", default="inductive_e,inductive_er")
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint path (.pth or orbax), or 'null'")
    ap.add_argument("--root", default="./kg-datasets")
    ap.add_argument("--output", default=None)
    ap.add_argument("--seed", type=int, default=1024)
    ap.add_argument("--precision", default="highest",
                    help="'highest' (README-table mode) or 'default'")
    args = ap.parse_args()

    from ultra_tpu.utils import config as config_lib
    from ultra_tpu.train import runner

    targets = list(dict.fromkeys(iter_targets(args.datasets)))
    present, missing = [], []
    for name, version in targets:
        ds = instantiate(name, version, args.root)
        have = os.path.exists(ds.processed_path) or all(
            os.path.exists(p) for p in ds.raw_paths()
        )
        (present if have else missing).append((name, version))
    if missing:
        logger.warning(
            "missing raw data for %d dataset(s): %s — stage with "
            "scripts/fetch_data.py (see DATA_MANIFEST.md)",
            len(missing), ",".join(target_name(n, v) for n, v in missing),
        )
    if not present:
        print(json.dumps({"error": "no datasets staged",
                          "missing": [target_name(n, v) for n, v in missing]}))
        return

    stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
    out_csv = args.output or f"parity_results_{stamp}.csv"
    rows = []
    for name, version in present:
        tgt = target_name(name, version)
        cfg_path = (args.inductive_config if name in INDUCTIVE_CLASSES
                    else args.config)
        cfg = config_lib.load_config(
            cfg_path,
            context={"dataset": name, "version": version, "epochs": 0,
                     "bpe": "null", "ckpt": args.ckpt},
        )
        if version is not None:
            cfg["dataset"]["version"] = version
        cfg["dataset"]["root"] = args.root
        cfg["train"]["num_epoch"] = 0
        cfg["precision"] = None if args.precision == "default" else args.precision
        workdir = os.path.join("output", f"parity-{tgt.replace(':', '-')}")
        logger.warning(">>> %s (precision=%s)", tgt, args.precision)
        t0 = time.time()
        try:
            results = runner.run_link_prediction(
                cfg, workdir, seed=args.seed, checkpoint=cfg.get("checkpoint")
            )
        except Exception as exc:  # noqa: BLE001 — keep sweeping, record failure
            logger.warning("%s FAILED: %s: %s", tgt, type(exc).__name__,
                           str(exc)[:300])
            rows.append({"dataset": tgt, "error": f"{type(exc).__name__}"})
            continue
        row = {"dataset": tgt,
               "mrr": round(results["test"].get("mrr", float("nan")), 4),
               "hits@10": round(results["test"].get("hits@10", float("nan")), 4),
               "time_s": round(time.time() - t0, 1)}
        rows.append(row)
        logger.warning("%s: %s", tgt, row)
        with open(out_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["dataset", "mrr", "hits@10",
                                              "time_s", "error"])
            if f.tell() == 0:
                w.writeheader()
            w.writerow(row)

    # group aggregates vs the reference rows (only when a group ran complete)
    by_name = {r["dataset"]: r for r in rows if "mrr" in r}
    report = {"ckpt": args.ckpt, "precision": args.precision, "rows": rows,
              "groups": {}}
    for group, refs in REFERENCE_AGGREGATES.items():
        members = [target_name(n, v) for n, v in GROUPS[group]]
        got = [by_name[m] for m in members if m in by_name]
        if not got:
            continue
        mrr = sum(r["mrr"] for r in got) / len(got)
        h10 = sum(r["hits@10"] for r in got) / len(got)
        entry = {"n_run": len(got), "n_total": len(members),
                 "complete": len(got) == len(members),
                 "mrr": round(mrr, 4), "hits@10": round(h10, 4),
                 "reference": refs}
        if entry["complete"]:
            for ck, (rm, rh) in refs.items():
                entry[f"delta_mrr_vs_{ck}"] = round(mrr - rm, 4)
        report["groups"][group] = entry
        logger.warning("group %s: %s", group, entry)

    with open(f"parity_report_{stamp}.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
