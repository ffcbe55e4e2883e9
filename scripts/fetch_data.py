"""Stage raw dataset files for the zoo (and emit the data manifest).

No network egress exists in the build environment, so this script is the
contract for whoever *does* have network (the driver, a user): it stages
every raw file exactly where the dataset classes expect them
(`<root>/<...>/raw/<file>`), after which `scripts/run_many.py` /
`scripts/parity_run.py` run with zero further setup. It reuses each
dataset class's own `download()` (kg.py), so zip-based flows (AristoV4,
SparserKG, MTDEA) land correctly too.

  python scripts/fetch_data.py --root ./kg-datasets -d pretrain3g
  python scripts/fetch_data.py --root ./kg-datasets -d inductive_e,inductive_er
  python scripts/fetch_data.py --list            # print the manifest
  python scripts/fetch_data.py --manifest        # write DATA_MANIFEST.{json,md}

Groups mirror the reference's run_many tables (run_many.py:25-115) and the
README zero-shot aggregates (README.md:104-145): `inductive_e` = the 18
inductive-entity graphs, `inductive_er` = the 23 inductive-entity+relation
graphs, `pretrain3g`/`pretrain4g` = the pretraining mixtures,
`transductive` = the 16-graph transductive eval set + FB15k237/WN18RR.
"""

import argparse
import json
import logging
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")
logger = logging.getLogger("ultra_tpu")

from ultra_tpu.data.zoo import (  # noqa: E402
    GROUPS, QUERY_GROUPS, QUERY_SENTINEL, instantiate, instantiate_query,
    is_query_dataset, iter_targets, query_archive_url, query_is_staged,
    stage_query, target_name,
)


def manifest_entry(name, version, root):
    """Manifest row: where the raw files go and how to obtain them."""
    if is_query_dataset(name):
        ds = instantiate_query(name, version, root)
        return {
            "dataset": target_name(name, version),
            "class": name,
            "raw_files": [os.path.relpath(
                os.path.join(ds.raw_dir, QUERY_SENTINEL[name]), root
            ) + " (+ query/answer pickles in the same dir)"],
            "archive": query_archive_url(name, version, root),
            "note": ("BetaE-format archive expanded into the root by "
                     f"ultra_tpu.query.datasets.{name} (shared across "
                     "member datasets)"),
        }
    ds = instantiate(name, version, root)
    rel = os.path.relpath
    entry = {
        "dataset": target_name(name, version),
        "class": name,
        "raw_files": [rel(p, root) for p in ds.raw_paths()],
    }
    urls = list(getattr(ds, "urls", ()) or ())
    if urls:
        v = getattr(ds, "version", None)
        entry["files"] = {
            rel(p, root): (u % v if "%s" in u else u)
            for u, p in zip(urls, ds.raw_paths())
        }
    else:  # archive flows: one zip expanded by the class's download()
        entry["archive"] = getattr(ds, "url", None)
        entry["note"] = (
            f"archive expanded by ultra_tpu.data.kg.{name}.download() "
            "(run this script to stage)"
        )
    return entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./kg-datasets")
    ap.add_argument("-d", "--datasets", default="all",
                    help="comma list of groups and/or Name[:version]")
    ap.add_argument("--list", action="store_true", help="print the manifest")
    ap.add_argument("--manifest", action="store_true",
                    help="write DATA_MANIFEST.json / DATA_MANIFEST.md")
    args = ap.parse_args()
    if (args.manifest or args.list) and args.datasets == "all":
        args.datasets = "all,query_all"  # manifest covers both zoos

    targets = list(dict.fromkeys(iter_targets(args.datasets)))

    if args.list or args.manifest:
        entries = [manifest_entry(n, v, args.root) for n, v in targets]
        if args.manifest:
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            with open(os.path.join(repo, "DATA_MANIFEST.json"), "w") as f:
                json.dump({"root": args.root, "datasets": entries}, f, indent=1)
            with open(os.path.join(repo, "DATA_MANIFEST.md"), "w") as f:
                f.write(
                    "# Data manifest\n\nRaw-file layout under `--root` "
                    "(default `./kg-datasets`). Stage with\n`python "
                    "scripts/fetch_data.py -d all` (network required) or "
                    "place files manually;\nevery runner picks them up "
                    "as-is (no re-download once present).\n\n"
                )
                for e in entries:
                    f.write(f"## {e['dataset']}\n\n")
                    if "files" in e:
                        for p, u in e["files"].items():
                            f.write(f"- `{p}` <- {u}\n")
                    else:
                        f.write(f"- files: {', '.join(e['raw_files'])}\n")
                        f.write(f"- archive: {e['archive']} ({e['note']})\n")
                    f.write("\n")
            print("wrote DATA_MANIFEST.json / DATA_MANIFEST.md")
        else:
            print(json.dumps(entries, indent=1))
        return

    ok, fail = [], []
    for name, version in targets:
        tgt = target_name(name, version)
        try:
            if is_query_dataset(name):
                if query_is_staged(name, version, args.root):
                    logger.warning("%s: raw files present", tgt)
                    ok.append(tgt)
                else:
                    stage_query(name, version, args.root)
                    logger.warning("%s: staged", tgt)
                    ok.append(tgt)
                continue
            ds = instantiate(name, version, args.root)
            missing = [p for p in ds.raw_paths() if not os.path.exists(p)]
            if not missing:
                logger.warning("%s: raw files present", tgt)
                ok.append(tgt)
                continue
            ds.download()
            still = [p for p in ds.raw_paths() if not os.path.exists(p)]
            assert not still, f"missing after download: {still}"
            logger.warning("%s: staged", tgt)
            ok.append(tgt)
        except Exception as exc:  # noqa: BLE001 — report and continue the sweep
            logger.warning("%s: FAILED (%s: %s)", tgt, type(exc).__name__,
                           str(exc)[:200])
            fail.append(tgt)
    print(f"staged/present: {len(ok)}; failed: {len(fail)}"
          + (f" -> {fail}" if fail else ""))
    sys.exit(1 if fail and not ok else 0)


if __name__ == "__main__":
    main()
