"""Generate a multi-member synthetic BetaE mixture for CLQA pretraining.

Writes three BetaE-format directories (the layout
`query/datasets.py::LogicalQueryDataset` loads, which is the reference's
datasets_query.py:20-206 raw format) at three different graph scales under
--root, using the offline generator (`data/synthetic_queries.py`). The
directory names match JointQueryDataset members (FB15k237 / NELL995 /
FB15k) so the standard mixture CLI runs unmodified:

    python scripts/gen_query_mixture.py --root ./query-datasets-synth
    python scripts/run_query.py -c config/ultraquery/pretrain_mixture.yaml \
        --root ./query-datasets-synth --epochs 1 --bs 8 --bpe 200

CPU-only (pure numpy); safe to run while a chip process is live.
"""

import argparse
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# keep this process off the TPU (generation is numpy-only, but importing
# ultra_tpu pulls in jax and the axon plugin grabs the device lock)
import jax

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb

xb._backend_factories.pop("axon", None)

from ultra_tpu.data.synthetic_queries import write_betae_dataset

MEMBERS = [
    # (dir name, nodes, direct rels, triples)
    ("FB15k-237-betae", 8000, 120, 120000),
    ("NELL-betae", 5000, 80, 60000),
    ("FB15k-betae", 3000, 50, 30000),
]

TINY_MEMBERS = [  # CPU smoke scale
    ("FB15k-237-betae", 300, 16, 2400),
    ("NELL-betae", 200, 12, 1500),
    ("FB15k-betae", 150, 10, 1000),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./query-datasets-synth")
    ap.add_argument("--train-per-type", type=int, default=256)
    ap.add_argument("--eval-per-type", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true", help="CPU smoke scale")
    args = ap.parse_args()

    members = TINY_MEMBERS if args.tiny else MEMBERS
    if args.tiny:
        args.train_per_type = min(args.train_per_type, 24)
        args.eval_per_type = min(args.eval_per_type, 8)
    for i, (name, v, r, t) in enumerate(members):
        t0 = time.time()
        ne, nr = write_betae_dataset(
            args.root,
            name=name,
            num_nodes=v,
            num_direct_rel=r,
            num_triples=t,
            queries_per_type=args.eval_per_type,
            train_queries_per_type=args.train_per_type,
            seed=args.seed + i,
            rel_dist="zipf",
            categories=max(10, v // 400),
        )
        print(
            f"{name}: V={ne} R={nr} T={t} "
            f"({time.time() - t0:.1f}s) -> {os.path.join(args.root, name)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
