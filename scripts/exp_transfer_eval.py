"""Zero-shot transfer curve over a pretrain run's epoch checkpoints
(round-5 item #1 evidence).

Evaluates every model_epoch_N in --workdir (plus an untrained init and the
converted reference ultra_3g.pth) on HELD-OUT synthetic rule-KGs with
disjoint vocabularies and different V/E/R from the pretraining mixture
(config/transductive/pretrain_synth.yaml). A climbing curve from ~random
to a plateau is the offline proof that this framework's training produces
a transferring foundation model (reference README.md:25-29).

  python scripts/exp_transfer_eval.py --workdir output/<ts> [--limit 500]
"""

import argparse
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-comp-cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ultra_tpu import tasks
from ultra_tpu.data.synthetic import rule_kg_dataset
from ultra_tpu.train import eval as eval_lib
from ultra_tpu.train.loop import init_ultra_params
from ultra_tpu.train.runner import model_config_from_dict, prepare_graph, triples_of
from ultra_tpu.utils import ckpt as ckpt_lib
from ultra_tpu.utils import config as config_lib

HELD_SPECS = [
    dict(num_nodes=3500, num_base_rel=20, num_comp_rel=10,
         num_base_triples=26000, seed=10),
    dict(num_nodes=2600, num_base_rel=26, num_comp_rel=13,
         num_base_triples=20000, seed=11),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--config",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "config/transductive/pretrain_synth.yaml"))
    ap.add_argument("--limit", type=int, default=500)
    ap.add_argument("--ultra3g", default="/root/reference/ckpts/ultra_3g.pth")
    args = ap.parse_args()

    cfg = config_lib.load_config(args.config, {"epochs": 0, "bpe": 0})
    ultra_cfg = model_config_from_dict(cfg["model"])

    held = [rule_kg_dataset(f"held{i}", **s) for i, s in enumerate(HELD_SPECS)]
    evals = []
    for ds in held:
        graph = prepare_graph(ds.test)
        ei = np.concatenate(
            [ds.train.target_edge_index, ds.valid.target_edge_index,
             ds.test.target_edge_index], axis=1)
        et = np.concatenate(
            [ds.train.target_edge_type, ds.valid.target_edge_type,
             ds.test.target_edge_type])
        filt = tasks.GraphIndex.build(ei, et, ds.test.num_nodes,
                                      ds.test.num_relations)
        evals.append((ds, graph, filt))
        log(f"{ds.name}: V={ds.test.num_nodes} R={ds.test.num_relations} "
            f"E_msg={ds.test.edge_index.shape[1]} "
            f"test={ds.test.target_edge_type.shape[0]}")

    def run(tag, params):
        row = [tag]
        for ds, graph, filt in evals:
            m = eval_lib.evaluate(
                params, ultra_cfg, graph, triples_of(ds.test), filt,
                batch_size=8, metrics=("mrr", "hits@10"), limit=args.limit,
                rng=np.random.default_rng(0),
            )
            row.append(f"{ds.name.split('-')[0]} mrr {m['mrr']:.4f} "
                       f"h10 {m['hits@10']:.4f}")
        log(" | ".join(str(c) for c in row))

    run("untrained", init_ultra_params(ultra_cfg, jax.random.key(1024)))

    epochs = sorted(
        (int(m.group(1)), d) for d in os.listdir(args.workdir)
        if (m := re.match(r"model_epoch_(\d+)$", d))
    )
    for ep, d in epochs:
        tree = ckpt_lib.load_pytree(os.path.join(args.workdir, d))
        run(f"epoch {ep}", jax.tree.map(jax.numpy.asarray, tree["params"]))

    if os.path.exists(args.ultra3g):
        from ultra_tpu.utils.torch_ckpt import convert_ultra_checkpoint, to_jax

        run("ultra_3g(converted)", to_jax(convert_ultra_checkpoint(args.ultra3g)))


if __name__ == "__main__":
    main()
