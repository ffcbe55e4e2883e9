"""Multi-graph ULTRA pretraining CLI (rewrite of script/pretrain.py).

  python scripts/pretrain.py -c config/transductive/pretrain_3g.yaml
"""

import logging
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ultra_tpu.utils import config as config_lib


def main():
    args, vars_ = config_lib.parse_args()
    cfg = config_lib.load_config(args.config, context=vars_)

    logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")
    # ULTRA_WORKDIR pins the working directory across restarts (same
    # contract as scripts/run.py — scripts/supervise.py relies on it to
    # resume from the pinned dir's checkpoints)
    workdir = os.environ.get("ULTRA_WORKDIR") or os.path.join(
        os.path.expanduser(cfg.get("output_dir", "./output")),
        time.strftime("%Y-%m-%d-%H-%M-%S"),
    )
    os.makedirs(workdir, exist_ok=True)
    logger = logging.getLogger("ultra_tpu")
    logger.warning("config: %s", dict(cfg))

    from ultra_tpu.data import kg
    from ultra_tpu.train import runner
    from ultra_tpu.train.loop import init_ultra_params
    from ultra_tpu.train.pretrain import PretrainGraphs, pretrain
    from ultra_tpu.utils import ckpt as ckpt_lib

    ds_cfg = dict(cfg["dataset"])
    ds_cfg.pop("class")
    root = os.path.expanduser(ds_cfg.pop("root", "./kg-datasets"))
    datasets = kg.JointDataset(root, ds_cfg.pop("graphs")).load()

    ultra_cfg = runner.model_config_from_dict(cfg["model"])
    checkpoint = cfg.get("checkpoint")
    params = (
        ckpt_lib.load_model_checkpoint(checkpoint)
        if checkpoint
        else init_ultra_params(ultra_cfg, jax.random.key(args.seed))
    )

    from ultra_tpu.models.nbfnet import sum_only_aggregators

    graphs = PretrainGraphs(datasets, v2_sort_slots=sum_only_aggregators(ultra_cfg))
    try:
        params = pretrain(cfg, ultra_cfg, params, graphs, workdir, seed=args.seed)
    except Exception as exc:  # noqa: BLE001 — auto-remat on HBM OOM
        # same safety net as run_link_prediction (runner.py): the shipped
        # pretrain configs run remat-OFF grad-accum micro-batches (the
        # round-5 1091 ms/step winner); a larger mixture member can OOM at
        # compile time — retry with remat, losing no progress.
        if ("Ran out of memory" not in str(exc)
                and "RESOURCE_EXHAUSTED" not in str(exc)):
            raise
        if ultra_cfg.relation_model.remat and ultra_cfg.entity_model.remat:
            raise
        import dataclasses

        logger.warning(
            "pretrain step OOMed HBM (%s...); retrying with remat: yes — "
            "set model.{relation_model,entity_model}.remat explicitly to "
            "avoid the doubled first compile", str(exc)[:120],
        )
        ultra_cfg = dataclasses.replace(
            ultra_cfg,
            relation_model=dataclasses.replace(
                ultra_cfg.relation_model, remat=True),
            entity_model=dataclasses.replace(
                ultra_cfg.entity_model, remat=True),
        )
        params = pretrain(cfg, ultra_cfg, params, graphs, workdir, seed=args.seed)
    ckpt_lib.save_pytree(os.path.join(workdir, "model_final"), {"params": params})
    logger.warning("saved final model to %s", workdir)


if __name__ == "__main__":
    main()
