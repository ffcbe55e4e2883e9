"""Single-dataset train / fine-tune / zero-shot eval CLI.

TPU rewrite of /root/reference/script/run.py. Examples:

  # zero-shot with a converted (or raw .pth) ULTRA checkpoint
  python scripts/run.py -c config/transductive/inference.yaml \
      --dataset FB15k237 --epochs 0 --bpe null \
      --ckpt /root/reference/ckpts/ultra_3g.pth

  # fine-tune
  python scripts/run.py -c config/transductive/inference.yaml \
      --dataset CoDExMedium --epochs 1 --bpe 1000 --ckpt <path>
"""

import logging
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultra_tpu.utils import config as config_lib


def main():
    args, vars_ = config_lib.parse_args()
    cfg = config_lib.load_config(args.config, context=vars_)

    # multi-host launch (the reference's torch.distributed.launch analog,
    # README.md:248-253): ULTRA_DIST="coordinator:port,num_processes,proc_id"
    # per process, or rely on Cloud TPU auto-detection by calling
    # multihost.initialize() yourself before running. Single-process if unset.
    dist = os.environ.get("ULTRA_DIST")
    if dist:
        addr, nproc, pid = dist.split(",")
        from ultra_tpu.parallel import multihost

        multihost.initialize(addr, int(nproc), int(pid))

    logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")
    # ULTRA_WORKDIR pins the working directory across restarts (used by
    # scripts/supervise.py so crash checkpoints stay resumable)
    workdir = os.environ.get("ULTRA_WORKDIR") or os.path.join(
        os.path.expanduser(cfg.get("output_dir", "./output")),
        time.strftime("%Y-%m-%d-%H-%M-%S"),
    )
    os.makedirs(workdir, exist_ok=True)
    logging.getLogger("ultra_tpu").warning("config: %s", dict(cfg))
    logging.getLogger("ultra_tpu").warning("workdir: %s", workdir)

    from ultra_tpu.train import runner

    checkpoint = cfg.get("checkpoint")
    results = runner.run_link_prediction(
        cfg, workdir, seed=args.seed, checkpoint=checkpoint
    )
    print(results)


if __name__ == "__main__":
    main()
