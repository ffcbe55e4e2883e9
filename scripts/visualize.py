"""Path-interpretation CLI: print the top paths explaining a prediction.

TPU rewrite of the reference's visualization machinery
(base_nbfnet.py:156-263, exposed there only through notebooks). Gradient ×
beam search over edge importances:

  python scripts/visualize.py -c config/transductive/inference.yaml \
      --dataset FB15k237 --ckpt ultra_3g.pth \
      --head 14 --relation 3 --tail 512 [--beam 10] [--topk 10]

Prints each path as `h -[r]-> x -[r']-> t  (importance)`. Entity /
relation arguments are vocabulary ids of the dataset's test split.
"""

import argparse
import logging
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultra_tpu.utils import config as config_lib


def _pin_cpu():
    """Path interpretation runs the plan-less segment-op conv (autodiff
    needs it) — and XLA scatter on this TPU never completes at KG scale
    (CLAUDE.md). Single-query interpretability belongs on CPU; pin it
    before backend init and drop the ambient tunneled-TPU plugin."""
    import jax

    try:
        import jax._src.xla_bridge as xb

        xb._backend_factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 — unknown harness: leave defaults
        pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--head", type=int, required=True)
    parser.add_argument("--relation", type=int, required=True)
    parser.add_argument("--tail", type=int, required=True)
    parser.add_argument("--beam", type=int, default=10)
    parser.add_argument("--topk", type=int, default=10)
    args, vars_ = config_lib.parse_args(parser, optional_vars=True)
    cfg = config_lib.load_config(args.config, context=vars_)
    _pin_cpu()
    logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")

    from ultra_tpu.data import kg
    from ultra_tpu.models.visualize import visualize
    from ultra_tpu.train.runner import model_config_from_dict, prepare_graph
    from ultra_tpu.utils.ckpt import load_model_checkpoint

    ds_cfg = dict(cfg["dataset"])
    ds_name = ds_cfg.pop("class")
    root = os.path.expanduser(ds_cfg.pop("root", "./kg-datasets"))
    dataset = kg.build_dataset(ds_name, root, **ds_cfg).load()
    ckpt = cfg.get("checkpoint")
    if not ckpt:
        raise SystemExit("visualize.py needs a checkpoint (--ckpt)")
    params = load_model_checkpoint(ckpt)
    ultra_cfg = model_config_from_dict(cfg["model"])
    # visualization differentiates through the un-fused XLA path — no
    # Pallas plans needed (models/visualize.py::_conv_unfused)
    graph = prepare_graph(dataset.test, with_plans=False)

    v, r_direct = graph.num_nodes, graph.num_relations // 2
    for name, val, hi in (("head", args.head, v), ("tail", args.tail, v),
                          ("relation", args.relation, r_direct)):
        if not 0 <= val < hi:
            raise SystemExit(f"--{name} {val} out of range [0, {hi})")

    paths, weights = visualize(
        params, ultra_cfg, graph, args.head, args.tail, args.relation,
        num_beam=args.beam, path_topk=args.topk,
    )
    print(f"top {len(paths)} paths for ({args.head}, {args.relation}) "
          f"-> {args.tail} on {ds_name}/test:")
    for path, w in zip(paths, weights):
        hops = " ".join(f"-[{er}]-> {et}" for (_, et, er) in path)
        print(f"  {path[0][0]} {hops}  (importance {w:.4f})")


if __name__ == "__main__":
    main()
