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
import ast
import logging
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultra_tpu.utils import config as config_lib


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--head", type=int, required=True)
    parser.add_argument("--relation", type=int, required=True)
    parser.add_argument("--tail", type=int, required=True)
    parser.add_argument("--beam", type=int, default=10)
    parser.add_argument("--topk", type=int, default=10)
    args, unparsed = parser.parse_known_args()
    var_parser = argparse.ArgumentParser()
    for var in sorted(config_lib.detect_variables(args.config)):
        var_parser.add_argument(f"--{var}", default=None)
    vars_ = {}
    for k, v in vars(var_parser.parse_args(unparsed)).items():
        if v is None:
            continue
        try:
            vars_[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            vars_[k] = v
    cfg = config_lib.load_config(args.config, context=vars_)
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
