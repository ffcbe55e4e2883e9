"""Serving CLI: load a checkpoint + KG, expose link-prediction and CLQA
HTTP endpoints (ultra_tpu/server.py) with a warm jit cache.

  python scripts/serve.py -c config/transductive/inference.yaml \
      --dataset FB15k237 --ckpt /root/reference/ckpts/ultra_3g.pth \
      --port 8080

  curl localhost:8080/v1/meta
  curl -d '{"queries": [{"head": 14, "relation": 3, "k": 5}]}' \
      localhost:8080/v1/predict
  curl -d '{"queries": [[[3, [1]], [7, [2]]]], "k": 5}' \
      localhost:8080/v1/query        # 2i intersection, BetaE nesting

The graph served is the dataset's TEST split message graph (what zero-shot
evaluation scores against, run.py:121-153). No reference counterpart —
the reference has research scripts only.
"""

import logging
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ultra_tpu.utils import config as config_lib


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--batch-size", type=int, default=8, dest="batch_size")
    # training configs (e.g. inference.yaml) template {{ epochs }}/{{ bpe }}
    # etc. — serving never reads train.*, so template vars are OPTIONAL
    # here (unlike run.py where they become required flags)
    args, vars_ = config_lib.parse_args(parser, optional_vars=True)
    cfg = config_lib.load_config(args.config, context=vars_)
    logging.basicConfig(level=logging.WARNING, format="%(asctime)s %(message)s")
    log = logging.getLogger("ultra_tpu")

    from ultra_tpu.data import kg
    from ultra_tpu.serve import UltraPredictor
    from ultra_tpu.server import PredictionService, make_http_server
    from ultra_tpu.train.runner import model_config_from_dict

    ds_cfg = dict(cfg["dataset"])
    ds_name = ds_cfg.pop("class")
    root = os.path.expanduser(ds_cfg.pop("root", "./kg-datasets"))
    dataset = kg.build_dataset(ds_name, root, **ds_cfg).load()

    ultra_cfg = model_config_from_dict(cfg["model"])
    ckpt = cfg.get("checkpoint")
    if not ckpt:
        raise SystemExit("serve.py needs a checkpoint (--ckpt)")
    log.warning("loading %s on %s/test ...", ckpt, ds_name)
    predictor = UltraPredictor.from_checkpoint(
        ckpt, dataset.test, cfg=ultra_cfg, batch_size=int(args.batch_size)
    )
    service = PredictionService(predictor)
    httpd = make_http_server(service, host=args.host, port=int(args.port))
    log.warning("serving %s on http://%s:%d (predict + query + meta)",
                ds_name, *httpd.server_address)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
