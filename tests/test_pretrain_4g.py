"""Smoke test for config/transductive/pretrain_4g.yaml (reference
config/transductive/pretrain_4g.yaml:1-45): render the shipped config,
substitute the 4 member graphs with offline toys, and launch one
pretraining step through scripts/pretrain.py."""

import os
import subprocess
import sys

import numpy as np
import yaml

from ultra_tpu.utils import config as config_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_4G = os.path.join(REPO, "config", "transductive", "pretrain_4g.yaml")


def test_pretrain_4g_config_renders():
    assert config_lib.detect_variables(CFG_4G) == set()
    cfg = config_lib.load_config(CFG_4G, {})
    assert cfg.dataset["class"] == "JointDataset"
    assert cfg.dataset.graphs == ["FB15k237", "WN18RR", "CoDExMedium", "NELL995"]
    # reference hyperparameters: 400k steps = 10 epochs x 40k batches, bs 64
    assert cfg.train.batch_size == 64
    assert cfg.train.num_epoch == 10
    assert cfg.train.batch_per_epoch == 40000
    assert cfg.task.num_negative == 512
    assert cfg.optimizer.lr == 5.0e-4


def write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_pretrain_4g_one_step(tmp_path):
    """Launch the real 4g config (datasets swapped for offline toys,
    step counts shrunk) one step end to end."""
    root = str(tmp_path / "kg")
    for name, seed in (("fb", 1), ("wn", 2), ("cdx", 3), ("nell", 4)):
        rng = np.random.default_rng(seed)
        lines = sorted({f"e{rng.integers(14)} r{rng.integers(3)} e{rng.integers(14)}"
                        for _ in range(60)})
        raw = os.path.join(root, name, "raw")
        write(os.path.join(raw, "train.txt"), lines[:40])
        write(os.path.join(raw, "valid.txt"), lines[40:50])
        write(os.path.join(raw, "test.txt"), lines[50:])

    cfg = config_lib.load_config(CFG_4G, {})
    cfg["output_dir"] = str(tmp_path / "out")
    cfg["dataset"]["root"] = root
    cfg["model"]["relation_model"].update(input_dim=16, hidden_dims=[16])
    cfg["model"]["entity_model"].update(input_dim=16, hidden_dims=[16])
    cfg["task"]["num_negative"] = 4
    cfg["train"].update(batch_size=4, num_epoch=1, batch_per_epoch=1, fast_test=5)
    def plain(obj):
        if isinstance(obj, dict):
            return {k: plain(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [plain(v) for v in obj]
        return obj

    cfg_file = tmp_path / "p4g.yaml"
    cfg_file.write_text(yaml.safe_dump(plain(cfg)))

    driver = tmp_path / "driver.py"
    driver.write_text(
        f"""
import sys
sys.path.insert(0, {REPO!r})
import tests.conftest
from ultra_tpu.data import kg

def toy(clsname, dirname):
    return type(clsname, (kg.TransductiveDataset,), {{"name": dirname, "urls": ()}})

kg.JointDataset.datasets_map = dict(
    kg.JointDataset.datasets_map,
    FB15k237=toy("FB15k237", "fb"),
    WN18RR=toy("WN18RR", "wn"),
    CoDExMedium=toy("CoDExMedium", "cdx"),
    NELL995=toy("NELL995", "nell"),
)
sys.argv = ["pretrain.py", "-c", {str(cfg_file)!r}]
exec(open({os.path.join(REPO, "scripts", "pretrain.py")!r}).read())
"""
    )
    proc = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out_dirs = os.listdir(tmp_path / "out")
    assert any(
        "model_final" in os.listdir(os.path.join(tmp_path / "out", d))
        for d in out_dirs
    )
