"""End-to-end runner test: config -> toy dataset -> train 1 epoch -> eval,
entirely offline, exercising the same path as scripts/run.py."""

import os

import numpy as np
import pytest

from ultra_tpu.data import kg
from ultra_tpu.train import runner


def write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture
def toy_registered(tmp_path):
    rng = np.random.default_rng(0)
    nodes = [f"n{i}" for i in range(20)]
    rels = ["r0", "r1", "r2"]
    lines = set()
    while len(lines) < 80:
        h, t = rng.choice(20, 2, replace=False)
        r = rng.integers(0, 3)
        lines.add(f"n{h} r{r} n{t}")
    lines = sorted(lines)
    raw = os.path.join(str(tmp_path), "toyrun", "raw")
    write(os.path.join(raw, "train.txt"), lines[:60])
    write(os.path.join(raw, "valid.txt"), lines[60:70])
    write(os.path.join(raw, "test.txt"), lines[70:])

    class ToyRun(kg.TransductiveDataset):
        name = "toyrun"
        urls = ()

    kg.DATASETS["ToyRun"] = ToyRun
    yield str(tmp_path)
    kg.DATASETS.pop("ToyRun", None)


def small_model_cfg():
    return {
        "relation_model": {"input_dim": 16, "hidden_dims": [16, 16]},
        "entity_model": {"input_dim": 16, "hidden_dims": [16, 16]},
    }


def test_run_link_prediction_end_to_end(toy_registered, tmp_path):
    cfg = {
        "dataset": {"class": "ToyRun", "root": toy_registered},
        "model": small_model_cfg(),
        "task": {
            "name": "TransductiveInference",
            "num_negative": 4,
            "strict_negative": True,
            "adversarial_temperature": 1,
            "metric": ["mr", "mrr", "hits@10"],
        },
        "optimizer": {"lr": 1e-3},
        "train": {"batch_size": 4, "num_epoch": 1, "batch_per_epoch": 5},
    }
    workdir = str(tmp_path / "work")
    results = runner.run_link_prediction(cfg, workdir, seed=0, with_plans=False)
    for split in ("valid", "test"):
        assert 0.0 < results[split]["mrr"] <= 1.0
        assert results[split]["mr"] >= 1.0
    # best-model checkpoint was written and reloaded
    assert any(f.startswith("model_epoch_") for f in os.listdir(workdir))


def test_zero_shot_path(toy_registered, tmp_path):
    """num_epoch==0 goes straight to eval (run.py:26-27 early return)."""
    cfg = {
        "dataset": {"class": "ToyRun", "root": toy_registered},
        "model": small_model_cfg(),
        "task": {"name": "TransductiveInference", "metric": ["mrr"]},
        "optimizer": {"lr": 1e-3},
        "train": {"batch_size": 4, "num_epoch": 0},
    }
    results = runner.run_link_prediction(cfg, str(tmp_path / "w2"), seed=0, with_plans=False)
    assert "mrr" in results["test"]


def test_resume_from_checkpoint(toy_registered, tmp_path):
    """Training resumes with full optimizer state from a saved epoch ckpt."""
    cfg = {
        "dataset": {"class": "ToyRun", "root": toy_registered},
        "model": small_model_cfg(),
        "task": {"name": "TransductiveInference", "num_negative": 4,
                 "strict_negative": True, "adversarial_temperature": 1,
                 "metric": ["mrr"]},
        "optimizer": {"lr": 1e-3},
        "train": {"batch_size": 4, "num_epoch": 1, "batch_per_epoch": 3},
    }
    w1 = str(tmp_path / "w1")
    runner.run_link_prediction(cfg, w1, seed=0, with_plans=False)
    ckpts = [f for f in os.listdir(w1) if f.startswith("model_epoch_")]
    assert ckpts
    cfg["resume_from"] = os.path.join(w1, sorted(ckpts)[-1])
    results = runner.run_link_prediction(cfg, str(tmp_path / "w2"), seed=1, with_plans=False)
    assert 0.0 < results["test"]["mrr"] <= 1.0


def test_env_resume_override(toy_registered, tmp_path, monkeypatch):
    """ULTRA_RESUME_FROM (the supervisor's restart hook) resumes the train
    state when the crash checkpoint exists and is ignored when absent."""
    cfg = {
        "dataset": {"class": "ToyRun", "root": toy_registered},
        "model": small_model_cfg(),
        "task": {"name": "TransductiveInference", "num_negative": 4,
                 "strict_negative": True, "adversarial_temperature": 1,
                 "metric": ["mrr"]},
        "optimizer": {"lr": 1e-3},
        "train": {"batch_size": 4, "num_epoch": 1, "batch_per_epoch": 3,
                  "checkpoint_interval_steps": 2},
    }
    w1 = str(tmp_path / "w1")
    monkeypatch.setenv("ULTRA_RESUME_FROM", os.path.join(w1, "model_latest"))
    # first run: checkpoint doesn't exist yet -> fresh start, writes it
    runner.run_link_prediction(cfg, w1, seed=0, with_plans=False)
    assert os.path.exists(os.path.join(w1, "model_latest"))
    # second run: resumes from it (optimizer state round-trips)
    results = runner.run_link_prediction(cfg, w1, seed=1, with_plans=False)
    assert 0.0 < results["test"]["mrr"] <= 1.0


def test_supervise_restart_and_resume(tmp_path):
    """scripts/supervise.py restarts a crashing child, injects
    ULTRA_RESUME_FROM once the crash checkpoint exists, and propagates the
    final exit code."""
    import subprocess
    import sys as _sys

    work = tmp_path / "w"
    child = tmp_path / "child.py"
    child.write_text(
        """
import os, sys
work = os.environ["ULTRA_WORKDIR"]
marker = os.path.join(work, "ran_once")
if not os.path.exists(marker):
    open(marker, "w").write("1")
    os.makedirs(os.path.join(work, "model_latest"), exist_ok=True)
    sys.exit(1)  # simulated crash after writing the crash checkpoint
assert os.environ.get("ULTRA_RESUME_FROM", "").endswith("model_latest"), \
    os.environ.get("ULTRA_RESUME_FROM")
print("resumed ok")
"""
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts", "supervise.py"),
         "--workdir", str(work), "--max-restarts", "2", "--no-probe",
         "--", _sys.executable, str(child)],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    assert "resumed ok" in proc.stdout
    assert "restart 1: resuming from" in proc.stderr


def test_prepare_graph_dense_relation_cooccurrence():
    """The relation graph's edge count is data-dependent (up to 4*R^2).
    prepare_graph used to pad it to ~4*R, which crashed on any graph whose
    relations co-occur densely — caught by the round-3 on-chip CLI run at
    FB15k-237 scale (31,416 rel edges vs a 2,048 guess)."""
    rng = np.random.default_rng(0)
    num_rel = 40  # dense co-occurrence: ~4*R^2 = 6400 >> the old 1024 pad
    h = rng.integers(0, 6, size=2000)
    t = rng.integers(0, 6, size=2000)
    r = rng.integers(0, num_rel, size=2000)
    split = kg.KGSplit(
        edge_index=np.stack([h, t]),
        edge_type=r,
        num_nodes=6,
        num_relations=num_rel,
        target_edge_index=np.stack([h[:8], t[:8]]),
        target_edge_type=r[:8],
    )
    graph = runner.prepare_graph(split, with_plans=False)
    rel_e = graph.relation_graph.edge_index.shape[1]
    assert rel_e >= graph.relation_graph.num_edges  # padded, not truncated
    assert graph.relation_graph.num_edges > 4 * num_rel  # the dense case


def test_auto_remat_on_hbm_oom(toy_registered, tmp_path, monkeypatch):
    """An HBM OOM at train-step compile retries once with remat enabled
    (compile-time failure: no training progress to lose)."""
    calls = []
    real = runner.train_and_validate

    def fake(cfg, ultra_cfg, params, *a, **kw):
        calls.append((ultra_cfg.relation_model.remat, ultra_cfg.entity_model.remat))
        if len(calls) == 1:
            raise RuntimeError(
                "XLA:TPU compile permanent error. Ran out of memory in "
                "memory space hbm. Used 16.68G of 15.75G hbm."
            )
        return real(cfg, ultra_cfg, params, *a, **kw)

    monkeypatch.setattr(runner, "train_and_validate", fake)
    cfg = {
        "output_dir": str(tmp_path),
        "dataset": {"class": "ToyRun", "root": toy_registered},
        "model": small_model_cfg(),
        "task": {"name": "TransductiveInference", "metric": ["mrr"]},
        "optimizer": {"lr": 1e-3},
        "train": {"batch_size": 4, "num_epoch": 1, "batch_per_epoch": 4},
    }
    results = runner.run_link_prediction(cfg, str(tmp_path / "wd"))
    assert calls == [(False, False), (True, True)]
    assert "test" in results
