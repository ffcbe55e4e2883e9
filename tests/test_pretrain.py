"""Multi-graph pretraining smoke test on two toy datasets (offline)."""

import os

import jax
import numpy as np

from ultra_tpu.data import kg
from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
from ultra_tpu.train.loop import init_ultra_params
from ultra_tpu.train.pretrain import PretrainGraphs, pretrain


def write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def make_toy(root, name, num_nodes=15, num_rel=3, seed=0):
    rng = np.random.default_rng(seed)
    lines = set()
    while len(lines) < 60:
        h, t = rng.choice(num_nodes, 2, replace=False)
        lines.add(f"{name}{h} r{rng.integers(0, num_rel)} {name}{t}")
    lines = sorted(lines)
    raw = os.path.join(root, name, "raw")
    write(os.path.join(raw, "train.txt"), lines[:40])
    write(os.path.join(raw, "valid.txt"), lines[40:50])
    write(os.path.join(raw, "test.txt"), lines[50:])

    cls = type(name, (kg.TransductiveDataset,), {"name": name, "urls": ()})
    return cls(root).load()


def test_pretrain_two_graphs(tmp_path):
    root = str(tmp_path)
    datasets = [make_toy(root, "ga", seed=1), make_toy(root, "gb", seed=2)]

    dims = (16, 16)
    cfg_model = UltraConfig(
        relation_model=NBFNetConfig(input_dim=16, hidden_dims=dims, num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=16, hidden_dims=dims, num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg_model, jax.random.key(0))
    graphs = PretrainGraphs(datasets, with_plans=False)
    assert abs(graphs.graph_probs.sum() - 1.0) < 1e-9

    cfg = {
        "train": {"batch_size": 4, "num_epoch": 1, "batch_per_epoch": 4, "fast_test": 5},
        "task": {"num_negative": 4, "strict_negative": True, "adversarial_temperature": 1},
        "optimizer": {"lr": 1e-3},
    }
    out = pretrain(cfg, cfg_model, params, graphs, str(tmp_path / "work"), seed=0)
    # params updated and finite
    for leaf in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()


def test_pretrain_cli(tmp_path):
    """Drive scripts/pretrain.py end to end on two toy member graphs."""
    import subprocess
    import sys

    root = str(tmp_path / "kg")
    for name, seed in (("jga", 4), ("jgb", 5)):
        rng = np.random.default_rng(seed)
        lines = sorted({f"x{rng.integers(15)} r{rng.integers(3)} x{rng.integers(15)}"
                        for _ in range(60)})
        raw = os.path.join(root, name, "raw")
        write(os.path.join(raw, "train.txt"), lines[:40])
        write(os.path.join(raw, "valid.txt"), lines[40:50])
        write(os.path.join(raw, "test.txt"), lines[50:])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_file = tmp_path / "p.yaml"
    cfg_file.write_text(
        f"""
output_dir: {tmp_path}/out
dataset:
  class: JointDataset
  graphs: [JGA, JGB]
  root: {root}
model:
  relation_model: {{input_dim: 16, hidden_dims: [16]}}
  entity_model: {{input_dim: 16, hidden_dims: [16]}}
task:
  name: MultiGraphPretraining
  num_negative: 4
  strict_negative: yes
  adversarial_temperature: 1
optimizer: {{lr: 1.0e-3}}
train:
  batch_size: 4
  num_epoch: 1
  batch_per_epoch: 3
  fast_test: 5
"""
    )
    driver = tmp_path / "driver.py"
    driver.write_text(
        f"""
import sys
sys.path.insert(0, {repo!r})
import tests.conftest
from ultra_tpu.data import kg

class JGA(kg.TransductiveDataset):
    name = "jga"
    urls = ()

class JGB(kg.TransductiveDataset):
    name = "jgb"
    urls = ()

kg.JointDataset.datasets_map = dict(kg.JointDataset.datasets_map, JGA=JGA, JGB=JGB)
sys.argv = ["pretrain.py", "-c", {str(cfg_file)!r}]
exec(open({os.path.join(repo, "scripts", "pretrain.py")!r}).read())
"""
    )
    # ULTRA_WORKDIR pins the workdir (supervisor resume contract, same as
    # run.py — a timestamped dir would break crash-restart resumption)
    pinned = str(tmp_path / "pinned")
    env = dict(os.environ, ULTRA_WORKDIR=pinned)
    proc = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        timeout=600, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "model_final" in os.listdir(pinned), os.listdir(tmp_path)
    assert not (tmp_path / "out").exists() or not any(
        "model_final" in os.listdir(os.path.join(tmp_path / "out", d))
        for d in os.listdir(tmp_path / "out")
    )
    # epoch-level crash checkpoint written (supervisor resume contract) ...
    assert "model_latest" in os.listdir(pinned)
    # ... and ULTRA_RESUME_FROM restores it on relaunch
    env["ULTRA_RESUME_FROM"] = os.path.join(pinned, "model_latest")
    proc2 = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        timeout=600, cwd=repo, env=env,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "resumed pretrain state from" in proc2.stderr + proc2.stdout


def test_crash_diagnostic_names_recent_members():
    """The worker-crash handler must (a) fire only on the worker-crash
    flavor of UNAVAILABLE and (b) name every recently dispatched member
    shape most-recent first (async dispatch can surface the crash steps
    after the faulting program was enqueued)."""
    from types import SimpleNamespace

    from ultra_tpu.train.pretrain import crash_diagnostic, is_worker_crash

    assert is_worker_crash(
        Exception("UNAVAILABLE: TPU worker process crashed or restarted.")
    )
    assert not is_worker_crash(
        Exception("UNAVAILABLE: failed to connect to coordination service")
    )

    graphs = SimpleNamespace(
        datasets=[SimpleNamespace(name=f"g{i}") for i in range(3)],
        train_graphs=[
            SimpleNamespace(num_nodes=100 + i, num_relations=4,
                            num_edges_padded=1024 * (i + 1))
            for i in range(3)
        ],
    )
    err = crash_diagnostic(graphs, recent=[0, 1, 0, 2], batch_size=32)
    msg = str(err)
    # most recent first, deduped
    assert msg.index("member 2") < msg.index("member 0") < msg.index("member 1")
    assert "V=102" in msg and "e_pad=3072" in msg
    assert "grad_accum" in msg and "batch_size=32" in msg
