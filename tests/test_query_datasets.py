"""BetaE pickle-format loader tests with locally written fixtures (no
network): transductive LogicalQueryDataset and the inductive variant's
query filtering / restrict_nodes plumbing."""

import os
import pickle

import numpy as np
import pytest

from ultra_tpu.query import ops
from ultra_tpu.query import datasets as qds


def write_transductive_fixture(root, name="toy-betae"):
    """Minimal BetaE dump: id2ent/id2rel pickles, triple txts, query pickles."""
    path = os.path.join(root, name)
    os.makedirs(path, exist_ok=True)
    num_ent, num_rel = 12, 6  # rels include inverses as rel+1 (BetaE style)
    with open(os.path.join(path, "id2ent.pkl"), "wb") as f:
        pickle.dump({i: f"e{i}" for i in range(num_ent)}, f)
    with open(os.path.join(path, "id2rel.pkl"), "wb") as f:
        pickle.dump({i: f"r{i}" for i in range(num_rel)}, f)

    rng = np.random.default_rng(0)
    triples = {(int(rng.integers(num_ent)), int(rng.integers(num_rel)),
                int(rng.integers(num_ent))) for _ in range(40)}
    triples = sorted(triples)
    for split, chunk in (("train", triples[:30]), ("valid", triples[30:35]),
                         ("test", triples[35:])):
        with open(os.path.join(path, f"{split}.txt"), "w") as f:
            for h, r, t in chunk:
                f.write(f"{h} {r} {t}\n")

    # queries: 1p and 2i structures (BetaE nested tuples)
    s1p = ("e", ("r",))
    s2i = (("e", ("r",)), ("e", ("r",)))
    q1 = (3, (1,))
    q2 = (5, (0,))
    q2i = ((3, (1,)), (7, (2,)))
    train_queries = {s1p: {q1, q2}}
    eval_queries = {s1p: {q1}, s2i: {q2i}}

    with open(os.path.join(path, "train-queries.pkl"), "wb") as f:
        pickle.dump(train_queries, f)
    with open(os.path.join(path, "train-answers.pkl"), "wb") as f:
        pickle.dump({q1: {2, 4}, q2: {6}}, f)
    for split in ("valid", "test"):
        with open(os.path.join(path, f"{split}-queries.pkl"), "wb") as f:
            pickle.dump(eval_queries, f)
        with open(os.path.join(path, f"{split}-easy-answers.pkl"), "wb") as f:
            pickle.dump({q1: {2}, q2i: set()}, f)
        with open(os.path.join(path, f"{split}-hard-answers.pkl"), "wb") as f:
            pickle.dump({q1: {4}, q2i: {8, 9}}, f)
    return num_ent, num_rel


def test_transductive_betae_loader(tmp_path):
    root = str(tmp_path)
    num_ent, num_rel = write_transductive_fixture(root)

    class ToyBetae(qds.LogicalQueryDataset):
        name = "toy-betae"

    ds = ToyBetae(root).load()
    assert ds.graphs[0].num_nodes == num_ent
    assert ds.graphs[0].num_relations == num_rel
    assert ds.graphs[0].inverse_rel_plus_one
    assert ds.num_samples[0] == 2  # two 1p train queries
    assert ds.num_samples[1] == 2 and ds.num_samples[2] == 2

    # programs decode back to the right structures
    kind, operand = ops.decompose(ds.queries)
    n_proj = (kind == ops.K_PROJECTION).sum(axis=1)
    assert set(n_proj.tolist()) <= {1, 2}
    # answers preserved
    (tr_lo, tr_hi), (va_lo, va_hi), _ = ds.split_ranges()
    for i in range(tr_lo, tr_hi):
        assert len(ds.easy_answers[i]) >= 1
        assert len(ds.hard_answers[i]) == 0  # train has no hard split
    # union filtering: 2u types only for the requested union_type
    assert all("-DM" not in t for t in ds.id2type)

    # end-to-end: tiny model answers the loaded queries
    import jax
    import jax.numpy as jnp

    from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig
    from ultra_tpu.query.executor import QueryConfig
    from ultra_tpu.query.trainer import evaluate_queries, prepare_query_graph
    from ultra_tpu.train.loop import init_ultra_params

    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=16, hidden_dims=(16,), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=16, hidden_dims=(16,), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(0))
    graph = prepare_query_graph(ds.graphs[2], with_plans=False)
    m = evaluate_queries(
        params, cfg, QueryConfig(dropout_ratio=0.0), graph, ds,
        np.arange(va_hi, va_hi + ds.num_samples[2]), batch_size=2,
        metric_names=("mrr", "hits@10"),
    )
    assert "mrr" in m and np.isfinite(m["mrr"])


def test_inductive_betae_loader(tmp_path):
    root = str(tmp_path)
    path = os.path.join(root, "9999")
    os.makedirs(path, exist_ok=True)

    def wt(fname, triples):
        with open(os.path.join(path, fname), "w") as f:
            for h, r, t in triples:
                f.write(f"{h} {r} {t}\n")

    # node ranges: train 0-5, val inference adds 6-8, test inference adds 9-11
    wt("train_graph.txt", [(0, 0, 1), (1, 1, 2), (2, 0, 3), (3, 1, 4), (4, 0, 5)])
    wt("val_inference.txt", [(5, 0, 6), (6, 1, 7), (7, 0, 8)])
    wt("test_inference.txt", [(5, 1, 9), (9, 0, 10), (10, 1, 11)])

    s1p = ("e", ("r",))
    s2u = (("e", ("r",)), ("e", ("r",)), ("u",))
    q1 = (0, (0,))
    q2u = ((0, (0,)), (1, (1,)), (-1,))
    for split in ("train", "valid", "test"):
        with open(os.path.join(path, f"{split}_queries.pkl"), "wb") as f:
            pickle.dump({s1p: {q1}, s2u: {q2u}}, f)
        with open(os.path.join(path, f"{split}_answers_hard.pkl"), "wb") as f:
            pickle.dump({s1p: {q1: {1}}, s2u: {q2u: {1, 2}}}, f)
        if split != "train":
            with open(os.path.join(path, f"{split}_answers_easy.pkl"), "wb") as f:
                pickle.dump({s1p: {q1: set()}, s2u: {q2u: set()}}, f)

    ds = qds.InductiveFB15k237Query(root, 9999).load()
    # union structures are excluded from TRAIN via train_patterns
    assert ds.num_samples[0] == 1
    assert ds.num_samples[1] == 2 and ds.num_samples[2] == 2
    # graphs grow by node ranges; eval restricted to their node subsets
    assert ds.graphs[0].num_nodes == 6
    assert ds.graphs[1].num_nodes == 12 and ds.graphs[2].num_nodes == 12
    assert ds.graphs[1].restrict_nodes is not None
    assert 9 not in set(ds.graphs[1].restrict_nodes)
    assert 9 in set(ds.graphs[2].restrict_nodes)


def test_run_query_cli(tmp_path):
    """Drive scripts/run_query.py as a subprocess on the pickle fixture."""
    import subprocess
    import sys

    root = str(tmp_path / "qdata")
    os.makedirs(root, exist_ok=True)
    write_transductive_fixture(root)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_file = tmp_path / "q.yaml"
    cfg_file.write_text(
        f"""
output_dir: {tmp_path}/out
dataset:
  class: ToyBetaeCLI
  root: {root}
model:
  logic: product
  dropout_ratio: 0.25
  threshold: 0.0
  model:
    relation_model: {{input_dim: 16, hidden_dims: [16]}}
    entity_model: {{input_dim: 16, hidden_dims: [16]}}
task:
  name: ComplexQuery
  adversarial_temperature: 0.2
  metric: [mrr, hits@10]
optimizer: {{lr: 1.0e-3}}
train:
  batch_size: 2
  num_epoch: {{{{ epochs }}}}
"""
    )
    driver = tmp_path / "driver.py"
    driver.write_text(
        f"""
import sys
sys.path.insert(0, {repo!r})
import tests.conftest
from ultra_tpu.query import datasets as qds

class ToyBetaeCLI(qds.LogicalQueryDataset):
    name = "toy-betae"

qds.QUERY_DATASETS["ToyBetaeCLI"] = ToyBetaeCLI
sys.argv = ["run_query.py", "-c", {str(cfg_file)!r}, "--epochs", "0"]
exec(open({os.path.join(repo, "scripts", "run_query.py")!r}).read())
"""
    )
    proc = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        timeout=600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "mrr" in proc.stderr or "mrr" in proc.stdout


def test_wikitopics_query_loader(tmp_path):
    """WikiTopics: train/valid share the training graph (valid restricted to
    its nodes); the test graph is fully disjoint with its own vocab
    (datasets_query.py:451-528)."""
    root = str(tmp_path)
    path = os.path.join(root, "WikiTopics_QE", "art")
    os.makedirs(path)

    def wt(fname, triples):
        with open(os.path.join(path, fname), "w") as f:
            for h, r, t in triples:
                f.write(f"{h} {r} {t}\n")

    wt("train_graph.txt", [(0, 0, 1), (1, 1, 2), (2, 0, 3), (3, 1, 4)])
    # disjoint test vocab: ids 0..3 again but a different graph
    wt("test_inference.txt", [(0, 0, 2), (2, 1, 3), (3, 0, 1)])

    s1p = ("e", ("r",))
    q1 = (0, (0,))
    with open(os.path.join(path, "train_queries.pkl"), "wb") as f:
        pickle.dump({s1p: {q1}}, f)
    with open(os.path.join(path, "train_answers_hard.pkl"), "wb") as f:
        pickle.dump({s1p: {q1: {1}}}, f)
    for split in ("valid", "test"):
        with open(os.path.join(path, f"{split}_queries.pkl"), "wb") as f:
            pickle.dump({s1p: {q1}}, f)
        with open(os.path.join(path, f"{split}_answers_easy.pkl"), "wb") as f:
            pickle.dump({s1p: {q1: set()}}, f)
        with open(os.path.join(path, f"{split}_answers_hard.pkl"), "wb") as f:
            pickle.dump({s1p: {q1: {2}}}, f)

    ds = qds.WikiTopicsQuery(root, "art").load()
    assert ds.num_samples == (1, 1, 1)
    assert ds.graphs[0].num_nodes == 5  # train vocab
    assert ds.graphs[1].num_nodes == 5 and ds.graphs[1].restrict_nodes is not None
    assert ds.graphs[2].num_nodes == 4  # disjoint test vocab
    assert ds.graphs[2].edge_index.shape[1] == 3


def test_extended_eval_loader(tmp_path):
    """Faithfulness eval: train queries re-answered on the larger graphs,
    answers all hard (datasets_query.py:559-633)."""
    root = str(tmp_path)
    path = os.path.join(root, "9999")
    os.makedirs(path)

    def wt(fname, triples):
        with open(os.path.join(path, fname), "w") as f:
            for h, r, t in triples:
                f.write(f"{h} {r} {t}\n")

    wt("train_graph.txt", [(0, 0, 1), (1, 1, 2), (2, 0, 3)])
    wt("val_inference.txt", [(3, 0, 4)])
    wt("test_inference.txt", [(3, 1, 5)])

    s1p = ("e", ("r",))
    q1 = (0, (0,))
    for split in ("train", "valid", "test"):
        with open(os.path.join(path, f"{split}_queries.pkl"), "wb") as f:
            pickle.dump({s1p: {q1}}, f)
        with open(os.path.join(path, f"{split}_answers_hard.pkl"), "wb") as f:
            pickle.dump({s1p: {q1: {1}}}, f)
        if split != "train":
            with open(os.path.join(path, f"{split}_answers_easy.pkl"), "wb") as f:
                pickle.dump({s1p: {q1: set()}}, f)
    # extended-eval answer files: train queries' answers on valid/test graphs,
    # keyed by enumeration index
    with open(os.path.join(path, "train_answers_valid.pkl"), "wb") as f:
        pickle.dump({s1p: {0: {1, 4}}}, f)
    with open(os.path.join(path, "train_answers_test.pkl"), "wb") as f:
        pickle.dump({s1p: {0: {1, 5}}}, f)

    ds = qds.InductiveFB15k237QueryExtendedEval(root, 9999).load()
    assert ds.num_samples == (1, 1, 1)
    assert all(len(e) == 0 for e in ds.easy_answers)  # all answers are hard
    assert set(ds.hard_answers[1].tolist()) == {1, 4}
    assert set(ds.hard_answers[2].tolist()) == {1, 5}


def test_run_query_many_cli(tmp_path):
    """Drive scripts/run_query_many.py (zero-shot CLQA sweep + CSV)."""
    import subprocess
    import sys

    root = str(tmp_path / "qdata")
    os.makedirs(root, exist_ok=True)
    write_transductive_fixture(root)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_file = tmp_path / "q.yaml"
    cfg_file.write_text(
        """
output_dir: ./out
dataset:
  class: {{ dataset }}
model:
  logic: product
  dropout_ratio: 0.25
  threshold: {{ threshold }}
  model:
    relation_model: {input_dim: 16, hidden_dims: [16]}
    entity_model: {input_dim: 16, hidden_dims: [16]}
task:
  name: ComplexQuery
  adversarial_temperature: 0.2
  metric: [mrr, hits@10]
optimizer: {lr: 1.0e-3}
train:
  batch_size: {{ bs }}
  num_epoch: {{ epochs }}
  batch_per_epoch: {{ bpe }}
ultra_ckpt: {{ ultra_ckpt }}
ultraquery_ckpt: {{ qe_ckpt }}
"""
    )
    out_csv = tmp_path / "results.csv"
    driver = tmp_path / "driver.py"
    driver.write_text(
        f"""
import sys
sys.path.insert(0, {repo!r})
import tests.conftest
from ultra_tpu.query import datasets as qds

class ToyBetaeMany(qds.LogicalQueryDataset):
    name = "toy-betae"

qds.QUERY_DATASETS["ToyBetaeMany"] = ToyBetaeMany
sys.argv = ["run_query_many.py", "-c", {str(cfg_file)!r},
            "-d", "ToyBetaeMany", "--root", {root!r}, "--bs", "2",
            "--output", {str(out_csv)!r}]
exec(open({os.path.join(repo, "scripts", "run_query_many.py")!r}).read())
"""
    )
    proc = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        timeout=600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    content = out_csv.read_text()
    assert "ToyBetaeMany" in content and "mrr" in content


def test_joint_query_pretraining_cli(tmp_path):
    """Drive scripts/run_query.py on a JointQueryDataset mixture: multigraph
    query pretraining + per-member test eval."""
    import subprocess
    import sys

    root = str(tmp_path / "qdata")
    os.makedirs(root, exist_ok=True)
    write_transductive_fixture(root, name="toy-a")
    write_transductive_fixture(root, name="toy-b")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_file = tmp_path / "q.yaml"
    cfg_file.write_text(
        f"""
output_dir: {tmp_path}/out
dataset:
  class: ToyJointQuery
  root: {root}
  graphs: [A, B]
model:
  logic: product
  dropout_ratio: 0.25
  threshold: 0.0
  model:
    relation_model: {{input_dim: 16, hidden_dims: [16]}}
    entity_model: {{input_dim: 16, hidden_dims: [16]}}
task:
  name: ComplexQuery
  adversarial_temperature: 0.2
  metric: [mrr]
optimizer: {{lr: 1.0e-3}}
train:
  batch_size: 2
  num_epoch: 1
  batch_per_epoch: 3
"""
    )
    driver = tmp_path / "driver.py"
    driver.write_text(
        f"""
import sys
sys.path.insert(0, {repo!r})
import tests.conftest
from ultra_tpu.query import datasets as qds

class ToyA(qds.LogicalQueryDataset):
    name = "toy-a"

class ToyB(qds.LogicalQueryDataset):
    name = "toy-b"

class ToyJointQuery(qds.JointQueryDataset):
    datasets_map = {{"A": ToyA, "B": ToyB}}

qds.QUERY_DATASETS["ToyJointQuery"] = ToyJointQuery
sys.argv = ["run_query.py", "-c", {str(cfg_file)!r}]
exec(open({os.path.join(repo, "scripts", "run_query.py")!r}).read())
"""
    )
    proc = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        timeout=600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    log = proc.stderr + proc.stdout
    assert "avg valid mrr" in log
    assert "test metrics [toy-a-betae]" in log or "test metrics" in log
