"""Dataset-layer tests with locally written raw files (no network):
vocab accumulation order, inverse-edge augmentation, SparserKG column order,
inductive valid_on_inf switch, GraIL merge, npz cache roundtrip, device
conversion."""

import os

import numpy as np
import pytest

from ultra_tpu.data import kg


def write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture
def trans_root(tmp_path):
    root = str(tmp_path)
    raw = os.path.join(root, "toy", "raw")
    write(os.path.join(raw, "train.txt"), ["a r1 b", "b r2 c", "c r1 a", "a r2 c"])
    write(os.path.join(raw, "valid.txt"), ["a r1 c"])
    write(os.path.join(raw, "test.txt"), ["b r1 d"])  # new node d in test
    return root


class Toy(kg.TransductiveDataset):
    name = "toy"
    urls = ()


def test_transductive_semantics(trans_root):
    ds = Toy(trans_root).load()
    train = ds.train
    # vocab: a=0, b=1, c=2 (train order), d=3 (from test); r1=0, r2=1
    assert train.num_nodes == 4
    assert train.num_relations == 4  # 2 raw * 2 for inverses
    # message graph: 4 direct + 4 inverse edges
    assert train.edge_index.shape == (2, 8)
    np.testing.assert_array_equal(train.target_edge_index[:, 0], [0, 1])
    # inverse block: flipped + type offset
    np.testing.assert_array_equal(train.edge_index[:, 4], train.target_edge_index[::-1, 0])
    assert train.edge_type[4] == train.target_edge_type[0] + 2
    # test targets reference node d=3
    assert ds.test.target_edge_index[1, 0] == 3
    # all splits share the train message graph
    np.testing.assert_array_equal(ds.valid.edge_index, train.edge_index)

    # cache roundtrip
    ds2 = Toy(trans_root).load()
    np.testing.assert_array_equal(ds2.train.edge_index, ds.train.edge_index)
    assert ds2.train.num_relations == ds.train.num_relations


def test_sparser_kg_column_order(tmp_path):
    root = str(tmp_path)
    raw = os.path.join(root, "SparseKG", "toy-sparse", "raw")
    # (h, t, r) order, tab-separated (datasets.py:555-582)
    write(os.path.join(raw, "train.txt"), ["a\tb\tr1", "b\tc\tr2"])
    write(os.path.join(raw, "valid.txt"), ["a\tc\tr1"])
    write(os.path.join(raw, "test.txt"), ["c\ta\tr2"])

    class ToySparse(kg.SparserKG):
        name = "toy-sparse"
        urls = ()

        def download(self):
            raise AssertionError("files exist")

    ds = ToySparse(root).load()
    # a=0, b=1, c=2; r1=0, r2=1; triple (a, b, r1) -> target edge (0 -> 1)
    np.testing.assert_array_equal(ds.train.target_edge_index[:, 0], [0, 1])
    np.testing.assert_array_equal(ds.train.target_edge_type, [0, 1])


@pytest.fixture
def ind_root(tmp_path):
    root = str(tmp_path)
    raw = os.path.join(root, "toyind", "1", "raw")
    write(os.path.join(raw, "transductive_train.txt"), ["a r1 b", "b r2 c"])
    write(os.path.join(raw, "inference_graph.txt"), ["x r1 y", "y r2 z", "z r1 x"])
    write(os.path.join(raw, "inf_valid.txt"), ["x r2 z"])
    write(os.path.join(raw, "inf_test.txt"), ["y r1 x"])
    return root


class ToyInd(kg.InductiveDataset):
    name = "toyind"
    urls = ()


def test_inductive_semantics(ind_root):
    ds = ToyInd(ind_root, version=1).load()
    # train graph over {a,b,c}; inference graph over {x,y,z}
    assert ds.train.num_nodes == 3
    assert ds.test.num_nodes == 3
    assert ds.train.edge_index.shape == (2, 4)  # 2 + inverses
    assert ds.test.edge_index.shape == (2, 6)  # 3 + inverses
    # valid lives on the inference graph by default (valid_on_inf)
    np.testing.assert_array_equal(ds.valid.edge_index, ds.test.edge_index)
    # inference vocab independent: x=0, y=1, z=2
    np.testing.assert_array_equal(ds.test.target_edge_index[:, 0], [1, 0])


def test_grail_merge_valid_test(tmp_path):
    root = str(tmp_path)
    raw = os.path.join(root, "grail", "toygrail", "v1", "raw")
    write(os.path.join(raw, "train.txt"), ["a\tr1\tb", "b\tr2\tc"])
    write(os.path.join(raw, "valid.txt"), ["a\tr1\tc"])
    write(os.path.join(raw, "train_ind.txt"), ["p\tr1\tq", "q\tr2\ts"])
    write(os.path.join(raw, "valid_ind.txt"), ["p\tr1\ts"])
    write(os.path.join(raw, "test_ind.txt"), ["q\tr1\tp"])

    class ToyGrail(kg.GrailInductiveDataset):
        name = "toygrail"
        urls = ()

        def download(self):
            raise AssertionError("files exist")

    ds = ToyGrail(root, "v1").load()
    # merged test: valid_ind + test_ind = 2 targets (datasets.py:119-122)
    assert ds.test.target_edge_index.shape[1] == 2
    # test message graph = train_ind with inverses
    assert ds.test.edge_index.shape == (2, 4)
    assert ds.train.num_nodes == 3 and ds.test.num_nodes == 3


def test_split_to_graph_roundtrip(trans_root):
    ds = Toy(trans_root).load()
    graph = kg.split_to_graph(ds.train, pad_edges_to=16, with_plans=True, plan_rb=8, plan_chunk=8)
    assert graph.num_edges_padded == 16
    assert graph.relation_graph is not None
    assert graph.plans is not None and graph.relation_graph.plans is not None
    assert graph.relation_graph.num_nodes == ds.train.num_relations

    # pallas (interpret) forward on this tiny graph runs end to end
    import jax, jax.numpy as jnp
    from ultra_tpu.models.nbfnet import NBFNetConfig, UltraConfig, ultra_score_all
    from ultra_tpu.train.loop import init_ultra_params

    cfg = UltraConfig(
        relation_model=NBFNetConfig(input_dim=16, hidden_dims=(16,), num_relation=4),
        entity_model=NBFNetConfig(
            input_dim=16, hidden_dims=(16,), num_relation=1, project_relations=True
        ),
    )
    params = init_ultra_params(cfg, jax.random.key(0))
    out = ultra_score_all(
        params, cfg, graph, jnp.asarray(np.array([0, 1])), r_index=jnp.asarray(np.array([0, 1]))
    )
    assert np.isfinite(np.asarray(out)).all()


def test_mtdea_limit_vocab(tmp_path):
    """MTDEA valid split drops triples with tokens outside the train vocab
    (limit_vocab, datasets.py:895-944) and num_nodes of valid = valid vocab."""
    root = str(tmp_path)
    raw = os.path.join(root, "mtdea", "FBNELL", "FBNELL_v1", "raw")
    write(os.path.join(raw, "transductive_train.txt"), ["a\tr1\tb", "b\tr2\tc"])
    write(os.path.join(raw, "inference_graph.txt"), ["x\tr1\ty", "y\tr2\tz"])
    # second valid triple mentions unseen entity 'q' -> dropped
    write(
        os.path.join(raw, "transductive_valid.txt"), ["a\tr2\tc", "a\tr1\tq"]
    )
    write(os.path.join(raw, "inf_test.txt"), ["x\tr2\tz"])

    class ToyMTDEA(kg.MTDEAInductive):
        name = "FBNELL"
        versions = ["FBNELL_v1"]

        def download(self):
            raise AssertionError("files exist")

    ds = ToyMTDEA(root, "FBNELL_v1").load()
    # dropped triple: only one valid target survives
    assert ds.valid.target_edge_index.shape[1] == 1
    # valid graph = train graph (valid_on_inf=False), vocab-sized num_nodes
    assert ds.valid.num_nodes == 3
    np.testing.assert_array_equal(ds.valid.edge_index, ds.train.edge_index)


def test_misparse_warning_on_relation_vocab_explosion(tmp_path, caplog):
    """Swapped columns (h t r written as h r t) mint one relation per
    entity token; process() must warn so the user catches the mis-parse
    before the 4*R^2 relation graph grinds the planner (round-4 incident:
    R=13924 -> 212M rel-graph edges, an hour of plan build)."""
    import logging

    root = str(tmp_path)
    raw = os.path.join(root, "swapped", "raw")
    rng = np.random.default_rng(0)
    # middle column carries 5000 distinct "tail" tokens -> relation vocab
    lines = [f"h{rng.integers(50)} t{i} r{rng.integers(3)}"
             for i in range(5000)]
    write(os.path.join(raw, "train.txt"), lines)
    write(os.path.join(raw, "valid.txt"), lines[:5])
    write(os.path.join(raw, "test.txt"), lines[5:10])

    class Swapped(kg.TransductiveDataset):
        name = "swapped"
        urls = ()

    with caplog.at_level(logging.WARNING, logger="ultra_tpu"):
        ds = Swapped(root).load()
    assert ds.train.num_relations == 2 * 5000
    assert any("check col_order" in r.message for r in caplog.records)


def test_synthetic_rule_kg_dataset(tmp_path):
    """SyntheticRuleKG: offline deterministic rule-KG through the standard
    TransductiveDataset path (raw files written by download(), vocab
    accumulation, inverse augmentation, caching), plus parameterized
    JointDataset members ({class: ..., kwargs})."""
    root = str(tmp_path)
    spec = dict(num_nodes=200, num_base_rel=6, num_comp_rel=3,
                num_base_triples=800, seed=5)
    ds = kg.SyntheticRuleKG(root, **spec).load()
    assert ds.train.num_relations == 2 * 9
    # valid/test targets are derived (composed) triples only
    assert ds.valid.target_edge_type.shape[0] > 0
    assert ds.test.target_edge_type.shape[0] > 0
    assert (ds.valid.target_edge_type >= 0).all()
    # deterministic: a second load (from cache) and a fresh regeneration
    # in a new root agree
    ds2 = kg.SyntheticRuleKG(root + "-b", **spec).load()
    np.testing.assert_array_equal(ds.train.edge_index, ds2.train.edge_index)
    np.testing.assert_array_equal(ds.test.target_edge_type,
                                  ds2.test.target_edge_type)

    joint = kg.JointDataset(root, [dict(spec, **{"class": "SyntheticRuleKG"})]).load()
    assert joint[0].name == ds.name
    np.testing.assert_array_equal(joint[0].train.edge_index, ds.train.edge_index)
