"""The synthetic BetaE generator round-trips through the real loader and
its answers agree with an independent boolean evaluation of the compiled
postfix programs (generator answers come from a set-based CSR evaluator;
the cross-check runs the executor's opcode semantics — two independent
implementations)."""

import numpy as np
import pytest

from ultra_tpu.data.synthetic_queries import DEFAULT_TYPES, write_betae_dataset
from ultra_tpu.query import datasets as qds
from ultra_tpu.query import ops


@pytest.fixture(scope="module")
def synth_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthq"))
    write_betae_dataset(
        root, name="synth-betae", num_nodes=300, num_direct_rel=8,
        num_triples=1600, queries_per_type=6, train_queries_per_type=8,
        seed=0,
    )

    class SynthBetae(qds.LogicalQueryDataset):
        name = "synth-betae"

    return SynthBetae(root).load()


def _boolean_eval(kind_row, op_row, ei, et, v):
    """Executor-opcode boolean stack machine (mirrors executor slots)."""
    stack = []
    for k, arg in zip(kind_row, op_row):
        if k == ops.K_OPERAND:
            m = np.zeros(v, dtype=bool)
            m[arg] = True
            stack.append(m)
        elif k == ops.K_PROJECTION:
            x = stack.pop()
            sel = x[ei[0]] & (et == arg)
            m = np.zeros(v, dtype=bool)
            m[ei[1][sel]] = True
            stack.append(m)
        elif k == ops.K_INTERSECTION:
            y, x = stack.pop(), stack.pop()
            stack.append(x & y)
        elif k == ops.K_UNION:
            y, x = stack.pop(), stack.pop()
            stack.append(x | y)
        elif k == ops.K_NEGATION:
            stack.append(~stack.pop())
        elif k == ops.K_STOP:
            break
    return stack[-1]


def test_loader_roundtrip_counts(synth_ds):
    ds = synth_ds
    assert ds.graphs[0].num_relations == 16
    assert ds.graphs[0].inverse_rel_plus_one
    # every requested eval type made it through the loader
    (tr_lo, tr_hi), (va_lo, va_hi), (te_lo, te_hi) = ds.split_ranges()
    assert te_hi - te_lo >= len(DEFAULT_TYPES)  # >=1 query per type


def test_answers_match_independent_boolean_machine(synth_ds):
    ds = synth_ds
    kind, operand = ops.decompose(ds.queries)
    g = ds.graphs[0]
    ei, et, v = np.asarray(g.edge_index), np.asarray(g.edge_type), g.num_nodes
    (_, _), (va_lo, va_hi), (te_lo, te_hi) = ds.split_ranges()
    checked = 0
    for i in list(range(va_lo, va_hi)) + list(range(te_lo, te_hi)):
        easy = set(np.asarray(ds.easy_answers[i]).tolist())
        hard = set(np.asarray(ds.hard_answers[i]).tolist())
        assert hard, "eval queries must have hard answers"
        assert not (easy & hard)
        mask = _boolean_eval(kind[i], operand[i], ei, et, v)
        got = set(np.nonzero(mask)[0].tolist())
        if i < te_lo:
            # valid easy answers are defined on exactly the train graph the
            # loader builds -> strict equality with the opcode machine
            assert got == easy
        else:
            # test easy answers use the train+valid graph (BetaE protocol);
            # on the train graph the machine must stay inside easy and
            # never reach a hard answer (negation-free types; negated
            # types can legally gain answers when edges are removed)
            t = ds.id2type[int(ds.types[i])]
            if "n" not in t:
                assert got <= easy
                assert not (got & hard)
        checked += 1
    assert checked >= 2 * len(DEFAULT_TYPES)


def test_train_answers_nonempty(synth_ds):
    ds = synth_ds
    (tr_lo, tr_hi), _, _ = ds.split_ranges()
    for i in range(tr_lo, tr_hi):
        assert len(ds.easy_answers[i]) >= 1
        assert len(ds.hard_answers[i]) == 0
