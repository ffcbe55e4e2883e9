"""Native C++ relation-graph kernel: equivalence with the numpy join and the
live-mask path; skipped gracefully when no compiler is available."""

import numpy as np
import pytest

from ultra_tpu import native
from ultra_tpu.data.synthetic import random_kg_triples, with_inverses


def numpy_reference(edge_index, edge_type, v, r, live=None):
    """Direct O(E^2)-free set-based reference, independent of both impls."""
    ei, et = np.asarray(edge_index), np.asarray(edge_type)
    if live is not None:
        ei, et = ei[:, live], et[live]
    heads = {}
    tails = {}
    for (h, t), rel in zip(ei.T, et):
        heads.setdefault(h, set()).add(rel)
        tails.setdefault(t, set()).add(rel)

    mats = [set() for _ in range(4)]
    for n in set(list(heads) + list(tails)):
        hs = heads.get(n, set())
        ts = tails.get(n, set())
        mats[0] |= {(a, b) for a in hs for b in hs}
        mats[1] |= {(a, b) for a in ts for b in ts}
        mats[2] |= {(a, b) for a in hs for b in ts}
        mats[3] |= {(a, b) for a in ts for b in hs}
    out = set()
    for m, pairs in enumerate(mats):
        out |= {(a, b, m) for a, b in pairs}
    return out


@pytest.fixture(scope="module")
def graph_arrays():
    trip = random_kg_triples(60, 7, 250, seed=4)
    ei, et = with_inverses(trip, 7)
    return ei, et, 60, 14


def test_native_matches_reference(graph_arrays):
    ei, et, v, r = graph_arrays
    got = native.relgraph_build_native(ei, et, v, r)
    if got is None:
        pytest.skip("native library unavailable")
    rel_ei, rel_et = got
    got_set = set(zip(rel_ei[0], rel_ei[1], rel_et))
    assert got_set == numpy_reference(ei, et, v, r)


def test_native_matches_numpy_impl(graph_arrays):
    from ultra_tpu import tasks

    ei, et, v, r = graph_arrays
    got = native.relgraph_build_native(ei, et, v, r)
    if got is None:
        pytest.skip("native library unavailable")
    # force the numpy path by building with the fallback directly
    import ultra_tpu.native as nat

    saved = nat.relgraph_build_native
    try:
        nat.relgraph_build_native = lambda *a, **k: None
        np_ei, np_et = tasks.build_relation_graph_arrays(ei, et, v, r)
    finally:
        nat.relgraph_build_native = saved
    got_set = set(zip(got[0][0], got[0][1], got[1]))
    np_set = set(zip(np_ei[0], np_ei[1], np_et))
    assert got_set == np_set


def test_native_live_mask(graph_arrays):
    ei, et, v, r = graph_arrays
    rng = np.random.default_rng(0)
    live = rng.random(ei.shape[1]) > 0.3
    got = native.relgraph_build_native(ei, et, v, r, live=live)
    if got is None:
        pytest.skip("native library unavailable")
    got_set = set(zip(got[0][0], got[0][1], got[1]))
    assert got_set == numpy_reference(ei, et, v, r, live=live)
