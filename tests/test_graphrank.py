"""Unit tests for the link-graph centrality stage
(stages/graphrank.py).  The full SQL-parity check runs in
test_queries_vs_duckdb via the `host_pagerank` registry entry; these
pin the pieces: the exact fixed-point arithmetic on a hand-computed
graph, multigraph out-degree semantics, dangling-node handling, the
pair-table collapse, empty input, and the max_nodes guard."""

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import graphrank

SCALE = graphrank.SCALE


def _edges_ds(pairs):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.string()),
        "dst": pa.array([p[1] for p in pairs], pa.string()),
    }))


# A→B twice (multi-edge), A→C, B→C; C dangling (no outlinks)
GRAPH = [("A", "B"), ("A", "B"), ("A", "C"), ("B", "C")]


@pytest.mark.usefixtures("ray_session")
def test_collapse_edges_multigraph_counts():
    p = {
        (r["src"], r["dst"]): r["cnt"]
        for r in graphrank.collapse_edges(_edges_ds(GRAPH)).take_all()
    }
    assert p == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}


@pytest.mark.usefixtures("ray_session")
def test_pagerank_one_iteration_hand_computed():
    out = {
        r["node"]: r
        for r in graphrank.pagerank(_edges_ds(GRAPH), n_iter=1).take_all()
    }
    n = 3
    r0 = SCALE // n
    base = (15 * r0) // 100
    # outdeg: A=3 (multi-edge counts), B=1; contribs are floor-divs
    c_a, c_b = r0 // 3, r0 // 1
    assert out["A"]["rank_fp"] == base  # no inbound edges
    assert out["B"]["rank_fp"] == base + (85 * (2 * c_a)) // 100
    assert out["C"]["rank_fp"] == base + (85 * (c_a + c_b)) // 100
    assert out["C"]["rank"] == out["C"]["rank_fp"] / float(SCALE)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_three_iterations_vs_numpy_reference():
    """Independent driver-side reference of the exact recurrence."""
    out = {
        r["node"]: r["rank_fp"]
        for r in graphrank.pagerank(_edges_ds(GRAPH), n_iter=3).take_all()
    }
    nodes = ["A", "B", "C"]
    cnt = {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}
    outdeg = {"A": 3, "B": 1, "C": 0}
    r = {v: SCALE // 3 for v in nodes}
    base = (15 * (SCALE // 3)) // 100
    for _ in range(3):
        agg = {v: 0 for v in nodes}
        for (u, v), c in cnt.items():
            agg[v] += c * (r[u] // outdeg[u])
        r = {v: base + (85 * agg[v]) // 100 for v in nodes}
    assert out == r
    # dangling C's mass leaks (simple variant): total strictly < SCALE
    assert sum(out.values()) < SCALE


@pytest.mark.usefixtures("ray_session")
def test_pagerank_empty_edges():
    ds = graphrank.pagerank(_edges_ds([]), n_iter=2)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"node", "rank_fp", "rank"}


@pytest.mark.usefixtures("ray_session")
def test_pagerank_max_nodes_guard():
    with pytest.raises(ValueError, match="max_nodes"):
        graphrank.pagerank(_edges_ds(GRAPH), max_nodes=2)


@pytest.mark.usefixtures("ray_session")
def test_small_and_distributed_paths_bit_identical():
    """small_p_cap=0 forces the distributed iteration; the default
    takes the driver fast path — outputs must match to the bit."""
    rng = np.random.default_rng(7)
    pairs = [(f"n{int(a):02d}", f"n{int(b):02d}")
             for a, b in rng.integers(0, 20, size=(300, 2))]
    fast = {r["node"]: r["rank_fp"]
            for r in graphrank.pagerank(_edges_ds(pairs)).take_all()}
    dist = {r["node"]: r["rank_fp"]
            for r in graphrank.pagerank(
                _edges_ds(pairs), small_p_cap=0).take_all()}
    assert fast == dist and len(fast) == 20


@pytest.mark.usefixtures("ray_session")
def test_pagerank_rank_mass_conserved_without_dangling():
    """On a graph where every node has outlinks, the damped mass is
    conserved up to floor-division dust: sum ≈ SCALE."""
    cycle = [("A", "B"), ("B", "C"), ("C", "A")]
    out = graphrank.pagerank(_edges_ds(cycle), n_iter=4).take_all()
    total = sum(r["rank_fp"] for r in out)
    assert SCALE - 100 <= total <= SCALE
    # symmetric cycle → identical ranks
    assert len({r["rank_fp"] for r in out}) == 1
