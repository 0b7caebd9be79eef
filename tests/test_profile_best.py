"""best_per_host / table_profile — semantics pins (block invariance,
tie-breaks, the numeric-vs-lexicographic min/max merge, null
accounting).  DuckDB mirror equality runs in
test_queries_vs_duckdb.py via the registry entries."""

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from gocrd_ray.pipelines import queries


def _sf_dir(tbl: pa.Table) -> str:
    d = tempfile.mkdtemp(prefix="profile_sf_", dir="/tmp")
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


def _docs_table(ids, n_chars, lang=None, source=None):
    n = len(ids)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(lang or ["en"] * n, pa.string()),
        "source": pa.array(source or ["s"] * n, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })


def test_best_per_host_ties_to_lowest_doc_id(ray_session):
    # hosts are doc_id % 50: ids 3 and 53 share host 3 with equal
    # n_chars -> the lower doc_id wins
    sf = _sf_dir(_docs_table([3, 53, 7], [10, 10, 4]))
    out = queries.q_best_per_host(sf).to_pandas()
    got = {r.host: (r.doc_id, r.n_chars) for r in out.itertuples()}
    assert got == {"h03": (3, 10), "h07": (7, 4)}


def test_best_per_host_block_invariant(ray_session):
    ids = list(range(120))
    nch = [((i * 37) % 101) + 1 for i in ids]
    sf = _sf_dir(_docs_table(ids, nch))
    out = queries.q_best_per_host(sf).to_pandas()
    assert len(out) == 50
    # cross-block winner: every host's winner is the true argmax
    for r in out.itertuples():
        h = int(r.host[1:])
        cand = [(n, i) for i, n in zip(ids, nch) if i % 50 == h]
        best = max(cand, key=lambda t: (t[0], -t[1]))
        assert (r.n_chars, r.doc_id) == best


def test_table_profile_numeric_minmax_merges_numerically(ray_session):
    # regression: '95' > '499' lexicographically — the per-block
    # partial merge must compare integer columns as integers
    sf = _sf_dir(_docs_table([95, 499, 7], [95, 499, 7]))
    out = queries.q_table_profile(sf).to_pandas()
    prof = {r.col: r for r in out.itertuples()}
    assert prof["doc_id"].min_v == "7" and prof["doc_id"].max_v == "499"
    assert prof["n_chars"].min_v == "7" and prof["n_chars"].max_v == "499"


def test_table_profile_null_accounting(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["x"] * 4, pa.string()),
        "lang": pa.array(["en", None, "de", None], pa.string()),
        "source": pa.array(["s", "s", "s", "s"], pa.string()),
        "n_chars": pa.array([5, None, 7, 7], pa.int64()),
    })
    sf = _sf_dir(t)
    out = queries.q_table_profile(sf).to_pandas()
    prof = {r.col: r for r in out.itertuples()}
    # nulls counted, excluded from distinct and min/max (SQL contract)
    assert prof["lang"].n_null == 2 and prof["lang"].n_distinct == 2
    assert prof["lang"].min_v == "de" and prof["lang"].max_v == "en"
    assert prof["n_chars"].n_null == 1 and prof["n_chars"].n_distinct == 2
    assert prof["source"].n_null == 0 and prof["source"].n_distinct == 1
