"""Unit tests for the corpus-indexing stage (stages/index.py). The
SQL-parity checks run in test_queries_vs_duckdb via the
`inverted_index` / `tfidf_topterms` registry entries."""

import math

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import index


def _ds(rows):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def test_distinct_pairs_dedups_within_doc():
    t = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": pa.array(["a a b", "b c"], pa.string()),
        }
    )
    p = index._distinct_pairs(t, "text", "doc_id")
    pairs = sorted(zip(p.column("token").to_pylist(),
                       p.column("doc_id").to_pylist()))
    assert pairs == [("a", 7), ("b", 7), ("b", 8), ("c", 8)]


def test_inverted_index_postings_sorted_and_capped(ray_session):
    rows = ["a b", "b c", "c a b", None, ""]
    out = index.inverted_index(_ds(rows), max_df=2).to_pandas()
    got = {r.token: (r.df, r.postings) for r in out.itertuples()}
    # 'b' has df=3 > max_df=2 → dropped; null/"" rows yield token ''
    assert "b" not in got
    assert got["a"] == (2, "0,2")
    assert got["c"] == (2, "1,2")
    assert got[""] == (2, "3,4")


def test_inverted_index_cross_batch_dedup(ray_session):
    import ray

    # the same (token, doc_id) pair arriving from two different input
    # blocks must still appear once in the posting list
    t = pa.table(
        {
            "doc_id": pa.array([1, 1], pa.int64()),
            "text": pa.array(["x y", "x z"], pa.string()),
        }
    )
    out = index.inverted_index(
        ray.data.from_arrow(t).repartition(2)
    ).to_pandas()
    got = {r.token: r.postings for r in out.itertuples()}
    assert got["x"] == "1"


def test_tfidf_scores_hand_computed(ray_session):
    rows = ["cat cat dog", "dog fish"]
    out = (
        index.tfidf_topterms(_ds(rows), k=5)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    fp = lambda tf, df: math.floor(1e7 * (tf * math.log(2.0 / df)))
    d0 = out[out.doc_id == 0]
    # doc 0: cat tf=2 df=1 → 2·ln2 ; dog tf=1 df=2 → 0
    assert list(d0.token) == ["cat", "dog"]
    assert list(d0.score_fp) == [fp(2, 1), fp(1, 2)]
    assert list(d0["rank"]) == [1, 2]
    d1 = out[out.doc_id == 1]
    # doc 1: fish ln2 beats dog 0; tie impossible here
    assert list(d1.token) == ["fish", "dog"]


def test_tfidf_deterministic_tie_break(ray_session):
    # two terms with identical (tf, df) → identical score; rank must
    # break ties by token ascending
    rows = ["zebra apple", "noise"]
    out = (
        index.tfidf_topterms(_ds(rows), k=5)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
    )
    d0 = out[out.doc_id == 0]
    assert list(d0.token) == ["apple", "zebra"]
    assert d0.score_fp.iloc[0] == d0.score_fp.iloc[1]
