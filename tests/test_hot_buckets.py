"""Hot-bucket (mega-cluster) discipline for LSH pair emission — the r4
verdict's last scale-killer: a crawl cluster of d near-identical
boilerplate pages collides in every band, and full pairwise emission is
~bands·d²/2 candidate rows from ONE logical bucket. Runs above
``hot_run_cap`` must emit bounded star pairs (cluster-preserving) or
raise loudly, never OOM quietly."""

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import dedup


def _identical_docs(n: int, text: str = "the quick brown fox jumps over "
                                        "the lazy dog again and again"):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([text] * n),
            }
        )
    )


def test_mega_cluster_star_emission_is_linear(ray_session):
    """50k identical docs: candidate rows must be O(d) — bands·(d−1)
    star rows, NOT ~bands·d²/2 — and components must still be the one
    full cluster labeled by the min id."""
    n = 50_000
    docs = _identical_docs(n)
    cand = dedup.lsh_raw_band_pairs(docs, id_col="doc_id").materialize()
    n_rows = cand.count()
    # 16 bands (default) × (n−1) star pairs; pairwise would be ~2e10
    assert 0 < n_rows <= 16 * (n - 1)
    labels = dedup.connected_components_distributed(cand).take_all()
    assert len(labels) == n
    assert {r["cluster_id"] for r in labels} == {0}


def test_star_components_match_pairwise_components(ray_session):
    """Star emission above the cap must produce the SAME connected
    components as unbounded pairwise emission (the dedup contract) —
    compared directly at a size where pairwise is still tractable."""
    docs = _identical_docs(300)

    def comps(hot_mode, cap):
        pairs = dedup.lsh_candidate_pairs(
            docs, id_col="doc_id", hot_run_cap=cap, hot_mode=hot_mode
        )
        return sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dedup.connected_components_distributed(pairs).take_all()
        )

    star = comps("star", cap=50)
    pairwise = comps("pairwise", cap=50)
    assert star == pairwise and len(star) == 300


def test_star_below_cap_is_bit_identical_to_pairwise(ray_session):
    """Runs at or below the cap keep full pairwise emission, so the
    default star mode changes NOTHING on non-degenerate corpora."""
    import ray.data

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")

    def pairs(hot_mode):
        return sorted(
            (r["id_a"], r["id_b"], r["n_buckets"])
            for r in dedup.lsh_candidate_pairs(
                docs, hot_mode=hot_mode
            ).take_all()
        )

    assert pairs("star") == pairs("pairwise")


def test_hot_mode_error_raises_loudly(ray_session):
    """Pairs-list consumers (verified_jaccard_pairs' oracle contract)
    must FAIL above the cap, not silently return a star subset."""
    docs = _identical_docs(120)
    with pytest.raises(Exception, match="hot bucket"):
        dedup.lsh_candidate_pairs(
            docs, id_col="doc_id", hot_run_cap=16, hot_mode="error"
        ).materialize()


def test_simhash_star_emission_is_linear(ray_session):
    """The simhash prefix buckets follow the same rule: d identical
    docs emit O(d) hamming-0 pairs under star, same components."""
    docs = _identical_docs(3_000)
    pairs = dedup.simhash_candidate_pairs(
        docs, hot_run_cap=64, hot_mode="star"
    ).materialize()
    # ≤ (d−1) distinct star pairs (min id vs each other id), hamming 0
    rows = pairs.take_all()
    assert 0 < len(rows) <= 2_999
    assert all(r["hamming"] == 0 and r["id_a"] == 0 for r in rows)
    labels = dedup.connected_components_distributed(pairs).take_all()
    assert {r["cluster_id"] for r in labels} == {0}
    with pytest.raises(Exception, match="hot prefix bucket"):
        dedup.simhash_candidate_pairs(
            docs, hot_run_cap=64, hot_mode="error"
        ).materialize()


def test_saturation_guard_warns_on_saturated_lsh(ray_session):
    """verified_jaccard_pairs must WARN when the candidate table
    balloons past ``saturation_warn_factor`` rows per distinct id
    (saturated LSH), instead of silently filling the object store —
    and must stay silent on a healthy corpus."""
    import warnings

    import ray.data

    docs = _identical_docs(80)  # C(80,2)·32 bands ≈ 101k rows for 80 ids
    with pytest.warns(RuntimeWarning, match="SATURATED"):
        dedup.verified_jaccard_pairs(docs).materialize()

    healthy = ray.data.read_parquet(
        "/root/testdata/sf0.01/documents.parquet"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        dedup.verified_jaccard_pairs(healthy).materialize()


def test_cosine_lsh_hot_bucket_star_and_error(ray_session):
    """The hyperplane-LSH cosine path shares the discipline: identical
    embeddings above the cap → star pairs (verified sims still exact),
    error mode raises."""
    import ray.data

    from gocrd_ray.stages import similarity

    n = 400
    emb = [[1.0, 2.0, 3.0, 4.0]] * n
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(emb, pa.list_(pa.float32())),
            }
        )
    )
    star = similarity.cosine_neardup_pairs_lsh(
        ds, threshold=0.95, hot_run_cap=50, hot_mode="star"
    ).take_all()
    # one distinct star pair per member vs the min id, sim exactly 1
    assert 0 < len(star) <= n - 1
    assert all(r["id_a"] == 0 and r["sim"] == pytest.approx(1.0)
               for r in star)
    with pytest.raises(Exception, match="hot bucket"):
        similarity.cosine_neardup_pairs_lsh(
            ds, threshold=0.95, hot_run_cap=50, hot_mode="error"
        ).materialize()


def test_prefilter_stats_out_distinct_ids(ray_session):
    """bloom_id_prefilter must report the distinct-id count of the
    candidate table through ``stats_out`` on BOTH build paths — the
    saturation guard in verified_jaccard_pairs reuses it instead of
    paying a second pass over the candidates."""
    import ray.data

    cand = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 1, 2, 2, 2], pa.int64()),
                "id_b": pa.array([3, 3, 4, 4, 5], pa.int64()),
            }
        )
    )
    corpus = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(list(range(10)), pa.int64())})
    )

    # small path: exact unique-hash count — 5 distinct ids {1,2,3,4,5}
    stats: dict = {}
    kept = dedup.bloom_id_prefilter(
        corpus, cand, id_col="doc_id", stats_out=stats
    )
    assert stats["distinct_ids"] == 5
    ids = sorted(r["doc_id"] for r in kept.take_all())
    assert set(ids) >= {1, 2, 3, 4, 5}  # no false negatives

    # HLL path (forced via n_expected=None + big declared count is not
    # reachable without 1M rows; instead verify the small path is the
    # one taken and stats survive an empty candidate table)
    stats_empty: dict = {}
    empty = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
    )
    kept2 = dedup.bloom_id_prefilter(
        corpus, empty, id_col="doc_id", stats_out=stats_empty
    )
    assert stats_empty["distinct_ids"] == 0
    assert kept2.count() == 0  # nothing referenced -> nothing kept
