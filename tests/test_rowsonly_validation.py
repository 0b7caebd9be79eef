"""Behavioral validation for operators whose driver check is rows-only
(no faithful SQL form): each one still gets a correctness pin here."""

import pyarrow as pa

from gocrd_ray.stages import dedup, text_stats


def test_langid_predicts_obvious_languages():
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "the quick dog runs over the lazy dog the fast one",
                "und der die das ein über nur zur kann daher und der",
                "le chat est dans la maison pour que le chien un une des",
            ],
        }
    )
    out = text_stats.LangId()(batch)
    assert out.column("pred_lang").to_pylist() == ["en", "de", "fr"]
    assert all(s > 0 for s in out.column("score").to_pylist())


def test_langid_unknown_text_is_und():
    batch = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": ["zzz qqq xxx www"]}
    )
    assert text_stats.LangId()(batch).column("pred_lang").to_pylist() == ["und"]


def test_fingerprint_deterministic_and_sensitive():
    b1 = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta",
                "one completely different document with other words entirely",
            ],
        }
    )
    out1 = text_stats.fingerprint_batch(b1)
    out2 = text_stats.fingerprint_batch(b1)
    assert out1.equals(out2)
    r0, r1 = out1.to_pylist()
    assert r0["fp_set"] != r1["fp_set"]
    sel = r0["fp_set"].split(",")
    assert sel == sorted(set(sel)) and r0["n_fp"] == len(sel)
    # winnowing locality: a change in the last word only may leave the
    # selected minima — and hence the compact fingerprint — unchanged;
    # that is by design (Schleimer et al. 2003), not a defect.


def test_lsh_recall_vs_exact_jaccard(ray_session):
    """LSH candidates must cover most exact pairs with J >= 0.5
    (16 bands x 4 rows: P[catch | J=0.5] ≈ 1-(1-0.5^4)^16 ≈ 0.65;
    observed pairs in this corpus are mostly J > 0.8 where P > 0.999)."""
    import ray.data

    docs = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs).take_all()
    }
    cand = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(docs).take_all()
    }
    assert exact, "corpus must contain near-duplicate pairs"
    recall = len(exact & cand) / len(exact)
    assert recall >= 0.6, (recall, len(exact), len(cand))


def test_minhash_signature_estimates_jaccard():
    mh = dedup.MinHasher(num_perm=128)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    # exact 3-shingle jaccard
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    inter = len(sh(a) & sh(b))
    uni = len(sh(a) | sh(b))
    exact = inter / uni
    assert abs(est - exact) < 0.2, (est, exact)


def test_lsh_shard_decomposition(ray_session):
    """LSH sharded into independent sub-jobs must union to the full
    result — the job-level decomposition a 10^12-doc run relies on."""
    import ray.data

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    full = {
        (r["id_a"], r["id_b"]): r["n_buckets"]
        for r in dedup.lsh_candidate_pairs(docs).take_all()
    }
    sharded: dict = {}
    for s in range(3):
        for r in dedup.lsh_candidate_pairs(docs, shard=s, n_shards=3).take_all():
            k = (r["id_a"], r["id_b"])
            sharded[k] = sharded.get(k, 0) + r["n_buckets"]
    assert sharded == full and full  # same pairs, same total multiplicities


def test_verified_pairs_equal_exact_jaccard(ray_session):
    """The scale path (LSH candidates → co-partitioned exact-Jaccard
    verification) must reproduce the O(n²) oracle bit-for-bit on a
    corpus whose dups are high-J (recall ≈ 1 at r=2/bands=32)."""
    import ray.data

    docs = ray.data.read_parquet("/root/testdata/sf0.01/documents.parquet")
    exact = sorted(
        (r["id_a"], r["id_b"], r["inter"], r["uni"])
        for r in dedup.ngram_jaccard_pairs(docs).take_all()
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["inter"], r["uni"])
        for r in dedup.verified_jaccard_pairs(docs).take_all()
    )
    assert got == exact and exact
    # prefilter=False (ship-everything fallback) agrees too
    got_nofilter = sorted(
        (r["id_a"], r["id_b"], r["inter"], r["uni"])
        for r in dedup.verified_jaccard_pairs(docs, prefilter=False).take_all()
    )
    assert got_nofilter == exact


def test_connected_components_long_chain_converges(ray_session):
    """A 60-node path graph (diameter 59) must fully converge — the old
    25-iteration silent cap returned wrong labels for such chains — and
    an explicit too-small cap must raise, never return partial labels."""
    import pytest
    import ray.data

    n = 60
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(list(range(n - 1)), pa.int64()),
                "id_b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
    )
    out = dedup.connected_components(pairs)
    assert out.column("cluster_id").to_pylist() == [0] * n
    pairs2 = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(list(range(n - 1)), pa.int64()),
                "id_b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        dedup.connected_components(pairs2, max_iters=3)


def test_dedup_by_url_latest_tie_break_deterministic(ray_session):
    """Equal warc_ts ties must resolve to the same survivor on every
    run (smallest content digest), independent of shuffle order."""
    import datetime

    import ray.data

    ts = datetime.datetime(2026, 1, 1)
    tbl = pa.table(
        {
            "url": ["u"] * 3,
            "warc_ts": pa.array([ts] * 3, pa.timestamp("us")),
            "html": pa.array([b"ccc", b"aaa", b"bbb"], pa.binary()),
        }
    )
    import numpy as np
    import pandas as pd

    # the tiebreak contract is "smallest content digest" where the
    # digest is the engine's internal vectorized siphash (fixed pandas
    # key — stable across processes/runs); pin against that function
    contents = [b"ccc", b"aaa", b"bbb"]
    digs = pd.util.hash_array(np.asarray(contents, dtype=object))
    want = contents[int(np.argmin(digs))]
    for _ in range(3):
        out = dedup.dedup_by_url(
            ray.data.from_arrow(tbl), policy="latest"
        ).take_all()
        assert len(out) == 1 and out[0]["html"] == want


def test_neardup_lsh_equals_broadcast_form(ray_session):
    """The LSH-bucketed near-dup path (no corpus broadcast) must find
    the same pairs as the exhaustive broadcast form at a real near-dup
    threshold; sims must agree to float tolerance. Corpus = embeddings
    + exact duplicates (identical vectors always collide → recall 1)."""
    import pyarrow.compute as pc
    import ray.data

    from gocrd_ray.stages import similarity

    def load():
        ds = ray.data.read_parquet("/root/testdata/sf0.01/embeddings.parquet")

        def dup(b):
            sel = b.filter(pc.less(b.column("vec_id"), 15))
            return pa.concat_tables(
                [
                    b.select(["vec_id", "embedding"]),
                    pa.table(
                        {
                            "vec_id": pc.add(sel.column("vec_id"), 100000),
                            "embedding": sel.column("embedding"),
                        }
                    ),
                ]
            )

        return ds.map_batches(dup, batch_format="pyarrow")

    want = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.cosine_neardup_pairs(load(), threshold=0.95).take_all()
    }
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.cosine_neardup_pairs_lsh(load(), threshold=0.95).take_all()
    }
    assert len(want) >= 15
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_connected_components_distributed_equals_broadcast(ray_session):
    """The dataset-resident label-propagation loop must produce exactly
    the broadcast form's labels, including on a long chain (diameter 19)
    plus disjoint components, and raise (not truncate) on a tiny cap."""
    import pytest
    import ray.data

    def mk():
        edges = [(i, i + 1) for i in range(19)] + [(100, 101), (101, 103)]
        return ray.data.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([a for a, _ in edges], pa.int64()),
                    "id_b": pa.array([b for _, b in edges], pa.int64()),
                }
            )
        )

    want = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(mk()).to_pylist()
    }
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components_distributed(mk()).take_all()
    }
    assert got == want
    assert {c for _, c in got} == {0, 100}
    with pytest.raises(RuntimeError, match="no convergence"):
        dedup.connected_components_distributed(mk(), max_iters=2)


def test_keyed_state_distributed_feed_equals_driver_feed(ray_session):
    """consume_distributed (routing inside map_batches tasks) must land
    on exactly the same end state as the driver-side iter_batches feed."""
    import ray.data

    from gocrd_ray.state.keyed import KeyedStateIndex

    def mk():
        return ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([i % 7 for i in range(1000)], pa.int64()),
                    "v": pa.array(list(range(1000)), pa.int64()),
                }
            )
        ).repartition(8)

    a = KeyedStateIndex(n_shards=3).consume(mk(), "k", "v").snapshot()
    b = KeyedStateIndex(n_shards=3).consume_distributed(mk(), "k", "v").snapshot()
    assert a.equals(b)
    assert a.num_rows == 7


def test_lsh_merged_equals_single_job(ray_session):
    """The hierarchical shard-merge composition must reproduce the
    single-job LSH pair table exactly (pairs AND multiplicities)."""
    import ray.data

    def load():
        return ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")

    full = {
        (r["id_a"], r["id_b"]): r["n_buckets"]
        for r in dedup.lsh_candidate_pairs(load()).take_all()
    }
    merged = {
        (r["id_a"], r["id_b"]): r["n_buckets"]
        for r in dedup.lsh_candidate_pairs_merged(load(), n_shards=3).take_all()
    }
    assert merged == full and full


def test_dedup_by_url_and_cap_tolerate_null_keys(ray_session):
    """Poison-row principle (r2 advice): null url / host / html rows
    must not crash the vectorized lexsort paths — null urls group under
    "" with one deterministic winner, null cap-keys likewise."""
    import datetime

    import ray.data

    ts = datetime.datetime(2026, 1, 1)
    tbl = pa.table(
        {
            "url": pa.array(["a", None, None, "b"], pa.string()),
            "warc_ts": pa.array([ts] * 4, pa.timestamp("us")),
            "html": pa.array([b"x", b"y", None, b"z"], pa.binary()),
        }
    )
    for policy in ("first", "latest"):
        out = dedup.dedup_by_url(
            ray.data.from_arrow(tbl), policy=policy
        ).take_all()
        # "a", "b", and ONE winner for the two null-url rows
        assert len(out) == 3
        assert sorted(r["url"] for r in out if r["url"] is not None) == [
            "a",
            "b",
        ]

    capped = dedup.per_key_cap(
        ray.data.from_arrow(
            pa.table(
                {
                    "host": pa.array(["h", None, None, None], pa.string()),
                    "url": pa.array(["u1", "u2", None, "u4"], pa.string()),
                }
            )
        ),
        key="host",
        k=2,
    ).take_all()
    # host "h" keeps its 1 row; the three null-host rows cap to 2
    assert len(capped) == 3


# -- semantic dedup (SemDeDup) ----------------------------------------------


def _semdedup_input():
    import numpy as np

    rng = np.random.RandomState(7)
    # 3 well-separated anchor directions + exact/near duplicates of each
    anchors = np.eye(8)[:3]
    rows, ids = [], []
    i = 0
    for a in anchors:
        for _ in range(4):  # 4 near-identical copies per anchor
            v = a + rng.normal(scale=0.01, size=8)
            rows.append(v / np.linalg.norm(v))
            ids.append(i)
            i += 1
    for _ in range(6):  # 6 spread-out singletons
        v = rng.normal(size=8)
        rows.append(v / np.linalg.norm(v))
        ids.append(i)
        i += 1
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in rows],
                pa.list_(pa.float32()),
            ),
        }
    )


def test_semantic_dedup_collapses_near_duplicate_groups(ray_session):
    import ray
    from gocrd_ray.stages import similarity

    tbl = _semdedup_input()
    out = similarity.semantic_dedup(
        ray.data.from_arrow(tbl), threshold=0.9, n_clusters=4, seed=3
    ).to_pandas()
    assert len(out) == len(tbl)
    # each anchor's 4 copies (sim ≈ 0.999) collapse to ONE kept row
    for g, lo in enumerate(range(0, 12, 4)):
        kept = out[(out.vec_id >= lo) & (out.vec_id < lo + 4)].keep.sum()
        assert kept == 1, f"anchor group {g}: kept {kept} of 4 near-dups"
    # the dropped rows all carry the similarity that killed them
    assert (out[~out.keep].max_prior_sim > 0.9).all()


def test_semantic_dedup_keeps_distinct_vectors_and_is_deterministic(
    ray_session,
):
    import numpy as np
    import ray
    from gocrd_ray.stages import similarity

    # 12 mutually orthogonal-ish vectors: nothing to dedup
    tbl = pa.table(
        {
            "vec_id": pa.array(range(12), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in np.eye(12)],
                pa.list_(pa.float32()),
            ),
        }
    )
    runs = [
        similarity.semantic_dedup(
            ray.data.from_arrow(tbl), threshold=0.5, n_clusters=3, seed=5
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
        for _ in range(2)
    ]
    assert runs[0].keep.all()
    assert runs[0].equals(runs[1])


def test_semantic_dedup_drop_rule_matches_brute_force(ray_session):
    """Every drop decision must agree with an independent dense
    recomputation of the within-cluster ordered max-prior-similarity."""
    import numpy as np
    import ray
    from gocrd_ray.stages import similarity

    tbl = _semdedup_input()
    thr = 0.9
    out = (
        similarity.semantic_dedup(
            ray.data.from_arrow(tbl), threshold=thr, n_clusters=4, seed=3
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in tbl.to_pylist()
    }
    cents = similarity._fit_centroids(
        ray.data.from_arrow(tbl), n_buckets=4, seed=3
    )
    for cluster, grp in out.groupby("cluster"):
        ids = grp.vec_id.to_numpy()
        x = np.stack([emb[i] / np.linalg.norm(emb[i]) for i in ids])
        csim = (x @ cents.T)[:, int(cluster)]
        order = np.lexsort((ids, -csim))
        xo, ido = x[order], ids[order]
        sims = xo @ xo.T
        for pos in range(len(ido)):
            max_prior = sims[:pos, pos].max() if pos else -np.inf
            expect_keep = not (max_prior > thr)
            got = bool(grp[grp.vec_id == ido[pos]].keep.iloc[0])
            assert got == expect_keep, (cluster, ido[pos])
