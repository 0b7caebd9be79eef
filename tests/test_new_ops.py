"""Round-2 operator additions: URL kit, hash sampling, paragraph dedup,
preceding-window range join — edge cases beyond the DuckDB parity gate."""

import datetime

import pyarrow as pa

from gocrd_ray.functions.scalars import canonicalize_urls, url_parts
from gocrd_ray.stages import dedup, window


def test_canonicalize_urls_rules():
    raw = pa.array(
        [
            "HTTPS://EXAMPLE.COM:443/A/b?z=1&a=2#frag",   # default port+sort+frag
            "http://Host.COM:8080/x",                     # non-default port kept
            "https://h.com",                              # empty path -> /
            "ftp://F.NET:21/file",                        # ftp default port
            "not a url",                                  # passthrough
            None,                                          # null passthrough
            "https://ok.com/p?single=1",
        ],
        pa.string(),
    )
    got = canonicalize_urls(raw).to_pylist()
    assert got == [
        "https://example.com/A/b?a=2&z=1",
        "http://host.com:8080/x",
        "https://h.com/",
        "ftp://f.net/file",
        "not a url",
        None,
        "https://ok.com/p?single=1",
    ]


def test_url_parts_fields():
    p = url_parts(pa.array(["https://h.com:81/p/q?x=1#f"])).to_pylist()[0]
    assert p == {
        "scheme": "https", "host": "h.com", "port": "81",
        "path": "/p/q", "query": "x=1", "fragment": "f",
    }


def test_hash_sample_deterministic_and_partition_free(ray_session):
    import ray.data

    tbl = pa.table({"url": [f"u{i}" for i in range(2000)]})
    a = set(
        r["url"]
        for r in dedup.hash_sample(ray.data.from_arrow(tbl)).take_all()
    )
    b = set(
        r["url"]
        for r in dedup.hash_sample(
            ray.data.from_arrow(tbl).repartition(7)
        ).take_all()
    )
    assert a == b and 0 < len(a) < 2000
    # ~16% expected at threshold 0x28f5c28f
    assert 0.10 < len(a) / 2000 < 0.22


def test_paragraph_dedup_counts(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "url": ["b", "a", "c"],
            "text": ["common\nuniq1", "common\nuniq2", "common\n\nuniq3"],
        }
    )
    out = {
        r["para_hash"]: (r["n_occurrences"], r["first_url"])
        for r in dedup.paragraph_dedup(ray.data.from_arrow(tbl)).take_all()
    }
    import hashlib

    h = hashlib.md5(b"common").hexdigest()
    assert out[h] == (3, "a")  # min url wins; empty paragraph dropped
    assert len(out) == 4


def test_preceding_window_count_boundaries(ray_session):
    import ray.data

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1: purchase at 12:30; clicks at 12:00 (excluded: == ts-30m),
        # 12:00:00.000001.. inside, 12:30 (included: == ts), 12:31 (after)
        (1, t0 + 30 * m, "purchase"),
        (2, t0, "click"),
        (3, t0 + m, "click"),
        (4, t0 + 30 * m, "click"),
        (5, t0 + 31 * m, "click"),
        # other user's clicks never count
        (6, t0 + 29 * m, "click"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
            "event_type": [r[2] for r in rows],
        }
    )
    out = window.preceding_window_count(ray.data.from_arrow(tbl)).take_all()
    assert len(out) == 1
    assert out[0]["event_id"] == 1 and out[0]["n_preceding"] == 2


def test_pack_chunks_invariants(ray_session):
    """Packing invariants: token_start strictly follows doc_id order,
    chunks tile the stream, and results are partition-invariant."""
    import ray.data

    from gocrd_ray.stages.text_stats import pack_chunks

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(200)), pa.int64()),
            "text": [" ".join(["w"] * (1 + i % 37)) for i in range(200)],
        }
    )

    def run(parts):
        return sorted(
            pack_chunks(
                ray.data.from_arrow(tbl).repartition(parts),
                chunk_tokens=64, range_bucket=16,
            ).take_all(),
            key=lambda r: r["doc_id"],
        )

    a = run(3)
    assert run(9) == a  # partition-invariant
    pos = 0
    for r in a:
        assert r["token_start"] == pos
        assert r["start_chunk"] == pos // 64
        end = pos + r["n_tokens"]
        assert r["end_chunk"] == (end - 1) // 64
        pos = end


def test_hash_split_stable_and_complete(ray_session):
    import ray.data

    from gocrd_ray.stages.dedup import hash_split

    tbl = pa.table({"url": [f"u{i}" for i in range(3000)]})
    out = hash_split(ray.data.from_arrow(tbl)).take_all()
    splits = {}
    for r in out:
        splits.setdefault(r["split"], set()).add(r["url"])
    assert set(splits) == {"train", "val", "test"}
    assert sum(len(v) for v in splits.values()) == 3000
    # ≈90/5/5 and growth-stable: a key's split never depends on others
    assert len(splits["train"]) / 3000 > 0.85
    sub = hash_split(
        ray.data.from_arrow(pa.table({"url": [f"u{i}" for i in range(100)]}))
    ).take_all()
    for r in sub:
        assert r["url"] in splits[r["split"]]


def test_per_key_cap_partition_invariant(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "host": [f"h{i % 3}" for i in range(300)],
            "url": [f"u{i}" for i in range(300)],
        }
    )

    def run(parts):
        return sorted(
            (r["host"], r["url"])
            for r in dedup.per_key_cap(
                ray.data.from_arrow(tbl).repartition(parts), key="host", k=4
            ).take_all()
        )

    a = run(2)
    assert run(11) == a
    from collections import Counter

    assert Counter(h for h, _ in a) == {"h0": 4, "h1": 4, "h2": 4}
    # winners = globally smallest digests per host
    import hashlib

    for h in ("h0", "h1", "h2"):
        urls = [f"u{i}" for i in range(300) if f"h{i % 3}" == h]
        want = sorted(urls, key=lambda u: hashlib.md5(u.encode()).hexdigest())[:4]
        assert sorted(u for hh, u in a if hh == h) == sorted(want)


def test_stratified_sample_partition_invariant_and_nulls(ray_session):
    import hashlib

    import ray.data

    tbl = pa.table(
        {
            "lang": [None if i == 7 else f"l{i % 4}" for i in range(400)],
            "url": [None if i == 13 else f"u{i}" for i in range(400)],
        }
    )

    def run(parts):
        return sorted(
            (r["lang"], r["url"])
            for r in dedup.stratified_sample(
                ray.data.from_arrow(tbl).repartition(parts),
                strata_col="lang", key_col="url", k=5,
            ).take_all()
        )

    a = run(1)
    assert run(13) == a  # partitioning must not change the draw
    from collections import Counter

    assert Counter(l for l, _ in a) == {f"l{j}": 5 for j in range(4)}
    # winners = globally smallest md5 digests per stratum (null rows out)
    for j in range(4):
        urls = [
            f"u{i}" for i in range(400)
            if i not in (7, 13) and i % 4 == j
        ]
        want = sorted(
            urls, key=lambda u: (hashlib.md5(u.encode()).hexdigest(), u)
        )[:5]
        assert sorted(u for l, u in a if l == f"l{j}") == sorted(want)


def test_chunk_stride_overlap_and_edges(ray_session):
    import ray.data

    from gocrd_ray.stages import text_stats

    tbl = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a" * 450, "äöü" * 10, "", None],  # 450, 30, 0, null
        }
    )
    out = text_stats.chunk_stride(
        ray.data.from_arrow(tbl), size=200, stride=150
    ).take_all()
    rows = sorted((r["doc_id"], r["chunk_id"], r["chunk_text"]) for r in out)
    # doc 0: ceil(450/150)=3 chunks at starts 0/150/300 with sizes 200/200/150
    d0 = [r for r in rows if r[0] == 0]
    assert [len(t) for _, _, t in d0] == [200, 200, 150]
    assert [c for _, c, _ in d0] == [0, 1, 2]
    # overlap: chars 150..200 of chunk0 == first 50 of chunk1
    assert d0[0][2][150:200] == d0[1][2][:50]
    # doc 1: 30 chars (multi-byte) -> one chunk, character-sliced
    d1 = [r for r in rows if r[0] == 1]
    assert d1 == [(1, 0, "äöü" * 10)]
    # empty and null texts produce nothing
    assert not [r for r in rows if r[0] in (2, 3)]


def test_chunk_stride_reconstructs_text(ray_session):
    """Property: chunk0 + chunk1[size-stride:] + chunk2[size-stride:]...
    reproduces the original text exactly (overlap = size - stride), for
    random lengths incl. boundary cases around multiples of stride."""
    import numpy as np
    import ray.data

    from gocrd_ray.stages import text_stats

    rng = np.random.default_rng(3)
    size, stride = 120, 90
    texts = []
    for i in range(200):
        # hit exact-boundary lengths often: 0/±1 around k*stride, k*size
        base = int(rng.choice([0, 1, 89, 90, 91, 119, 120, 121,
                               179, 180, 181, 300, 5000]))
        texts.append(
            "".join(chr(0x3b1 + int(c)) for c in rng.integers(0, 24, base))
        )
    tbl = pa.table({"doc_id": list(range(200)), "text": texts})
    out = text_stats.chunk_stride(
        ray.data.from_arrow(tbl).repartition(5), size=size, stride=stride
    ).take_all()
    chunks: dict = {}
    for r in out:
        chunks.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    for i, tx in enumerate(texts):
        got = chunks.get(i, {})
        if not tx:
            assert got == {}
            continue
        assert sorted(got) == list(range(len(got)))  # contiguous ids
        rebuilt = got[0]
        for ci in range(1, len(got)):
            rebuilt += got[ci][size - stride:] if len(got[ci]) > size - stride else ""
        assert rebuilt == tx, i


def test_dedup_incremental_tolerates_null_text(ray_session, tmp_path):
    """A null text row must neither crash a batch nor survive (SQL's
    md5(NULL) NOT IN (...) is NULL -> dropped)."""
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    tbl = pa.table(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "text": ["same", "same", None, "only-new", None, "only-old"],
            "lang": ["en"] * 6,
            "n_chars": [4, 4, None, 8, None, 8],
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "documents.parquet")
    out = e.queries()["dedup_incremental"](str(sf)).take_all()
    kept = sorted(r["doc_id"] for r in out)
    # odd docs: 1 ("same" = archived doc 0 -> dropped), 3 (kept),
    # 5 ("only-old" text but doc 5 is NEW; not in archive -> kept);
    # null-text docs never crash and never survive
    assert kept == [3, 5]

    # the ORACLE must agree on this null-bearing corpus too: without
    # `text IS NOT NULL` in the archive subquery, md5(NULL) enters the
    # NOT IN set and the oracle collapses to 0 rows (r3 advice)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf / 'documents.parquet'}')"
    )
    oracle = sorted(
        r[0] for r in con.execute(e.oracle_sql()["dedup_incremental"]).fetchall()
    )
    assert oracle == kept


def test_bucket_of_vectorized_contract():
    """Hash-join bucketing: equal decimal/string key forms must land in
    the same bucket regardless of integer width or chunking; nulls are
    deterministic. (Vectorized hash_array path — no per-row Python.)"""
    import pyarrow as pa

    from gocrd_ray.stages.join import _bucket_of

    i32 = pa.chunked_array(
        [pa.array([1, 2], pa.int32()), pa.array([None], pa.int32())]
    )
    i64 = pa.array([2, 4, 1], pa.int64())
    s = pa.array(["1", "2", None])
    b32, b64, bs = (_bucket_of(c, 32) for c in (i32, i64, s))
    assert b32[1] == b64[0] and b32[0] == b64[2]  # width-independent
    assert bs[0] == b32[0] and bs[1] == b32[1]    # string form matches
    assert bs[2] == b32[2]                        # nulls deterministic
    # two calls agree (fixed hash key, no per-process seed)
    assert _bucket_of(i64, 32).to_pylist() == b64.to_pylist()
