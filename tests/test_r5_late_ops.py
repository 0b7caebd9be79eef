"""Late round-5 operators: bigram count table, temperature resampling,
anchor-text aggregation — stage-level edge cases beyond the DuckDB
parity gate."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import mix
from gocrd_ray.stages.boilerplate import extract_anchors_batch
from gocrd_ray.stages.text_stats import bigram_counts, bigram_counts_partial


def _naive_bigrams(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        if t is None:
            continue
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            c[f"{a} {b}"] += 1
    return dict(c)


def test_bigram_partial_matches_naive():
    texts = [
        "a b c a b", None, "", "x", "a a a a",
        "one two", "  leading", "trail  ", "a  b",  # empty tokens kept
    ]
    got = bigram_counts_partial(pa.table({"text": pa.array(texts)}))
    want = _naive_bigrams(texts)
    got_d = dict(zip(got.column("gram").to_pylist(), got.column("n").to_pylist()))
    assert got_d == want


def test_bigram_partial_sliced_batch():
    # a sliced table exercises non-zero array offsets through the
    # flatten/length index arithmetic
    t = pa.table({"text": pa.array(["pad pad", "a b c", "b c d"])}).slice(1)
    got = bigram_counts_partial(t)
    got_d = dict(zip(got.column("gram").to_pylist(), got.column("n").to_pylist()))
    assert got_d == {"a b": 1, "b c": 2, "c d": 1}


def test_bigram_counts_global_prune_after_sum(ray_session):
    import ray.data

    # 'q r' appears once per row across 6 rows: rare in every block,
    # clears min_count=4 only after the global sum
    rows = ["q r"] * 6 + ["s t"] * 2
    ds = ray.data.from_arrow(pa.table({"text": pa.array(rows)})).repartition(4)
    out = bigram_counts(ds, min_count=4).to_pandas()
    assert dict(zip(out["gram"], out["n"])) == {"q r": 6}


def test_temperature_sample_exact_counts_and_determinism(ray_session):
    import ray.data

    # 400 'en', 100 'de', 25 'fi' → k = floor(sqrt(n*25)) = 100, 50, 25
    ids = list(range(525))
    langs = ["en"] * 400 + ["de"] * 100 + ["fi"] * 25
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "lang": pa.array(langs)})
    ds = ray.data.from_arrow(tbl).repartition(7)
    out = mix.temperature_sample(ds).to_pandas()
    got = out.groupby("lang")["doc_id"].count().to_dict()
    assert got == {"en": 100, "de": 50, "fi": 25}

    # kept set = first k per lang in (md5_56(doc_id), doc_id) order
    def key(i):
        return (int(hashlib.md5(str(i).encode()).hexdigest()[:14], 16), i)

    for lang, k in (("en", 100), ("de", 50), ("fi", 25)):
        pool = [i for i, l in zip(ids, langs) if l == lang]
        want = set(sorted(pool, key=key)[:k])
        assert set(out[out["lang"] == lang]["doc_id"]) == want

    # partitioning-independent
    out2 = mix.temperature_sample(
        ray.data.from_arrow(tbl).repartition(2)
    ).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_temperature_sample_lang_cap(ray_session):
    import ray.data

    tbl = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "lang": pa.array([f"l{i}" for i in range(200)]),
    })
    with pytest.raises(ValueError, match="128"):
        mix.temperature_sample(ray.data.from_arrow(tbl))


def test_extract_anchors_strips_inner_markup():
    html = (
        b'<a href="/x"><b>Bold</b>\n  text</a>'
        b'<a class="c" href="/y" rel="nofollow">plain</a>'
        b'<a name="no-href">skipped</a>'
    )
    t = pa.table({"url": ["u"], "html": pa.array([html], pa.binary())})
    got = extract_anchors_batch(t)
    assert got.column("target").to_pylist() == ["/x", "/y"]
    assert got.column("anchor").to_pylist() == ["Bold text", "plain"]


def test_anchor_stats_majority_and_ties(ray_session):
    import ray.data

    from gocrd_ray.stages.boilerplate import anchor_stats

    def page(links):
        return "".join(f'<a href="{t}">{a}</a>' for t, a in links).encode()

    pages = pa.table({
        "url": ["p1", "p2", "p3"],
        "html": pa.array([
            page([("/t", "alpha"), ("/t", "beta")]),
            page([("/t", "beta"), ("/u", "gamma")]),
            page([("/t", "alpha")]),  # → /t sees alpha ×2, beta ×2
        ], pa.binary()),
    })
    out = anchor_stats(ray.data.from_arrow(pages)).to_pandas()
    row_t = out[out["target"] == "/t"].iloc[0]
    # alpha and beta both appear twice → tie broken ascending
    assert row_t["n_inlinks"] == 4
    assert row_t["n_anchors"] == 2
    assert row_t["top_anchor"] == "alpha"
    row_u = out[out["target"] == "/u"].iloc[0]
    assert (row_u["n_inlinks"], row_u["n_anchors"], row_u["top_anchor"]) == (
        1, 1, "gamma",
    )


def _ev(rows):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [base + datetime.timedelta(hours=r[1]) for r in rows],
            pa.timestamp("us"),
        ),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })


def test_event_funnel_strict_order(ray_session):
    import ray.data

    from gocrd_ray.stages.window import event_funnel

    rows = [
        # u1 completes all three in order
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        # u2: click BEFORE the first view — stops at step 1
        (2, 0, "click"), (2, 1, "view"),
        # u3: view+click, purchase exactly AT the click ts (strict >) — step 2
        (3, 0, "view"), (3, 1, "click"), (3, 1, "purchase"),
        # u4: never views — step 0
        (4, 0, "purchase"), (4, 1, "click"),
        # u5: two views; click after the FIRST view counts
        (5, 0, "view"), (5, 5, "view"), (5, 1, "click"), (5, 2, "purchase"),
    ]
    out = event_funnel(ray.data.from_arrow(_ev(rows)).repartition(3))
    d = {r["step_name"]: r["n_users"] for r in out.to_pylist()}
    assert d == {"view": 4, "click": 3, "purchase": 2}
    assert out.column("step").to_pylist() == [1, 2, 3]


def test_cohort_retention_distinct_weeks(ray_session):
    import ray.data

    from gocrd_ray.stages.window import WEEK_US, cohort_retention

    # u1 first event week W, active W and W+2 (twice in W+2 → counts once)
    # u2 first event week W+1, active W+1 only
    rows = [
        (1, 0, "view"), (1, 24, "view"),             # week 0 twice
        (1, 14 * 24, "view"), (1, 15 * 24, "view"),  # week 2 twice
        (2, 8 * 24, "view"),                          # week 1
    ]
    out = cohort_retention(
        ray.data.from_arrow(_ev(rows)).repartition(2)
    ).to_pandas()
    base_wk = _ev(rows).column("ts")[0].value // WEEK_US
    got = {
        (r.cohort_week - base_wk, r.week_offset): r.n_users
        for r in out.itertuples()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_fix_mojibake_rules():
    from gocrd_ray.stages.text_stats import fix_mojibake_batch

    orig = "hello café — naïve №"
    corrupted = orig.encode("utf-8").decode("latin-1")
    b = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            corrupted,             # repaired
            "plain ascii",         # untouched (fast path)
            "real latin-1: über",  # NOT valid utf-8 bytes → untouched
            None,                  # null passthrough
            corrupted + " über",   # mixed: invalid as a whole → untouched
        ]),
    })
    got = fix_mojibake_batch(b).column("text").to_pylist()
    assert got[0] == orig
    assert got[1] == "plain ascii"
    assert got[2] == "real latin-1: über"
    assert got[3] is None
    assert got[4] == corrupted + " über"
    # idempotent: a repaired block passes through unchanged
    again = fix_mojibake_batch(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([got[0]])})
    ).column("text").to_pylist()
    assert again == [orig]


def test_temperature_sample_drops_null_langs(ray_session):
    import ray.data

    # nulls must neither sample nor shift n_min (SQL JOIN semantics)
    tbl = pa.table({
        "doc_id": pa.array(range(120), pa.int64()),
        "lang": pa.array(
            ["en"] * 64 + ["de"] * 16 + [None] * 40, pa.string()
        ),
    })
    out = mix.temperature_sample(ray.data.from_arrow(tbl)).to_pandas()
    got = out.groupby("lang")["doc_id"].count().to_dict()
    # k_en = floor(sqrt(64*16)) = 32, k_de = 16; a null group of 40
    # treated as a language would have made n_min = 40 instead
    assert got == {"en": 32, "de": 16}
    assert out["lang"].notna().all()


def test_review_fix_loud_guards(ray_session):
    """Round-5 review fixes: each silently-wrong path now raises."""
    import datetime

    import ray.data

    from gocrd_ray.sources.jsonl import read_jsonl
    from gocrd_ray.sources.warc import write_warc
    from gocrd_ray.stages.join import interval_join_broadcast

    # mixed-compression shard list refuses up front
    with pytest.raises(ValueError, match="mixed"):
        read_jsonl(["/tmp/a.jsonl", "/tmp/b.jsonl.gz"])

    # null mandatory WARC header column names itself
    ds = ray.data.from_arrow(pa.table({
        "rec_id": pa.array(["<urn:a>", None]),
        "warc_ts": pa.array([datetime.datetime(2024, 1, 1)] * 2,
                            pa.timestamp("us")),
        "payload": pa.array([b"x", b"y"], pa.binary()),
    }))
    with pytest.raises(Exception, match="rec_id"):
        write_warc(ds, "/tmp/warc_null_guard_out")

    # interval-join column collision raises instead of overwriting
    left = ray.data.from_arrow(pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([5], pa.int64()),
    }))
    intervals = pa.table({
        "lo": pa.array([0], pa.int64()),
        "hi": pa.array([10], pa.int64()),
        "event_id": pa.array([99], pa.int64()),
    })
    with pytest.raises(ValueError, match="collision"):
        interval_join_broadcast(left, intervals, ts_col="ts")


def test_kmeans_overflow_guard_dim_aware():
    from gocrd_ray.stages.kmeans import _q_abs_max, _quantize

    # values the old 2^31 guard accepted but that overflow the int64
    # distance sum at dim 64 must now raise
    emb = pa.array([[1500.0] * 64, [-1500.0] * 64], pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="overflow guard"):
        _quantize(emb)
    # bound is exact at the boundary for representative dims
    for dim in (1, 64, 4096):
        qm = _q_abs_max(dim)
        assert dim * (2 * qm) ** 2 <= 2**63 - 1
        assert dim * (2 * (qm + 1)) ** 2 > 2**63 - 1
