"""Unit tests for distributed BPE merge training (stages/bpe.py).
The full corpus SQL-parity check runs in test_queries_vs_duckdb via
the `bpe_merges` registry entry; these pin the pieces: the two-pass
padded-replace merge contract (incl. the adjacent-chain cases that
make one pass insufficient), argmax tie-breaks, the loud separator /
run-dry guards, bit-identity of the pure-Python trainer against the
unrolled-CTE SQL on an adversarial word table, and the Ray-side
word-type counting with the exact top-k cap."""

import duckdb
import pyarrow as pa
import pytest

from gocrd_ray.stages import bpe
from gocrd_ray.pipelines.queries import _bpe_encode_sql, _bpe_sql


def test_apply_merge_chains():
    # aaa: leftmost-first, odd leftover
    assert bpe.apply_merge("a\x1fa\x1fa", "a", "a") == "aa\x1fa"
    # aaaa: both pairs merge (second via pass two)
    assert bpe.apply_merge("a\x1fa\x1fa\x1fa", "a", "a") == "aa\x1faa"
    # documented variant: aaaaa -> aa, a, aa (pass one takes
    # occurrences 1 and 3 of the chain; classic strict-greedy would
    # give aa, aa, a)
    assert bpe.apply_merge("\x1f".join("aaaaa"), "a", "a") == "aa\x1fa\x1faa"
    # alternating chain ababab: all three merge
    assert (
        bpe.apply_merge("\x1f".join("ababab"), "a", "b") == "ab\x1fab\x1fab"
    )
    # r must not match a longer symbol's prefix (the trailing-SEP
    # pattern guarantees termination)
    assert bpe.apply_merge("x\x1fab", "x", "a") == "x\x1fab"
    # no-op when pair absent
    assert bpe.apply_merge("h\x1fi", "a", "b") == "h\x1fi"


def test_train_bpe_toy_and_tiebreak():
    wc = pa.table(
        {
            "word": ["hello", "hell", "lo"],
            "n": pa.array([5, 3, 6], pa.int64()),
        }
    )
    got = bpe.train_bpe(wc, n_merges=3)
    rows = list(
        zip(
            got.column("step").to_pylist(),
            got.column("left").to_pylist(),
            got.column("right").to_pylist(),
            got.column("pair_n").to_pylist(),
        )
    )
    # (l,o): 5+6=11; (h,e): 8; (e,l): 8; (l,l): 8 — then tie h<e<l... ties
    # resolve (count DESC, left ASC, right ASC): step2 = (e,l) 8.
    assert rows[0] == (1, "l", "o", 11)
    assert rows[1] == (2, "e", "l", 8)
    # after e+l: hello = h el l lo, hell = h el l → (h,el) 8 wins
    assert rows[2] == (3, "h", "el", 8)


def test_guards():
    with pytest.raises(ValueError, match="separator"):
        bpe.train_bpe(
            pa.table({"word": ["a\x1fb"], "n": pa.array([1], pa.int64())})
        )
    with pytest.raises(ValueError, match="ran dry"):
        bpe.train_bpe(
            pa.table({"word": ["a", "b"], "n": pa.array([2, 1], pa.int64())}),
            n_merges=1,
        )


def test_trainer_matches_unrolled_sql():
    """Bit-identity of train_bpe against the generated DuckDB mirror on
    an adversarial word table (overlap chains, multi-byte chars,
    count ties), driven through the same CTE generator the registry
    SQL uses — with the corpus base swapped for a literal table."""
    words = [
        ("hello", 5),
        ("hell", 3),
        ("aaaaa", 4),
        ("abababab", 2),
        ("héllo", 7),
        ("x", 9),
        ("lo", 6),
        ("ſoft", 2),  # long s, multi-byte
    ]
    k = 6
    ref = bpe.train_bpe(
        pa.table(
            {
                "word": [w for w, _ in words],
                "n": pa.array([n for _, n in words], pa.int64()),
            }
        ),
        n_merges=k,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(
            # one row per occurrence so count(*) rebuilds n exactly
            ",".join([f"('{w}')"] * n)
            for w, n in words
        )
        + ") v(text)"
    )
    got = con.execute(_bpe_sql(k, 50_000)).fetch_arrow_table()
    assert got.column("step").to_pylist() == ref.column("step").to_pylist()
    assert got.column("left").to_pylist() == ref.column("left").to_pylist()
    assert got.column("right").to_pylist() == ref.column("right").to_pylist()
    assert got.column("pair_n").to_pylist() == ref.column("pair_n").to_pylist()


def test_word_type_counts_cap(ray_session):
    import ray

    docs = pa.table(
        {"text": ["b b b a a c", "a c  ", None, "d d d d"]}
    )
    ds = ray.data.from_arrow(docs)
    out = pa.concat_tables(
        [p for p in ray.get(bpe.word_type_counts(ds, max_types=3).to_arrow_refs()) if p.num_rows]
    )
    # counts: d=4, a=3, b=3, c=2 → top-3 with (n DESC, word ASC): d,a,b
    assert out.column("word").to_pylist() == ["d", "a", "b"]
    assert out.column("n").to_pylist() == [4, 3, 3]


def test_frame_and_count_edges():
    texts = pa.array(
        ["ab c", "héllo  x", "", None, "  ", "a\tb", "a\nb c", "single"]
    )
    framed = bpe.frame_texts(texts)
    counts = bpe.token_counts_from_framed(framed).to_pylist()
    # ab c → 3 symbols; héllo x → 6; empty/null/spaces → 0;
    # tab/newline live INSIDE words (split is single-space only):
    # "a\tb" = one 3-symbol word; "a\nb c" = 3 + 1
    assert counts == [3, 6, 0, 0, 0, 3, 4, 6]


def test_encode_zero_and_full_merge():
    # merge (a,b) then (ab,ab): "ab ab abab" → a b|a b|a b a b →
    # after m1: ab|ab|ab ab → after m2: ab|ab|abab → 1+1+1 = 3 tokens
    merges = pa.table(
        {
            "step": pa.array([1, 2], pa.int64()),
            "left": ["a", "ab"],
            "right": ["b", "ab"],
            "pair_n": pa.array([0, 0], pa.int64()),
        }
    )
    framed = bpe.frame_texts(pa.array(["ab ab abab"]))
    x = framed
    import pyarrow.compute as pc

    for left, right in (("a", "b"), ("ab", "ab")):
        pat = bpe.SEP + left + bpe.SEP + right + bpe.SEP
        rep = bpe.SEP + left + right + bpe.SEP
        x = pc.replace_substring(x, pat, rep)
        x = pc.replace_substring(x, pat, rep)
    assert bpe.token_counts_from_framed(x).to_pylist() == [3]


def test_encode_matches_unrolled_sql(ray_session):
    """encode_token_counts (Ray streaming map, merges via closure) vs
    the shared-CTE DuckDB encode mirror on an adversarial doc table:
    multi-space runs, multi-byte chars, nulls, overlap chains."""
    import ray

    docs = [
        (0, "the the the cat"),
        (1, "aaaa aaa  aa"),
        (2, None),
        (3, ""),
        (4, "héllo ſoft the"),
        (5, "ab ab abab the cat"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    k = 4
    merges = bpe.bpe_merges(ray.data.from_arrow(tbl), n_merges=k)
    got = (
        bpe.encode_token_counts(ray.data.from_arrow(tbl), merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = (
        con.execute(_bpe_encode_sql(k, 50_000))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


def test_bpe_merges_end_to_end(ray_session):
    import ray

    docs = pa.table({"text": ["the the the cat", "the cat sat", ""]})
    got = bpe.bpe_merges(ray.data.from_arrow(docs), n_merges=2)
    rows = list(
        zip(
            got.column("step").to_pylist(),
            got.column("left").to_pylist(),
            got.column("right").to_pylist(),
            got.column("pair_n").to_pylist(),
        )
    )
    # tokens: the×4, cat×2, sat×1 → pairs: (h,e)4, (t,h)4, (a,t)3, (c,a)2, (s,a)1
    assert rows[0] == (1, "h", "e", 4)
    # after h+e: the = t he → (t,he) 4 wins over (a,t) 3
    assert rows[1] == (2, "t", "he", 4)
