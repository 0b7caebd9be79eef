"""Unit tests for corpus-frequency line-level boilerplate removal
(stages/linefreq.py).  The full SQL-parity check runs in
test_queries_vs_duckdb via the `line_dedup_clean` registry entry;
these pin the pieces: the 8-word line synthesis (byte-parity with the
oracle's RE2 rewrite), distinct-doc frequency counting (including
within-doc repeats), the sentinel that keeps fully-boilerplate docs in
the output, and byte-identical passthrough of untouched docs."""

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import linefreq


def _mk(words_rows):
    return pa.array([" ".join(w) for w in words_rows])


def test_doc_lines_eight_word_layout():
    texts = pa.array([" ".join(f"w{i}" for i in range(10)), "a b", ""])
    lb, flat, parents, pos, n_lines = linefreq._doc_lines(texts)
    assert flat.to_pylist() == [
        " ".join(f"w{i}" for i in range(8)), "w8 w9", "a b", ""
    ]
    assert parents.tolist() == [0, 0, 1, 2]
    assert pos.tolist() == [0, 1, 0, 0]
    assert n_lines.tolist() == [2, 1, 1]
    # null → '' (one empty line), matching SQL COALESCE
    _, flat2, _, _, nl2 = linefreq._doc_lines(
        pa.array([None], pa.string())
    )
    assert flat2.to_pylist() == [""] and nl2.tolist() == [1]


@pytest.mark.usefixtures("ray_session")
def test_frequent_line_hashes_distinct_doc_criterion():
    import hashlib

    import ray.data

    # "dup line" appears in docs 1 and 2 (plus TWICE in doc 1 — the
    # within-doc repeat must not inflate the distinct-doc count);
    # "solo line" appears twice but only inside doc 3.
    line = " ".join(["d"] * 8)
    solo = " ".join(["s"] * 8)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            line + " " + line + " tail",
            line + " x",
            solo + " " + solo + " y",
        ],
    }))
    got = [
        r["line_hash"]
        for r in linefreq.frequent_line_hashes(ds, min_docs=2).take_all()
    ]
    assert got == [hashlib.md5(line.encode()).hexdigest()]


@pytest.mark.usefixtures("ray_session")
def test_frequent_line_clean_end_to_end():
    import ray.data

    boiler = " ".join(["cookie"] * 8)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            boiler + " " + " ".join(f"a{i}" for i in range(8)),
            boiler + " " + " ".join(f"b{i}" for i in range(8)),
            boiler,            # fully boilerplate → must still appear
            " ".join(f"c{i}" for i in range(8)),  # untouched
        ],
    }))
    rows = {
        r["doc_id"]: r
        for r in linefreq.frequent_line_clean(ds, min_docs=2).take_all()
    }
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["clean_text"] == " ".join(f"a{i}" for i in range(8))
    assert rows[1]["n_removed"] == 1 and rows[1]["n_lines"] == 2
    assert rows[2]["clean_text"] == " ".join(f"b{i}" for i in range(8))
    # fully-boilerplate doc survives via the sentinel, empty text
    assert rows[3]["clean_text"] == "" and rows[3]["n_removed"] == 1
    # untouched doc passes through byte-identical (linebroken form)
    assert rows[4]["clean_text"] == " ".join(f"c{i}" for i in range(8))
    assert rows[4]["n_removed"] == 0


@pytest.mark.usefixtures("ray_session")
def test_frequent_line_clean_no_frequent_lines():
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["alpha beta", "gamma delta"],
    }))
    rows = sorted(
        linefreq.frequent_line_clean(ds, min_docs=2).take_all(),
        key=lambda r: r["doc_id"],
    )
    assert [r["clean_text"] for r in rows] == ["alpha beta", "gamma delta"]
    assert all(r["n_removed"] == 0 for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_frequent_line_clean_matches_bruteforce_random():
    """Property check: engine output equals a driver-side brute-force
    on a random corpus with planted boilerplate."""
    import ray.data

    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(30)]
    boiler = [" ".join(["x"] * 8), " ".join(["y"] * 8)]
    texts = []
    for d in range(40):
        words = list(rng.choice(vocab, size=int(rng.integers(0, 20))))
        if d % 3 == 0:
            words = boiler[0].split() + words
        if d % 5 == 0:
            words += boiler[1].split()
        texts.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(40)), "text": texts})
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
        for r in linefreq.frequent_line_clean(ds, min_docs=2).take_all()
    }

    # brute force
    def lines_of(t):
        w = t.split(" ")
        return [
            " ".join(w[i:i + 8]) for i in range(0, max(len(w), 1), 8)
        ]

    from collections import defaultdict
    docs_of = defaultdict(set)
    for d, t in enumerate(texts):
        for ln in lines_of(t):
            docs_of[ln].add(d)
    freq = {ln for ln, ds_ in docs_of.items() if len(ds_) >= 2}
    for d, t in enumerate(texts):
        ls = lines_of(t)
        kept = [ln for ln in ls if ln not in freq]
        assert got[d] == ("\n".join(kept), len(ls), len(ls) - len(kept)), d
