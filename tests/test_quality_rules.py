"""Unit tests for the Gopher/C4 quality-rule stage (stages/quality.py).
SQL parity runs in test_queries_vs_duckdb via `gopher_rules` /
`c4_clean`."""

import pyarrow as pa

from gocrd_ray.stages import quality


def _run_gopher(rows, **kw):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(rows, pa.string()),
        }
    )
    return quality.gopher_rules_batch(t, **kw).to_pylist()


def test_gopher_word_count_and_mean_len():
    out = _run_gopher(
        ["one two three", "aa bb cc", "x " * 49 + "x"], min_words=3
    )
    assert out[0]["n_words"] == 3 and out[0]["r_words"]
    assert out[0]["sum_word_len"] == 11  # one+two+three
    # mean len 11/3 in [3,10] → pass; doc 1 mean 2 < 3 → fail
    assert out[0]["r_mean_len"] and not out[1]["r_mean_len"]
    # doc 2: 50 single-char words → mean 1 fails, words pass
    assert out[2]["r_words"] and not out[2]["r_mean_len"]


def test_gopher_bullet_and_ellipsis_lines():
    text = "- one bullet\n- two bullet\nplain line here..."
    (r,) = _run_gopher([text], min_words=1)
    assert r["n_lines"] == 3
    assert r["n_bullet_lines"] == 2
    assert r["n_ellipsis_lines"] == 1
    # 10·2 <= 9·3 → bullets pass; 10·1 <= 3·3 fails
    assert r["r_bullet"] and not r["r_ellipsis"]


def test_gopher_stopwords_distinct_not_total():
    # 'the' repeated 5× is ONE distinct stopword → fails min 2
    (a, b) = _run_gopher(
        ["the the the the the", "the quick a fox"], min_words=1
    )
    assert a["n_stopwords_distinct"] == 1 and not a["r_stopwords"]
    assert b["n_stopwords_distinct"] == 2 and b["r_stopwords"]


def test_gopher_alpha_and_symbols():
    (r,) = _run_gopher(["123 456 789 word ##"], min_words=1)
    assert r["n_alpha_words"] == 1
    assert not r["r_alpha"]  # 5·1 < 4·5
    assert r["n_symbols"] == 2


def test_gopher_null_text_is_scored_not_crashed():
    (r,) = _run_gopher([None], min_words=1)
    assert r["n_words"] == 1 and not r["keep"]


def test_c4_line_filter_rebuilds_text():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    "a good long sentence here.\nshort.\nno terminal punct "
                    "at all\nyet another fine long sentence!",
                    None,
                ],
                pa.string(),
            ),
        }
    )
    out = quality.c4_line_filter_batch(t, min_line_words=5).to_pylist()
    assert out[0]["n_lines"] == 4 and out[0]["n_kept"] == 2
    assert out[0]["text_clean"] == (
        "a good long sentence here.\nyet another fine long sentence!"
    )
    assert out[1]["text_clean"] == "" and out[1]["n_kept"] == 0
