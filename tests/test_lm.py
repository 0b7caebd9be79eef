"""Unit tests for the bigram-LM perplexity stage (stages/lm.py). The
full SQL-parity check runs in test_queries_vs_duckdb via the
`lm_perplexity` registry entry; these pin the pieces: bigram/boundary
handling, the fixed-point exactness contract, hand-computed scores,
min_count pruning, and poison-row robustness."""

import math

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import lm


def test_bigram_keys_respect_doc_boundaries():
    _, flat, parents = lm._tokens(pa.array(["a b c", "d e"]))
    bg, w1, bparents = lm._bigram_keys(flat, parents)
    sep = lm.SEP
    assert bg.to_pylist() == [f"a{sep}b", f"b{sep}c", f"d{sep}e"]
    assert w1.to_pylist() == ["a", "b", "d"]
    assert bparents.tolist() == [0, 0, 1]


def test_bigram_keys_short_null_and_empty_docs():
    _, flat, parents = lm._tokens(pa.array(["solo", None, "", "x y"]))
    bg, w1, bparents = lm._bigram_keys(flat, parents)
    # null → "" → [''] single token; only "x y" yields a bigram
    assert bg.to_pylist() == [f"x{lm.SEP}y"]
    assert bparents.tolist() == [3]


def test_fp_ln_matches_duckdb_ln_bitwise():
    """The exactness contract: floor(1e7*ln(k)) must agree bit-for-bit
    with DuckDB's ln over every integer argument a count can take at
    test scale (same libm on both sides)."""
    import duckdb

    vals = np.arange(1, 50001, dtype=np.int64)
    ours = lm._fp_ln(vals)
    theirs = duckdb.connect().execute(
        "SELECT CAST(floor(1e7 * ln(i::DOUBLE)) AS BIGINT) "
        "FROM range(1, 50001) t(i) ORDER BY i"
    ).fetchnumpy()
    theirs = next(iter(theirs.values()))
    assert np.array_equal(ours, np.asarray(theirs, dtype=np.int64))


def _score_table(ray_session, rows, **kw):
    import ray

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )
    out = lm.perplexity_scores(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_hand_computed_scores(ray_session):
    # Make every doc the train slice (threshold 'ffffffff' keeps all).
    rows = ["a b a b", "a b"]
    out = _score_table(ray_session, rows, sample_hex="ffffffff")
    # train counts: uni a:3 b:3, V=2; bigrams: a|b:3, b|a:1
    fp = lambda x: math.floor(1e7 * math.log(x))
    t_ab = fp(3 + 1) - fp(3 + 2)  # c12=3, c1(a)=3
    t_ba = fp(1 + 1) - fp(3 + 2)  # c12=1, c1(b)=3
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "score_fp"] == 2 * t_ab + t_ba
    assert out.loc[1, "score_fp"] == t_ab
    assert out.loc[1, "avg_logprob"] == t_ab / (1e7 * 1)


def test_unseen_tokens_smoothed_not_crashing(ray_session):
    # md5("0") = cfcd…, md5("1") = c4ca… — threshold between them puts
    # ONLY doc 1 in the train slice, so doc 0 is entirely OOV and every
    # bigram falls back to ln(0 + 1) - ln(0 + V).
    rows = ["a b a b", "z q z"]
    out = _score_table(ray_session, rows, sample_hex="c8000000")
    fp = lambda x: math.floor(1e7 * math.log(x))
    # train = doc 1 only: uni z:2 q:1 → V=2; bigrams z|q:1, q|z:1
    t_unseen = fp(0 + 1) - fp(0 + 2)  # = -fp(2)
    assert out.loc[0, "n_bigrams"] == 3
    assert out.loc[0, "score_fp"] == 3 * t_unseen
    t_zq = fp(1 + 1) - fp(2 + 2)
    t_qz = fp(1 + 1) - fp(1 + 2)
    assert out.loc[1, "score_fp"] == t_zq + t_qz


def test_min_count_prunes_model_but_not_vocab_size(ray_session):
    import ray

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a a a b", "a a"], pa.string()),
            }
        )
    )
    _, model = lm.train_bigram_lm(ds, sample_hex="ffffffff", min_count=3)
    # 'b' (count 1) pruned from the model, but V stays 2 (pre-pruning)
    assert model["V"] == 2
    assert list(model["uni_idx"]) == ["a"]
    assert all(c >= 3 for c in model["big_n"]) or len(model["big_n"]) == 0


def test_empty_and_null_docs_score_zero(ray_session):
    out = _score_table(ray_session, ["", None, "one"], sample_hex="ffffffff")
    assert out["n_bigrams"].tolist() == [0, 0, 0]
    assert out["score_fp"].tolist() == [0, 0, 0]
    assert out["avg_logprob"].tolist() == [0.0, 0.0, 0.0]


def test_empty_training_vocabulary_raises_descriptive(ray_session):
    """An empty hash-sampled training slice must fail at TRAIN time
    with a clear message — not as a math-domain error inside every
    scoring batch (V=0 -> ln(0))."""
    import pytest
    import ray.data

    from gocrd_ray.stages import lm

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["alpha beta", "gamma"], pa.string()),
            }
        )
    )
    # sample_hex="00000000" admits (almost) nothing into the slice
    with pytest.raises(ValueError, match="empty vocabulary"):
        lm.train_bigram_lm(ds, sample_hex="00000000")
