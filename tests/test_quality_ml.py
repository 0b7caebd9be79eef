"""Unit tests for the round-5 quality-signal stages: unigram entropy
(text_stats.entropy_batch), the GPT-3-style NB quality classifier
(stages/nbq.py), and the CCNet per-language perplexity terciles
(stages/ccnet.py).  Full SQL parity runs in test_queries_vs_duckdb via
the token_entropy / nb_quality / ccnet_buckets registry entries; these
pin the pieces and the edge cases."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest

from gocrd_ray.stages import ccnet, nbq
from gocrd_ray.stages.lm import _fp_ln
from gocrd_ray.stages.text_stats import entropy_batch


def _fpln1(x: int) -> int:
    return math.floor(1e7 * math.log(x))


# ---------------------------------------------------------------- entropy

def test_entropy_identical_tokens_is_zero():
    b = pa.table({"doc_id": [1], "text": ["a a a a"]})
    out = entropy_batch(b)
    assert out.column("entropy_fp").to_pylist() == [
        4 * _fpln1(4) - 4 * _fpln1(4)
    ]
    assert out.column("entropy").to_pylist() == [0.0]
    assert out.column("n_types").to_pylist() == [1]


def test_entropy_hand_computed():
    # "x x y": n=3, counts {x:2, y:1}
    b = pa.table({"doc_id": [7], "text": ["x x y"]})
    out = entropy_batch(b)
    want = 3 * _fpln1(3) - (2 * _fpln1(2) + 1 * _fpln1(1))
    assert out.column("entropy_fp").to_pylist() == [want]
    assert out.column("n_tokens").to_pylist() == [3]
    assert out.column("n_types").to_pylist() == [2]


def test_entropy_null_and_empty_text():
    b = pa.table({"doc_id": [1, 2], "text": pa.array([None, ""])})
    out = entropy_batch(b)
    # both tokenize to [''] -> n=1, entropy 0
    assert out.column("n_tokens").to_pylist() == [1, 1]
    assert out.column("entropy_fp").to_pylist() == [0, 0]


def test_entropy_batch_layout_invariance():
    texts = ["a b c a", "z z", "q w e r t y", None, "m"]
    whole = entropy_batch(
        pa.table({"doc_id": list(range(5)), "text": pa.array(texts)})
    )
    parts = [
        entropy_batch(
            pa.table(
                {"doc_id": [i], "text": pa.array([texts[i]], pa.string())}
            )
        )
        for i in range(5)
    ]
    assert whole.to_pylist() == [p.to_pylist()[0] for p in parts]


# ---------------------------------------------------------------- nbq

def test_nb_model_terms_and_prior():
    pos = np.zeros(nbq.N_BUCKETS, np.int64)
    neg = np.zeros(nbq.N_BUCKETS, np.int64)
    pos[5] = 9
    neg[5] = 4
    term, prior = nbq.nb_model(pos, neg, n_pos_docs=3, n_neg_docs=12)
    norm = _fpln1(9 + nbq.N_BUCKETS) - _fpln1(4 + nbq.N_BUCKETS)
    assert term[5] == _fpln1(10) - _fpln1(5) - norm
    # empty bucket: ln(1)-ln(1)-norm
    assert term[0] == -norm
    assert prior == _fpln1(3) - _fpln1(12)


def test_nb_model_refuses_empty_class():
    z = np.zeros(nbq.N_BUCKETS, np.int64)
    with pytest.raises(ValueError):
        nbq.nb_model(z, z, n_pos_docs=0, n_neg_docs=5)


def test_pareto_keep_matches_reference_rule():
    """The pow-free comparison must agree with the textbook
    u^(-1/alpha)-1 Pareto draw wherever floats are comfortably away
    from the decision boundary."""
    rng = np.random.RandomState(0)
    score_fp = rng.randint(-5 * 10**8, 5 * 10**8, size=1000)
    n_tok = rng.randint(1, 200, size=1000).astype(np.int64)
    u = rng.uniform(1e-9, 1.0, size=1000)
    got = nbq._pareto_keep(score_fp, n_tok, u, 9)
    a = score_fp / (1e7 * n_tok)
    s = 0.5 + a / (2.0 * (1.0 + np.abs(a)))
    x = u ** (-1.0 / 9.0) - 1.0
    want = s > 1.0 - x
    margin = np.abs(u * (2.0 - s) ** 9 - 1.0) > 1e-9
    assert (got == want)[margin].all()


def test_pareto_keep_monotone_in_score():
    """Higher score must never flip keep->drop at fixed u."""
    n = np.full(50, 10, np.int64)
    u = np.full(50, 0.4)
    scores = np.linspace(-3e8, 3e8, 50).astype(np.int64)
    kept = nbq._pareto_keep(scores, n, u, 9)
    # once kept, stays kept as score rises
    first = np.argmax(kept) if kept.any() else len(kept)
    assert kept[first:].all()


def test_nb_quality_filter_end_to_end(ray_session):
    import ray.data

    pos_rows = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["good fine great", "good good fine"],
    })
    neg_rows = pa.table({
        "doc_id": pa.array([2, 3, 4], pa.int64()),
        "text": ["spam spam junk", "junk junk junk spam", "spam junk"],
    })
    everything = pa.concat_tables([pos_rows, neg_rows])
    out = nbq.nb_quality_filter(
        ray.data.from_arrow(everything),
        ray.data.from_arrow(pos_rows),
        ray.data.from_arrow(neg_rows),
    ).to_pandas().set_index("doc_id").sort_index()
    # curated-looking docs score higher than crawl-looking docs
    assert out.loc[0, "score_fp"] > out.loc[2, "score_fp"]
    assert out.loc[1, "score_fp"] > out.loc[3, "score_fp"]
    # score is an exact function of the model: recompute doc 0 by hand
    pos_vec = np.zeros(nbq.N_BUCKETS, np.int64)
    neg_vec = np.zeros(nbq.N_BUCKETS, np.int64)
    for t in "good fine great".split() + "good good fine".split():
        pos_vec[int(hashlib.md5(t.encode()).hexdigest()[:3], 16)] += 1
    for t in ("spam spam junk junk junk junk spam spam junk").split():
        neg_vec[int(hashlib.md5(t.encode()).hexdigest()[:3], 16)] += 1
    term, prior = nbq.nb_model(pos_vec, neg_vec, 2, 3)
    want0 = prior + sum(
        int(term[int(hashlib.md5(t.encode()).hexdigest()[:3], 16)])
        for t in "good fine great".split()
    )
    assert out.loc[0, "score_fp"] == want0


# ---------------------------------------------------------------- ccnet

def _docs_table(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
    })


def test_ccnet_terciles_and_tie_rule(ray_session):
    import ray.data

    # 9 docs, one lang; craft texts so ppl keys are distinct enough to
    # order deterministically; we only check the INVARIANTS (3/3/3
    # split by key order, cutoff tie rule)
    rows = [(i, f"w{i} " * (i + 2) + "common common", "xx")
            for i in range(9)]
    out = ccnet.ccnet_buckets(
        ray.data.from_arrow(_docs_table(rows))
    ).to_pandas().sort_values("ppl_key")
    buckets = out["bucket"].tolist()
    keys = out["ppl_key"].to_numpy()
    n = len(out)
    k1 = math.ceil((1.0 / 3.0) * n)
    k2 = math.ceil((2.0 / 3.0) * n)
    v1, v2 = keys[k1 - 1], keys[k2 - 1]
    want = [
        "head" if k <= v1 else ("middle" if k <= v2 else "tail")
        for k in keys
    ]
    assert buckets == want
    # equal keys share a bucket (cutoff rule, not NTILE)
    for k in np.unique(keys):
        assert len(set(out[out["ppl_key"] == k]["bucket"])) == 1


def test_ccnet_block_layout_invariance(ray_session):
    import ray.data

    rows = [(i, f"a b c d{i % 4} e", ["aa", "bb"][i % 2])
            for i in range(24)]
    t = _docs_table(rows)
    one = ccnet.ccnet_buckets(
        ray.data.from_arrow(t)
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    many = ccnet.ccnet_buckets(
        ray.data.from_arrow(t).repartition(7)
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert one.equals(many)


def test_ccnet_narrow_bins_still_exact(ray_session):
    """n_bins=2 forces the pass-C refinement on every boundary —
    result must match the wide-histogram (W==1) path."""
    import ray.data

    rows = [(i, "tok " * (i + 1) + f"u{i}", "zz") for i in range(12)]
    t = _docs_table(rows)
    wide = ccnet.ccnet_buckets(
        ray.data.from_arrow(t), n_bins=1 << 20
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    narrow = ccnet.ccnet_buckets(
        ray.data.from_arrow(t), n_bins=2
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert wide.equals(narrow)


def test_ccnet_boundary_cap_is_loud(ray_session, monkeypatch):
    import ray.data

    monkeypatch.setattr(ccnet, "_BOUNDARY_CAP", 2)
    rows = [(i, "tok " * (i + 1) + f"u{i}", "zz") for i in range(12)]
    with pytest.raises(RuntimeError, match="boundary bins exceed"):
        ccnet.ccnet_buckets(
            ray.data.from_arrow(_docs_table(rows)), n_bins=2
        ).materialize()


# ------------------------------------------------------- host_components

def test_host_components_five_decades(ray_session):
    """The deterministic edge projection keeps links inside each decade
    of hosts -> exactly five components, labeled by the decade min."""
    import ray.data

    from gocrd_ray.pipelines.queries import q_host_components

    # drive through the query over a temp docs table
    import pyarrow.parquet as pq
    import tempfile, os
    d = tempfile.mkdtemp()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(list(range(300)), pa.int64()),
            "text": pa.array(["x"] * 300),
        }),
        os.path.join(d, "documents.parquet"),
    )
    out = q_host_components(d).to_pandas()
    assert len(out) == 50
    comp = out.set_index("host")["component"].to_dict()
    for h in range(50):
        assert comp[f"h{h:02d}"] == f"h{(h // 10) * 10:02d}"
