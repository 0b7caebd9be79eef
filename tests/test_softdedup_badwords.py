"""Round-5 additions: soft (weighted) exact dedup, C4 bad-word document
filter, domain-suffix blocklist — edge cases beyond the DuckDB parity
gate (which pins the sf0.01 end-to-end values)."""

import pyarrow as pa

from gocrd_ray.functions.scalars import domain_suffix_hits
from gocrd_ray.stages import dedup
from gocrd_ray.stages.quality import badwords_filter_batch


# -- soft_dedup_weights ------------------------------------------------------


def _weights(ray_session, tbl, **kw):
    import ray.data

    rows = dedup.soft_dedup_weights(ray.data.from_arrow(tbl), **kw).take_all()
    return {r["doc_id"]: (r["n_copies"], r["weight"]) for r in rows}


def test_soft_dedup_counts_and_weights(ray_session):
    tbl = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": ["x", "x", "x", "y", None, "z"],
        }
    )
    got = _weights(ray_session, tbl)
    # null text dropped (md5(NULL) matches nothing), triple gets 1/3
    assert got == {
        1: (3, 1.0 / 3.0),
        2: (3, 1.0 / 3.0),
        3: (3, 1.0 / 3.0),
        4: (1, 1.0),
        6: (1, 1.0),
    }


def test_soft_dedup_partition_invariant(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": list(range(300)),
            "text": [f"t{i % 37}" for i in range(300)],
        }
    )
    a = _weights(ray_session, tbl)
    b = {
        r["doc_id"]: (r["n_copies"], r["weight"])
        for r in dedup.soft_dedup_weights(
            ray.data.from_arrow(tbl).repartition(7)
        ).take_all()
    }
    assert a == b
    # 300 ids over 37 texts: 4 texts x 9 copies, 33 x 8 copies
    assert sorted(set(n for n, _ in a.values())) == [8, 9]


# -- badwords_filter ---------------------------------------------------------


def _bw(texts, badwords=("dup", "bad")):
    tbl = pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}
    )
    out = badwords_filter_batch(tbl, badwords=badwords)
    return out.column("doc_id").to_pylist()


def test_badwords_exact_token_matching():
    kept = _bw(
        [
            "clean text here",   # kept
            "a dup word",        # dropped: exact token
            "DUP shouts",        # dropped: lowercased first
            "dupe is fine",      # kept: substring never matches
            "edge dup",          # dropped: last token
            "dup",               # dropped: whole text
            "",                  # kept: splits to one "" token, no match
            None,                # dropped: null can't be certified clean
        ]
    )
    assert kept == [0, 3, 6]


def test_badwords_zero_hit_list_keeps_all():
    assert _bw(["a b", "c d"], badwords=("zzz",)) == [0, 1]


# -- domain_suffix_hits ------------------------------------------------------


def test_domain_suffix_semantics():
    hosts = pa.array(
        [
            "example.com",            # exact hit
            "a.example.com",          # subdomain hit
            "x.y.z.example.com",      # deep subdomain hit
            "notexample.com",         # NOT a hit (substring != suffix)
            "example.com.evil.net",   # NOT a hit (suffix means trailing)
            "other.net",              # clean
            None,                     # null -> not blocked
        ]
    )
    got = domain_suffix_hits(hosts, {"example.com"}).to_pylist()
    assert got == [True, True, True, False, False, False, False]


def test_domain_suffix_tld_entry_and_depth_cap():
    # depth adapts to the batch: a 9-label host strips all the way to
    # its TLD — deep nesting can NOT evade the blocklist
    hosts = pa.array(
        ["a.com", "com", "b.org", "a.b.c.d.e.f.g.com", "a.b.c.d.e.f.g.h.com"]
    )
    got = domain_suffix_hits(hosts, {"com"}).to_pylist()
    assert got == [True, True, False, True, True]
    # a cap that would truncate while strips remain raises instead of
    # silently letting deeper hosts pass
    import pytest

    with pytest.raises(ValueError, match="label strips"):
        domain_suffix_hits(hosts, {"com"}, max_labels=3)
