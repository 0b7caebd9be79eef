"""Flattened views + Match filters must agree with the oracle."""

import pyarrow as pa
import pytest

from gocrd_ray import extract, oracle, pagegen
from gocrd_ray.stages import explode, match


def _views(html_rows):
    tbl = pa.table(
        {
            "url": pa.array([u for u, _ in html_rows], pa.string()),
            "html": pa.array([h for _, h in html_rows], pa.binary()),
        }
    )
    full = extract.extract_batch(tbl, mode="full")
    return {
        "region": explode.explode_regions(full),
        "line": explode.explode_lines(full),
        "word": explode.explode_words(full),
    }


@pytest.fixture(scope="module")
def kant_views(kant_bytes):
    return _views([("kant", kant_bytes)])


FIXTURE_MATCHES = [
    # from page_test.go:150-191 (presence + resolved id)
    oracle.Match(),
    oracle.Match(region_id="r_1_1"),
    oracle.Match(region_id="r_1_2"),  # not in reading order → absent
    oracle.Match(region_id="r_2_1", line_id="tl_2"),
    oracle.Match(region_id="r_1_1", line_id="tl_2"),  # containment violation
    oracle.Match(line_id="tl_2"),
    oracle.Match(word_id="w_w1aab1b3b2b1b1ab1"),
    oracle.Match(region_id="r_2_1", line_id="tl_2", word_id="w_w1aab1b3b2b1b1ab1"),
    oracle.Match(region_id="r_1_1", line_id="tl_2", word_id="w_w1aab1b3b2b1b1ab1"),
    oracle.Match(region_id="bogus"),
    oracle.Match(line_id="bogus"),
    oracle.Match(word_id="bogus"),
]


def _engine_find(views, m):
    level = match.match_level(m)
    if level == "none":
        return False, None
    row, found = match.resolve_first(views[level], m)
    if not found:
        return False, None
    id_col = {"region": "region_id", "line": "line_id", "word": "word_id"}[level]
    return True, row[id_col]


@pytest.mark.parametrize("m", FIXTURE_MATCHES, ids=str)
def test_fixture_match_parity(kant_views, kant_bytes, m):
    page = oracle.Page.from_bytes(kant_bytes)
    node, found = page.find(m)
    got_found, got_id = _engine_find(kant_views, m)
    assert got_found == found
    if found:
        assert got_id == node.id()


def test_corpus_match_parity_sampled():
    """Every (region, line, word) id present in a doc must resolve the
    same way through the flat views as through the oracle."""
    rows = []
    docs = {}
    for i in range(0, 60):
        d = pagegen.gen_doc(i)
        if d["text"] is None:
            continue
        rows.append((d["url"], d["html"]))
        docs[d["url"]] = oracle.Page.from_bytes(d["html"])
    views = _views(rows)
    probes = [
        oracle.Match(region_id="r_0"),
        oracle.Match(region_id="r_orphan"),  # orphan: not findable alone
        oracle.Match(region_id="r_orphan", line_id="tl_orphan"),  # …but via line
        oracle.Match(region_id="r_sep"),  # separator: never findable
        oracle.Match(line_id="tl_1_0"),
        oracle.Match(word_id="w_1_0_1"),
        oracle.Match(region_id="r_0", line_id="tl_0_0", word_id="w_0_0_0"),
        oracle.Match(region_id="r_1", line_id="tl_0_0"),  # containment violation
        oracle.Match(region_id="r_missing"),  # dangling RO ref: IS findable
    ]
    import pyarrow.compute as pc

    for m in probes:
        level = match.match_level(m)
        view = views[level]
        for url, page in docs.items():
            node, found = page.find(m)
            sub = view.filter(pc.equal(view["url"], url))
            row, got_found = match.resolve_first(sub, m)
            assert got_found == found, (url, str(m))
            if found:
                id_col = {"region": "region_id", "line": "line_id", "word": "word_id"}[level]
                assert row[id_col] == node.id()


def test_explode_region_counts_match_nested():
    pages = pagegen.gen_corpus_table(100, 40)
    full = extract.extract_batch(pages, mode="full")
    r = explode.explode_regions(full)
    # per-url RO-region count equals n_regions from the extract output
    import pyarrow.compute as pc

    in_ro = r.filter(pc.is_valid(r["ro_index"]))
    counts = {}
    for u in in_ro["url"].to_pylist():
        counts[u] = counts.get(u, 0) + 1
    for u, n in zip(full["url"].to_pylist(), full["n_regions"].to_pylist()):
        assert counts.get(u, 0) == n


def test_words_flat_golden(kant_views):
    import pyarrow.compute as pc

    w = kant_views["word"]
    hit = w.filter(pc.equal(w["word_id"], "w_w1aab1b1b2b1b1ab1"))
    assert hit.num_rows == 1
    row = hit.to_pylist()[0]
    assert row["text"] == "("
    assert (row["x0"], row["y0"], row["x1"], row["y1"]) == (847, 295, 862, 335)
    assert row["region_id"] == "r_1_1" and row["line_id"] == "tl_1"


def test_find_first_dataset_word_level(ray_session):
    """Corpus-wide Page.Find at word level through the Dataset API."""
    import ray.data

    from gocrd_ray import extract as ex
    from gocrd_ray.sources.pages import synthetic_pages

    full = synthetic_pages(60).map_batches(
        lambda b: ex.extract_batch(b, mode="full"), batch_format="pyarrow"
    )
    got = {r["url"]: r for r in match.find_first(
        full, oracle.Match(word_id="w_1_0_1")).take_all()}
    for i in range(60):
        d = pagegen.gen_doc(i)
        if d["text"] is None:
            assert d["url"] not in got
            continue
        node, want = oracle.Page.from_bytes(d["html"]).find(
            oracle.Match(word_id="w_1_0_1")
        )
        assert (d["url"] in got) == want, d["url"]
        if want:
            assert got[d["url"]]["text"] == node.text_equiv_unicode_at(0)[0]
