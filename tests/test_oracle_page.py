"""All 40 page-package golden cases from the reference test suite
(/root/reference/page/page_test.go), ported to pytest against the
Python oracle over the same Kant fixture."""

import pytest

from gocrd_ray.oracle import Match, Page


@pytest.fixture(scope="module")
def page(kant_bytes):
    return Page.from_bytes(kant_bytes)


# page_test.go:9-36
@pytest.mark.parametrize(
    "rid,find",
    [
        ("invalid-ref-id", False),
        ("r_1_1", True),
        ("r_2_1", True),
        ("r_2_2", True),
        ("r_2_3", True),
        ("r_1_2", False),
    ],
)
def test_find_region_by_ref_id(page, rid, find):
    region, ok = page.find_region_by_id(rid)
    assert ok == find
    if find:
        assert region.id() == rid


# page_test.go:38-63
@pytest.mark.parametrize(
    "rid,want,idx,find",
    [
        ("r_1_1", "( 484 )", 0, True),
        ("r_1_1", "( 484 )", 1, False),
    ],
)
def test_region_text_equiv_unicode(page, rid, want, idx, find):
    region, _ = page.find_region_by_id(rid)
    got, ok = region.text_equiv_unicode_at(idx)
    assert ok == find
    if find:
        assert got == want


# page_test.go:65-92
@pytest.mark.parametrize(
    "rid,lid,find",
    [
        ("r_1_1", "invalid-line-id", False),
        ("r_1_1", "tl_1", True),
        ("r_1_1", "tl_2", False),
        ("r_2_1", "tl_1", False),
        ("r_2_1", "tl_2", True),
    ],
)
def test_find_line_by_id(page, rid, lid, find):
    r, _ = page.find_region_by_id(rid)
    l, ok = r.find_line_by_id(lid)
    assert ok == find
    if find:
        assert l.id() == lid


# page_test.go:94-115
@pytest.mark.parametrize(
    "rid,lid,want",
    [
        ("r_1_1", "tl_1", "( 484 )"),
        ("r_2_1", "tl_11", "urtheile werden, eben ſowohl als die alten, zum"),
        ("r_2_1", "tl_13", "dienen."),
    ],
)
def test_line_text_equiv_unicode(page, rid, lid, want):
    r, _ = page.find_region_by_id(rid)
    l, _ = r.find_line_by_id(lid)
    got, _ = l.text_equiv_unicode_at(0)
    assert got == want


# page_test.go:117-148
@pytest.mark.parametrize(
    "rid,lid,wid,word,find",
    [
        ("r_1_1", "tl_1", "invalid-word-id", "", False),
        ("r_1_1", "tl_1", "w_w1aab1b1b2b1b1ab1", "(", True),
        ("r_2_1", "tl_2", "w_w1aab1b3b2b1b1ab1", "gewiegelt", True),
    ],
)
def test_find_word_by_id(page, rid, lid, wid, word, find):
    r, _ = page.find_region_by_id(rid)
    l, _ = r.find_line_by_id(lid)
    w, ok = l.find_word_by_id(wid)
    assert ok == find
    if find:
        assert w.id() == wid
        got, _ = w.text_equiv_unicode_at(0)
        assert got == word


# page_test.go:150-191 — the 11 Match path-shape combinations
@pytest.mark.parametrize(
    "m,mid,find",
    [
        (Match(region_id="r_1_1"), "r_1_1", True),
        (Match(region_id="invalid-region-id"), "", False),
        (Match(line_id="tl_1"), "tl_1", True),
        (Match(line_id="invalid-line-id"), "", False),
        (Match(word_id="w_w1aab1b1b2b1b1ab1"), "w_w1aab1b1b2b1b1ab1", True),
        (Match(word_id="invalid-word-id"), "", False),
        (Match(region_id="r_1_1", line_id="tl_1"), "tl_1", True),
        (Match(region_id="r_2_1", line_id="tl_2"), "tl_2", True),
        (Match(region_id="r_1_1", line_id="tl_2"), "", False),
        (
            Match(region_id="r_1_1", line_id="tl_2", word_id="w_w1aab1b3b2b1b1ab1"),
            "",
            False,
        ),
        (
            Match(region_id="r_2_1", line_id="tl_2", word_id="w_w1aab1b3b2b1b1ab1"),
            "w_w1aab1b3b2b1b1ab1",
            True,
        ),
    ],
    ids=str,
)
def test_find(page, m, mid, find):
    r, ok = page.find(m)
    assert ok == find
    if find:
        assert r.id() == mid


# page_test.go:193-218
@pytest.mark.parametrize(
    "m,want",
    [
        (Match(region_id="r_1_1"), (846, 294, 1026, 337)),
        (Match(line_id="tl_3"), (528, 463, 1330, 506)),
        (Match(word_id="w_w1aab1b1b2b1b1ab1"), (847, 295, 862, 335)),
    ],
    ids=str,
)
def test_rectangle(page, m, want):
    from gocrd_ray.oracle import bbox

    r, _ = page.find(m)
    assert bbox(r.polygon()) == want


# -- our engine-contract additions over the same fixture -------------------


def test_doc_text_serialization(page):
    text, spans = page.doc_text_and_spans()
    # 4 reading-order regions joined by \n; first region is "( 484 )"
    assert len(spans) == 4
    assert [s[0] for s in spans] == ["r_1_1", "r_2_1", "r_2_2", "r_2_3"]
    assert text.startswith("( 484 )\n")
    # spans index into text exactly
    region_texts = [r.text_equiv_unicode_at(0)[0] for r in page.regions()]
    for (rid, start, end), rt in zip(spans, region_texts):
        assert text[start:end] == rt
    # byte-exactness probe: long s + embedded tab runs survive
    assert "ſ" in text
    assert "\n\t\t\t\t" in text


def test_separator_regions_excluded(page):
    # SeparatorRegions r_3/r_4 carry readingOrder custom attrs but no
    # RegionRefIndexed entries — invisible (fixture :2127-2132)
    assert [r.id() for r in page.regions()] == ["r_1_1", "r_2_1", "r_2_2", "r_2_3"]
    _, ok = page.find_region_by_id("r_3")
    assert not ok


def test_match_string_go_format():
    """Match.String parity with the reference's fmt {%q,%q,%q}
    (page/page.go:129-131, mets/mets.go:67-69) — golden cases verified
    against Go strconv.Quote semantics."""
    from gocrd_ray.oracle import Match, MetsMatch

    assert str(Match("r_1", "tl_2", "w_3")) == '{"r_1","tl_2","w_3"}'
    assert str(Match()) == '{"","",""}'
    # %q escapes: quote, backslash, control chars; unicode verbatim
    assert str(Match('a"b', "c\\d", "e\nf")) == '{"a\\"b","c\\\\d","e\\nf"}'
    assert str(Match("ſtraße", "", "")) == '{"ſtraße","",""}'
    assert str(Match("\x01", "", "")) == '{"\\x01","",""}'
    assert (
        str(MetsMatch("OCR-D-GT-PAGE", "f1", "text/xml"))
        == '{"OCR-D-GT-PAGE","f1","text/xml"}'
    )
