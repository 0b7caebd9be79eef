"""The single-pass extract kernel must be byte-identical to the oracle
(and therefore to the reference semantics) on every document."""

import pyarrow as pa
import pytest

from gocrd_ray import extract, oracle, pagegen


def test_fixture_text_and_spans_match_oracle(kant_bytes):
    p = oracle.Page.from_bytes(kant_bytes)
    want_text, want_spans = p.doc_text_and_spans()
    got = extract.extract_doc(kant_bytes, mode="full")
    assert got["error"] is None
    assert got["text"] == want_text  # byte-identical, incl. \n\t runs + ſ
    assert [(s["region_id"], s["start"], s["end"]) for s in got["spans"]] == want_spans
    assert got["n_regions"] == 4
    assert got["n_words"] == 258


def test_fixture_full_hierarchy_counts(kant_bytes):
    got = extract.extract_doc(kant_bytes, mode="full")
    regions = got["regions"]
    # reading-ordered regions first; orphan elements (PrintSpace,
    # SeparatorRegions) follow with null ro_index
    in_ro = [r for r in regions if r["ro_index"] is not None]
    assert [r["region_id"] for r in in_ro] == ["r_1_1", "r_2_1", "r_2_2", "r_2_3"]
    orphans = [r for r in regions if r["ro_index"] is None]
    assert {r["tag"] for r in orphans} == {"PrintSpace", "SeparatorRegion"}
    assert in_ro[0]["bbox"] == {"x0": 846, "y0": 294, "x1": 1026, "y1": 337}
    # golden line/word from page_test.go:102-104,127-128
    r21 = in_ro[1]
    tl2 = next(l for l in r21["lines"] if l["line_id"] == "tl_2")
    w = next(x for x in tl2["words"] if x["word_id"] == "w_w1aab1b3b2b1b1ab1")
    assert w["text"] == "gewiegelt"
    tl11 = next(l for l in r21["lines"] if l["line_id"] == "tl_11")
    assert tl11["text"] == "urtheile werden, eben ſowohl als die alten, zum"


@pytest.mark.parametrize("start", [0, 500])
def test_adversarial_corpus_matches_oracle_and_ground_truth(start):
    for i in range(start, start + 250):
        d = pagegen.gen_doc(i)
        got = extract.extract_doc(d["html"])
        if d["text"] is None:  # poison row: captured error, no crash
            assert got["error"] is not None
            assert got["text"] is None
            continue
        assert got["error"] is None
        o = oracle.Page.from_bytes(d["html"]).doc_text()
        assert got["text"] == o == d["text"], f"doc {i}"


def test_regular_generator_matches_oracle():
    tbl = pa.table(
        {
            "doc_id": list(range(12)),
            "text": ["w%d" % i + " x y z a b c d e f g h i j k l m n o p q" for i in range(12)],
            "lang": ["en"] * 12,
        }
    )
    pages = pagegen.pages_batch_from_documents(tbl)
    out = extract.extract_batch(pages)
    assert out["text"].to_pylist() == pages["text"].to_pylist()
    for html, gt in zip(pages["html"].to_pylist(), pages["text"].to_pylist()):
        assert oracle.Page.from_bytes(html).doc_text() == gt


def test_extract_batch_schema_and_spans():
    pages = pagegen.gen_corpus_table(0, 64)
    out = extract.extract_batch(pages, mode="full")
    assert out.schema.names == [f.name for f in extract.EXTRACT_FULL_SCHEMA]
    for text, spans in zip(out["text"].to_pylist(), out["spans"].to_pylist()):
        if text is None:
            continue
        # spans tile doc_text exactly: "\n".join(segments) == doc_text
        segs = [text[s["start"] : s["end"]] for s in spans]
        assert "\n".join(segs) == text
        for s, prev in zip(spans[1:], spans):
            assert s["start"] == prev["end"] + 1


def test_alt_texts_match_oracle():
    """TextEquivUnicodeAt(pos>0) surface: alt_texts[pos-1] must equal the
    oracle's positional lookup for every node that has alternatives."""
    checked = 0
    for i in range(0, 120):
        d = pagegen.gen_doc(i)
        if d["text"] is None:
            continue
        page = oracle.Page.from_bytes(d["html"])
        got = extract.extract_doc(d["html"], mode="full")
        regions = {r.id(): r for r in page.regions()}
        for r in got["regions"]:
            if r["ro_index"] is None or r["missing_element"]:
                continue
            node = regions[r["region_id"]]
            for pos in range(1, r["n_alt_texts"] + 1):
                want, ok = node.text_equiv_unicode_at(pos)
                assert ok and r["alt_texts"][pos - 1] == want
                checked += 1
            # out-of-range: absent in both
            t, ok = node.text_equiv_unicode_at(r["n_alt_texts"] + 1)
            assert not ok
            for line, lnode in zip(r["lines"], node.lines()):
                for w, wnode in zip(line["words"], lnode.words()):
                    for pos in range(1, len(w["alt_texts"]) + 1):
                        want, ok = wnode.text_equiv_unicode_at(pos)
                        assert ok and w["alt_texts"][pos - 1] == want
                        checked += 1
    assert checked > 50  # the corpus must actually exercise alternatives


def test_entity_bomb_rejected_as_poison_row():
    bomb = (
        b'<?xml version="1.0"?><!DOCTYPE lolz [<!ENTITY a "ha">'
        b'<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;&a;&a;">'
        b'<!ENTITY c "&b;&b;&b;&b;&b;&b;&b;&b;&b;&b;">]>'
        b"<PcGts><Page><TextRegion id=\"r\"><TextEquiv><Unicode>&c;</Unicode>"
        b"</TextEquiv></TextRegion></Page></PcGts>"
    )
    got = extract.extract_doc(bomb)
    assert got["error"] is not None and "entity" in got["error"]
    assert got["text"] is None


def test_geom_mode_preserves_polygons():
    """geom mode = full mode + polygon point lists; validity identical."""
    for i in range(40):
        d = pagegen.gen_doc(i)
        if d["text"] is None:
            continue
        full = extract.extract_doc(d["html"], mode="full")
        geom = extract.extract_doc(d["html"], mode="geom")
        assert full["text"] == geom["text"]
        for rf, rg in zip(full["regions"], geom["regions"]):
            assert rf["bbox"] == rg["bbox"]
            assert rf["coords"] is None
            if rg["bbox"] is not None:
                assert rg["coords"] is not None
                assert extract._bbox(rg["coords"]) == rg["bbox"]
            for lf, lg in zip(rf["lines"], rg["lines"]):
                assert lf["bbox"] == lg["bbox"]
                for wf, wg in zip(lf["words"], lg["words"]):
                    assert wf["bbox"] == wg["bbox"]
                    if wg["coords"] is not None:
                        assert extract._bbox(wg["coords"]) == wg["bbox"]


def test_non_pcgts_root_yields_empty_text(mets_bytes):
    """A non-PcGts XML document (e.g. a METS manifest fed to the page
    extractor) extracts to empty text with no error — every /PcGts/...
    query over it matches nothing, like the reference's xmlpath."""
    got = extract.extract_doc(mets_bytes, mode="full")
    assert got["error"] is None
    assert got["text"] == "" and got["n_regions"] == 0
    assert got["regions"] == []
    assert oracle.Page.from_bytes(mets_bytes).doc_text() == ""


def test_int32_overflow_is_malformed_not_fatal():
    """Pinned semantic (ADVICE r01): integers beyond int32 in Coords
    points or RegionRefIndexed @index are MALFORMED — null bbox /
    skipped RO entry — never an ArrowInvalid that kills the batch.
    (Deliberate divergence from Go strconv.Atoi's int64 range; the
    declared Arrow schema is int32 and a hostile doc must stay a row.)"""
    doc = (
        b'<PcGts><Page>'
        b'<ReadingOrder><OrderedGroup id="g">'
        b'<RegionRefIndexed index="3000000000" regionRef="r_big"/>'
        b'<RegionRefIndexed index="1" regionRef="r_ok"/>'
        b'</OrderedGroup></ReadingOrder>'
        b'<TextRegion id="r_big"><TextEquiv><Unicode>BIG</Unicode></TextEquiv>'
        b'</TextRegion>'
        b'<TextRegion id="r_ok">'
        b'<Coords points="3000000000,5 6,-9999999999"/>'
        b'<TextLine id="tl"><Coords points="1,2 3,4"/>'
        b'<Word id="w"><Coords points="70000000000,1 2,3"/>'
        b'<TextEquiv><Unicode>ok</Unicode></TextEquiv></Word>'
        b'</TextLine>'
        b'<TextEquiv><Unicode>fine</Unicode></TextEquiv></TextRegion>'
        b'</Page></PcGts>'
    )
    for mode in ("text", "full", "geom"):
        got = extract.extract_doc(doc, mode=mode)
        assert got["error"] is None
        # the oversized RO index is a skipped entry: only r_ok extracts
        assert got["text"] == "fine"
    full = extract.extract_doc(doc, mode="geom")
    in_ro = [r for r in full["regions"] if r["ro_index"] is not None]
    assert [r["region_id"] for r in in_ro] == ["r_ok"]
    r = in_ro[0]
    assert r["bbox"] is None and r["coords"] is None  # oversized coord
    w = r["lines"][0]["words"][0]
    assert w["bbox"] is None and w["coords"] is None
    assert r["lines"][0]["bbox"] == {"x0": 1, "y0": 2, "x1": 3, "y1": 4}
    # malformed RO entry is kept for first-match semantics
    bad = [r for r in full["regions"] if r["ro_malformed"]]
    assert [r["region_id"] for r in bad] == ["r_big"]
    # oracle agrees on all of it
    p = oracle.Page.from_bytes(doc)
    assert p.doc_text() == "fine"
    assert [r.id() for r in p.regions()] == ["r_ok"]
    with pytest.raises(oracle.PolygonError):
        p.regions()[0].polygon()
    # and the Arrow batch build survives (the original crash site)
    tbl = pa.table({"url": ["u"], "html": pa.array([doc], pa.binary())})
    out = extract.extract_batch(tbl, mode="geom")
    assert out.num_rows == 1 and out.column("error")[0].as_py() is None
