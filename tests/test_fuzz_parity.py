"""Structure fuzzing: random PAGE-XML-ish documents (random namespaces,
reading orders, duplicate/missing ids, malformed entries, weird text)
must extract byte-identically to the oracle."""

from xml.sax.saxutils import escape, quoteattr

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gocrd_ray import extract, oracle

ids = st.text(alphabet="abr_123", min_size=0, max_size=6)
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"), max_codepoint=0x3000),
    max_size=30,
) | st.sampled_from(["ſ", "aͤ", "x\n\t\t\ty", "( 484 )", "&<>\"'"])
indexes = st.one_of(
    st.integers(-5, 20).map(str),
    st.sampled_from(["", "bogus", "1x", "+3", " 2", "3000000000", "-2147483649"]),
)


@st.composite
def documents(draw):
    ns = draw(st.sampled_from(["", "pc:"]))
    n_regions = draw(st.integers(0, 4))
    regions = []
    for k in range(n_regions):
        rid = draw(ids)
        n_te = draw(st.integers(0, 2))
        tes = "".join(
            f"<TextEquiv><Unicode>{escape(draw(texts))}</Unicode></TextEquiv>"
            for _ in range(n_te)
        )
        n_lines = draw(st.integers(0, 2))
        lines = []
        for i in range(n_lines):
            lid = draw(ids)
            wtext = escape(draw(texts))
            # sometimes a non-TextLine container carrying a Word — the
            # /Page/*/*/Word wildcard must still reach it
            container = draw(st.sampled_from(["TextLine", "TextLine", "WeirdBox"]))
            lines.append(
                f'<{container} id={quoteattr(lid)}>'
                f'<Word id="w{k}_{i}"><TextEquiv><Unicode>{wtext}</Unicode>'
                f"</TextEquiv></Word>"
                f"<TextEquiv><Unicode>{escape(draw(texts))}</Unicode></TextEquiv>"
                f"</{container}>"
            )
        regions.append(
            f"<TextRegion id={quoteattr(rid)}>" + "".join(lines) + tes + "</TextRegion>"
        )
    # reading order referencing a random subset (possibly dangling refs,
    # possibly malformed indexes, possibly duplicates)
    n_ro = draw(st.integers(0, 6))
    ro = []
    for _ in range(n_ro):
        ref = draw(ids | st.sampled_from(["missing_ref"]))
        idx = draw(indexes)
        attrs = f"index={quoteattr(idx)} regionRef={quoteattr(ref)}"
        if draw(st.booleans()) is False and draw(st.integers(0, 9)) == 0:
            attrs = f"regionRef={quoteattr(ref)}"  # missing index
        ro.append(f"<{ns}RegionRefIndexed {attrs}/>")
    sep = '<SeparatorRegion id="sep"/>' if draw(st.booleans()) else ""
    doc = (
        f'<PcGts xmlns:pc="http://example/ns"><Page>'
        f"<{ns}ReadingOrder><{ns}OrderedGroup id=\"g\">" + "".join(ro)
        + f"</{ns}OrderedGroup></{ns}ReadingOrder>"
        + "".join(regions)
        + sep
        + "</Page></PcGts>"
    )
    return doc.encode("utf-8")


@settings(max_examples=200, deadline=None)
@given(documents())
def test_fuzz_doc_text_parity(doc):
    want = oracle.Page.from_bytes(doc).doc_text_and_spans()
    got = extract.extract_doc(doc, mode="full")
    assert got["error"] is None
    assert got["text"] == want[0]
    assert [(s["region_id"], s["start"], s["end"]) for s in got["spans"]] == want[1]


@settings(max_examples=100, deadline=None)
@given(documents(), st.sampled_from(["", "a", "r_1", "missing_ref"]),
       st.sampled_from(["", "a", "b_2"]), st.sampled_from(["", "w0_0", "w1_1"]))
def test_fuzz_match_find_parity(doc, rid, lid, wid):
    import pyarrow as pa

    from gocrd_ray.stages import explode, match

    m = oracle.Match(region_id=rid, line_id=lid, word_id=wid)
    level = match.match_level(m)
    if level == "none":
        return
    page = oracle.Page.from_bytes(doc)
    node, want = page.find(m)
    tbl = pa.table({"url": ["u"], "html": pa.array([doc], pa.binary())})
    full = extract.extract_batch(tbl, mode="full")
    view = {
        "region": explode.explode_regions,
        "line": explode.explode_lines,
        "word": explode.explode_words,
    }[level](full)
    row, got = match.resolve_first(view, m)
    assert got == want, str(m)
    if want:
        id_col = {"region": "region_id", "line": "line_id", "word": "word_id"}[level]
        assert row[id_col] == node.id()
