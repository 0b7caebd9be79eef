"""Property tests (hypothesis) for the scalar kit + predicate algebra:
coordinate parsing matches Go strconv semantics, bbox is a min/max
reduction invariant under point order, span arithmetic tiles exactly."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gocrd_ray import oracle
from gocrd_ray.extract import _parse_points
from gocrd_ray.functions import scalars

points = st.lists(
    st.tuples(st.integers(-10**6, 10**6), st.integers(-10**6, 10**6)),
    min_size=2,
    max_size=40,
)


@given(points)
def test_parse_points_roundtrip(pts):
    s = " ".join(f"{x},{y}" for x, y in pts)
    assert scalars.parse_points(s) == pts
    fast = _parse_points(s)
    assert [(p["x"], p["y"]) for p in fast] == pts


@given(points, st.randoms())
def test_bbox_order_invariant(pts, rnd):
    shuffled = list(pts)
    rnd.shuffle(shuffled)
    assert scalars.bbox(pts) == scalars.bbox(shuffled)
    x0, y0, x1, y1 = scalars.bbox(pts)
    assert x0 <= x1 and y0 <= y1
    assert all(x0 <= x <= x1 and y0 <= y <= y1 for x, y in pts)


@given(st.text(alphabet="0123456789,. -x_", max_size=30))
def test_parse_points_never_crashes(s):
    try:
        out = scalars.parse_points(s)
        # success implies every token was a well-formed int pair
        assert len(out) >= 2
    except oracle.PolygonError:
        pass
    # the engine's null-returning variant must agree on validity
    fast = _parse_points(s)
    try:
        scalars.parse_points(s)
        assert fast is not None
    except oracle.PolygonError:
        assert fast is None


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_characters="\n", max_codepoint=0x2FFF),
            max_size=20,
        ),
        max_size=8,
    )
)
def test_span_tiling(texts):
    doc = "\n".join(texts)
    spans = []
    off = 0
    for i, t in enumerate(texts):
        if i > 0:
            off += 1
        spans.append({"region_id": f"r_{i}", "start": off, "end": off + len(t)})
        off += len(t)
    assert scalars.spans_cover(doc, spans)
    for t, s in zip(texts, spans):
        assert scalars.span_slice(doc, s) == t


@given(points)
def test_bbox_vectorized_matches_scalar(pts):
    col = pa.array(
        [[{"x": x, "y": y} for x, y in pts], None, []],
        pa.list_(pa.struct([("x", pa.int32()), ("y", pa.int32())])),
    )
    out = scalars.bbox_of_coords_column(col).to_pylist()
    x0, y0, x1, y1 = scalars.bbox(pts)
    assert out[0] == {"x0": x0, "y0": y0, "x1": x1, "y1": y1}
    assert out[1] is None and out[2] is None


@settings(max_examples=30)
@given(
    st.sampled_from(["", "r_0", "r_1", "nope"]),
    st.sampled_from(["", "tl_0_0", "tl_1_1", "nope"]),
    st.sampled_from(["", "w_0_0_0", "w_1_1_1", "nope"]),
    st.integers(0, 30),
)
def test_match_algebra_engine_vs_oracle(rid, lid, wid, doc_id):
    """Predicate algebra parity on arbitrary Match shapes × corpus docs."""
    from gocrd_ray import extract, pagegen
    from gocrd_ray.stages import explode, match

    d = pagegen.gen_doc(doc_id)
    if d["text"] is None:
        return
    page = oracle.Page.from_bytes(d["html"])
    m = oracle.Match(region_id=rid, line_id=lid, word_id=wid)
    tbl = pa.table({"url": [d["url"]], "html": pa.array([d["html"]], pa.binary())})
    full = extract.extract_batch(tbl, mode="full")
    level = match.match_level(m)
    if level == "none":
        return
    view = {
        "region": explode.explode_regions,
        "line": explode.explode_lines,
        "word": explode.explode_words,
    }[level](full)
    row, got = match.resolve_first(view, m)
    node, want = page.find(m)
    assert got == want, str(m)
    if want:
        id_col = {"region": "region_id", "line": "line_id", "word": "word_id"}[level]
        assert row[id_col] == node.id()
