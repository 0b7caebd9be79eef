"""HTML boilerplate stripping: handcrafted cases + construction-ground-
truth parity over the documents-derived corpus."""

import pyarrow as pa
import pyarrow.parquet as pq

from gocrd_ray import pagegen
from gocrd_ray.stages.boilerplate import BoilerplateStripper


def _extract(html: str, **kw) -> dict:
    return BoilerplateStripper(**kw).extract_doc(html.encode())


def test_strips_nav_footer_script():
    out = _extract(
        "<html><head><script>bad()</script><title>T</title></head><body>"
        "<nav><a href='/'>Home</a> <a href='/x'>About us here</a></nav>"
        "<p>This is the real article content, long enough to count as a "
        "content block for sure.</p>"
        "<footer>Copyright 2026 example dot com legal notices page</footer>"
        "</body></html>"
    )
    assert out["main_text"].startswith("This is the real article content")
    assert "Home" not in out["main_text"]
    assert "Copyright" not in out["main_text"]
    assert "bad()" not in out["main_text"]
    assert out["n_content_blocks"] == 1


def test_link_density_rule():
    soup = " ".join(f"<a href='/c/{i}'>category link number {i}</a>" for i in range(8))
    out = _extract(
        f"<body><div class='links'>{soup}</div>"
        "<p>Actual prose with plenty of characters to qualify as content "
        "and no links at all inside it.</p></body>"
    )
    assert "category link" not in out["main_text"]
    assert out["main_text"].startswith("Actual prose")


def test_short_block_absorption():
    out = _extract(
        "<body><p>First long paragraph of genuine content with more than "
        "enough characters to pass.</p>"
        "<h3>Tiny header</h3>"
        "<p>Second long paragraph of genuine content that also passes the "
        "length threshold easily.</p></body>"
    )
    assert "Tiny header" in out["main_text"]  # absorbed between content
    assert out["n_content_blocks"] == 3


def test_tag_soup_resilience():
    out = _extract("<p>unclosed <div><b>mess <p>more text here that is long enough to be content ok")
    assert out["error"] is None
    assert "more text" in out["main_text"]


def test_whitespace_collapse_and_entities():
    out = _extract(
        "<body><p>  spaced \n\t out   words &amp; entities &#214; here, "
        "padded to reach the length threshold  </p></body>"
    )
    assert out["main_text"] == (
        "spaced out words & entities Ö here, padded to reach the "
        "length threshold"
    )


def test_corpus_matches_construction_ground_truth():
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pages = pagegen.html_pages_batch_from_documents(docs)
    out = BoilerplateStripper()(pages)
    assert out["main_text"].to_pylist() == pages["text"].to_pylist()
