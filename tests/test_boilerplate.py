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


SOUP_CASES = [
    "<p>unclosed <div><b>mess <p>more text that is long enough ok",
    "<body><p>  spaced \n\t out &amp; entities &#214; here  </p></body>",
    "a < b and c > d <p>x</p>",
    "<script>if (a<b) { document.write('<p>no</p>'); }</script><p>real</p>",
    "<style>p > a { color: red }</style><p>styled</p>",
    "<!-- comment <p>not this</p> --><p>yes</p>",
    "<!DOCTYPE html><?php echo '<p>hi</p>'; ?><p>ok</p>",
    "<br/><br /><hr/><p>after voids</p>",
    "<a href='/x'>link</a> <a href=\"/y\">l2</a> <a href=/z>l3</a> <a>none</a>",
    "<A HREF='/UP'>upper</A>",
    "<p attr='with > inside'>gt in attr</p>",
    "<p>truncated <a href='/q",
    "</><//><p>after bogus</p>",
    "<p>ampersand & alone &notanentity; &#999999999;</p>",
    "<script>never closed",
    "<![CDATA[ raw <p>x</p> ]]><p>after cdata</p>",
    "<p/>self closed p<p>real block here</p>",
    "text<>empty tag<p>x</p>",
    "<p =bare>odd attrs</p>",
    "<p\nmulti\nline\nattrs='1'>ml</p>",
    "<b<",
    # unquoted attr values ending in '/' are NOT self-closing (ADVICE r2):
    # the '/' belongs to the value, so the anchor stays open over its text
    "<a href=http://x.com/>ten chars!</a><p>plain text that is long</p>",
    "<div id=a/>inside still in div<p>more text here</p>",
    "<input value=a/><p>after input</p>",
    # '/' separated from '>' is attr-tail noise, not self-closing
    "<div / >in div</div>",
    "<div/ >also in div</div>",
    # quoted value + '/>' IS self-closing
    "<p foo='b'/>closed already<p>real paragraph text</p>",
    "<a href='/q'/>not a link text</a><p>tail</p>",
]


def _run_both(text):
    from gocrd_ray.stages.boilerplate import _BlockParser, _FastBlockScanner

    a = _BlockParser()
    a.feed(text)
    a.close()
    a._flush()
    b = _FastBlockScanner()
    b.scan(text)
    b._flush()
    return (a.blocks, a.links), (b.blocks, b.links)


def test_fast_scanner_parity_soup_cases():
    """The fast regex tokenizer must reproduce the stdlib HTMLParser's
    observable behavior (blocks + links) on handcrafted tag soup."""
    for c in SOUP_CASES:
        got_std, got_fast = _run_both(c)
        assert got_fast == got_std, c


def test_fast_scanner_parity_random_soup():
    """Event-level parity is pinned on complete-construct soup (broken
    nesting, bare angles, bogus end tags, truncated names). Soup with
    HALF-OPEN QUOTED ATTRIBUTES is deliberately out of contract — real
    parsers (html.parser vs lxml vs html5lib) all diverge there, and
    the fast scanner's recovery (swallow to next '>') is the pinned
    engine semantics for those."""
    import random

    rng = random.Random(7)
    toks = [
        "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<", ">",
        "&amp;", "&", "txt ", "<!-- c -->", "<br/>", "<script>", "</script>",
        "word", " ", "<nav>", "</nav>", "<b", "='q'>", "<!doctype>", "</>",
        "&#65;", "<![CDATA[x]]>",
        "<a href=http://x/>", "<div id=a/>", "/>", " / >", "<img src=/p/>",
    ]
    for _ in range(1500):
        s = "".join(rng.choice(toks) for _ in range(rng.randint(1, 30)))
        got_std, got_fast = _run_both(s)
        assert got_fast == got_std, repr(s)


def test_fast_scanner_parity_corpus():
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pages = pagegen.html_pages_batch_from_documents(docs)
    for h in pages.column("html").to_pylist():
        got_std, got_fast = _run_both(h.decode("utf-8", errors="replace"))
        assert got_fast == got_std
