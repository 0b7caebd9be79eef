"""Deterministic synthetic pages-table generators.

Two generators, both emitting the PAGES_SCHEMA
``(url, warc_ts, html, text, lang)`` table (BASELINE.json input_hint):

1. ``pages_from_documents`` — derives a page per row of the driver's
   ``documents`` table with a *regular* structure chosen so every
   property of the extraction output is expressible in ANSI SQL over
   ``documents`` (words = split on single space, lines = chunks of
   WORDS_PER_LINE, regions = chunks of LINES_PER_REGION lines, fixed
   coordinate arithmetic). This is what the driver's DuckDB oracle
   checks run against.

2. ``gen_corpus`` — a seeded adversarial generator exercising every
   nasty reference semantic (multi-TextEquiv, orphan regions absent
   from ReadingOrder, SeparatorRegions, malformed coords / reading
   order entries, broken XML, non-ASCII byte-exactness probes, giant
   skew rows). Ground-truth ``text`` is computed by construction with
   the doc-text rule (SURVEY.md §2.12.10); corpus tests additionally
   cross-check it against the oracle.

Generation is a pure function of (seed, doc index) — safe to re-run,
shard, and parallelize.
"""

from __future__ import annotations

import datetime
import hashlib
import random
from xml.sax.saxutils import escape, quoteattr

import pyarrow as pa

from .model import PAGES_SCHEMA

WORDS_PER_LINE = 8
LINES_PER_REGION = 5
N_HOSTS = 50
EPOCH = datetime.datetime(2026, 1, 1)

# -- shared helpers ---------------------------------------------------------


def url_for(doc_id: int) -> str:
    """Must stay in sync with the DuckDB oracle expression
    (entry module URL_SQL)."""
    return f"https://h{doc_id % N_HOSTS:02d}.example.com/doc/{doc_id}"


def ts_for(doc_id: int) -> datetime.datetime:
    return EPOCH + datetime.timedelta(seconds=doc_id)


def _corners(x0: int, y0: int, x1: int, y1: int, variant: int) -> str:
    pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    pts = pts[variant % 4 :] + pts[: variant % 4]  # rotation; bbox-invariant
    return " ".join(f"{x},{y}" for x, y in pts)


def word_box(line_idx: int, word_idx: int) -> tuple[int, int, int, int]:
    x0 = 10 + 60 * word_idx
    y0 = 20 + 50 * line_idx
    return x0, y0, x0 + 50, y0 + 40


def line_box(line_idx: int, n_words: int) -> tuple[int, int, int, int]:
    y0 = 20 + 50 * line_idx
    return 10, y0, 10 + 60 * (n_words - 1) + 50, y0 + 40


# -- 1. regular, SQL-mirrorable synthesis from `documents` ------------------


def page_xml_from_words(doc_id: int, words: list[str]) -> tuple[bytes, str]:
    """Build the regular PAGE-XML document for one `documents` row.

    Hierarchy: words → lines of WORDS_PER_LINE → regions of
    LINES_PER_REGION lines. Region text = its lines joined by "\\n"
    (as-authored, like the reference fixture), so
    doc_text = all lines joined by "\\n".
    ReadingOrder entries are emitted in reverse for doc_id % 3 == 0
    (the pipeline's index sort must restore them), and the ReadingOrder
    subtree is namespace-prefixed for even doc_ids (the reference's
    xmlpath is namespace-oblivious; so are we).
    """
    lines = [
        words[i : i + WORDS_PER_LINE] for i in range(0, len(words), WORDS_PER_LINE)
    ]
    regions = [
        lines[i : i + LINES_PER_REGION]
        for i in range(0, len(lines), LINES_PER_REGION)
    ]
    p = ["pc:" if doc_id % 2 == 0 else ""][0]
    out = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<PcGts xmlns:pc="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">\n'
        "  <Page>\n"
    ]
    ro = [
        f'      <{p}RegionRefIndexed index="{k}" regionRef="r_{k}"/>'
        for k in range(len(regions))
    ]
    if doc_id % 3 == 0:
        ro.reverse()
    out.append(f"    <{p}ReadingOrder>\n      <{p}OrderedGroup id=\"ro_1\">\n")
    out.append("\n".join("  " + e for e in ro))
    out.append(f"\n      </{p}OrderedGroup>\n    </{p}ReadingOrder>\n")

    line_global = 0
    for k, rlines in enumerate(regions):
        first_i, last_i = line_global, line_global + len(rlines) - 1
        rx0, ry0 = 10, 20 + 50 * first_i
        rx1, ry1 = 10 + 60 * (WORDS_PER_LINE - 1) + 50, 20 + 50 * last_i + 40
        rtext = "\n".join(" ".join(lw) for lw in rlines)
        out.append(
            f'    <TextRegion type="paragraph" id="r_{k}">\n'
            f'      <Coords points="{_corners(rx0, ry0, rx1, ry1, doc_id + k)}"/>\n'
        )
        for lw in rlines:
            i = line_global
            lx0, ly0, lx1, ly1 = line_box(i, len(lw))
            out.append(
                f'      <TextLine id="tl_{i}">\n'
                f'        <Coords points="{_corners(lx0, ly0, lx1, ly1, doc_id + i)}"/>\n'
                f'        <Baseline points="{lx0},{ly1 + 2} {lx1},{ly1 + 2}"/>\n'
            )
            for j, w in enumerate(lw):
                wx0, wy0, wx1, wy1 = word_box(i, j)
                out.append(
                    f'        <Word id="w_{i}_{j}">\n'
                    f'          <Coords points="{_corners(wx0, wy0, wx1, wy1, doc_id + i + j)}"/>\n'
                    f"          <TextEquiv>\n            <Unicode>{escape(w)}</Unicode>\n          </TextEquiv>\n"
                    f"        </Word>\n"
                )
            out.append(
                f"        <TextEquiv>\n          <Unicode>{escape(' '.join(lw))}</Unicode>\n        </TextEquiv>\n"
                f"      </TextLine>\n"
            )
            line_global += 1
        out.append(
            f"      <TextEquiv>\n        <Unicode>{escape(rtext)}</Unicode>\n      </TextEquiv>\n"
            f"    </TextRegion>\n"
        )
    out.append("  </Page>\n</PcGts>\n")
    doc_text = "\n".join(" ".join(lw) for lw in lines)
    return "".join(out).encode("utf-8"), doc_text


def pages_batch_from_documents(batch: pa.Table) -> pa.Table:
    """map_batches body: documents batch → pages batch (PAGES_SCHEMA)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls, tss, htmls, gts = [], [], [], []
    for doc_id, text in zip(doc_ids, texts):
        html, gt = page_xml_from_words(doc_id, text.split(" "))
        urls.append(url_for(doc_id))
        tss.append(ts_for(doc_id))
        htmls.append(html)
        gts.append(gt)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(gts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


# -- 2. adversarial corpus generator ----------------------------------------

_VOCAB = (
    "the quick brown fox jumps over lazy dog und über straße "
    "aufklärung ſelbſt geweſen groſʒen daher publikum langſam "
    "revolution denkungsart vorurtheile ein kann nur zur wahre reform "
    "alpha beta gamma delta epsilon data stream batch merge sort"
).split() + ["aͤhnlich", "raͤchen", "(", ")", "484", "—", "&amp;-literal", "<tag>"]


def _rng(seed: int, doc_id: int) -> random.Random:
    h = hashlib.sha256(f"{seed}:{doc_id}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def gen_doc(doc_id: int, seed: int = 42, giant_every: int = 997,
            broken_every: int = 211) -> dict:
    """Pure function (seed, doc_id) → one pages-table row (dict).

    Every doc_id with doc_id % broken_every == 5 is malformed XML
    (text=None); doc_id % giant_every == 7 is a giant skew row.
    """
    rng = _rng(seed, doc_id)
    url = url_for(doc_id)
    ts = ts_for(doc_id)
    lang = ["de", "en", "fr", "es", "la"][doc_id % 5]

    if doc_id % broken_every == 5:
        html = b'<?xml version="1.0"?><PcGts><Page><TextRegion id="r_0">' + bytes(
            rng.choice(b"abc<>&") for _ in range(64)
        )
        return {"url": url, "warc_ts": ts, "html": html, "text": None, "lang": lang}

    scale = 40 if doc_id % giant_every == 7 else 1
    n_regions = rng.randint(2, 5) * scale
    parts = []
    body = []
    ro_entries = []
    sep = "\n\t\t\t\t" if doc_id % 5 == 0 else "\n"
    for k in range(n_regions):
        n_lines = rng.randint(1, 6)
        line_texts = []
        lines_xml = []
        for i in range(n_lines):
            n_words = rng.randint(2, 10)
            ws = [rng.choice(_VOCAB) for _ in range(n_words)]
            words_xml = []
            for j, w in enumerate(ws):
                wx0, wy0, wx1, wy1 = word_box(i, j)
                alt = (
                    f"<TextEquiv><Unicode>{escape(w.upper())}</Unicode></TextEquiv>"
                    if rng.random() < 0.1
                    else ""
                )
                # ~2% of words get malformed coords (single point / non-int)
                pts = (
                    f"{wx0},{wy0}"
                    if rng.random() < 0.01
                    else f"{wx0},nope {wx1},{wy1}"
                    if rng.random() < 0.01
                    else _corners(wx0, wy0, wx1, wy1, j)
                )
                words_xml.append(
                    f'<Word id="w_{k}_{i}_{j}"><Coords points="{pts}"/>'
                    f"<TextEquiv><Unicode>{escape(w)}</Unicode></TextEquiv>{alt}</Word>"
                )
            lt = " ".join(ws)
            line_texts.append(lt)
            lx0, ly0, lx1, ly1 = line_box(i, n_words)
            lines_xml.append(
                f'<TextLine id="tl_{k}_{i}"><Coords points="{_corners(lx0, ly0, lx1, ly1, i)}"/>'
                f'<Baseline points="{lx0},{ly1 + 2} {lx1},{ly1 + 2}"/>'
                + "".join(words_xml)
                + f"<TextEquiv><Unicode>{escape(lt)}</Unicode></TextEquiv></TextLine>"
            )
        rtext = sep.join(line_texts)
        alt_r = (
            f"<TextEquiv><Unicode>{escape(rtext[::-1])}</Unicode></TextEquiv>"
            if rng.random() < 0.15
            else ""
        )
        body.append(
            f'<TextRegion type="paragraph" id="r_{k}">'
            f'<Coords points="{_corners(10, 20, 500, 20 + 50 * n_lines, k)}"/>'
            + "".join(lines_xml)
            + f"<TextEquiv><Unicode>{escape(rtext)}</Unicode></TextEquiv>{alt_r}</TextRegion>"
        )
        parts.append(rtext)
        ro_entries.append(f'<RegionRefIndexed index="{k}" regionRef="r_{k}"/>')

    # orphan region: present in the DOM, absent from ReadingOrder —
    # excluded from doc_text (page/page.go:139-153, page_test.go:23)
    if doc_id % 7 == 0:
        body.append(
            '<TextRegion type="marginalia" id="r_orphan">'
            '<Coords points="0,0 5,5"/>'
            '<TextLine id="tl_orphan"><Coords points="0,0 5,5"/>'
            '<Word id="w_orphan"><Coords points="0,0 5,5"/>'
            "<TextEquiv><Unicode>ORPHAN</Unicode></TextEquiv></Word>"
            "<TextEquiv><Unicode>orphan line</Unicode></TextEquiv></TextLine>"
            "<TextEquiv><Unicode>orphan region text</Unicode></TextEquiv></TextRegion>"
        )
    # separator regions with no reading-order entry (fixture :2127-2132)
    body.append('<SeparatorRegion id="r_sep"><Coords points="0,9 9,9"/></SeparatorRegion>')
    # malformed reading-order entries: silently skipped (page/page.go:144-146)
    ro_entries.append('<RegionRefIndexed index="bogus" regionRef="r_0"/>')
    ro_entries.append(f'<RegionRefIndexed index="{n_regions}"/>')
    # dangling ref: listed in RO but element missing → contributes ""
    if doc_id % 11 == 3:
        ro_entries.append(
            f'<RegionRefIndexed index="{n_regions + 1}" regionRef="r_missing"/>'
        )
        parts.append("")
    if doc_id % 3 == 0:
        ro_entries.reverse()

    ns = ' xmlns:pc="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"'
    html = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<PcGts{ns}><Page><ReadingOrder><OrderedGroup id={quoteattr('ro_' + str(doc_id))}>"
        + "".join(ro_entries)
        + "</OrderedGroup></ReadingOrder>"
        + "".join(body)
        + "</Page></PcGts>"
    ).encode("utf-8")
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": "\n".join(parts),
        "lang": lang,
    }


def gen_corpus_table(start: int, count: int, seed: int = 42) -> pa.Table:
    """Rows [start, start+count) of the adversarial corpus as one table."""
    rows = [gen_doc(i, seed) for i in range(start, start + count)]
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


# -- 3. general-HTML pages (boilerplate-strip testbed) ----------------------

PARA_WORDS = 40
MIN_PARA_CHARS = 40  # must equal BoilerplateStripper.min_content_chars


def html_page_from_words(doc_id: int, words: list[str]) -> tuple[bytes, str]:
    """Deterministic general-HTML page whose main content is the doc's
    words in <p> paragraphs of PARA_WORDS, wrapped in boilerplate (nav,
    link-soup div, footer, script). Ground truth is SQL-expressible:
    main_text = paragraphs with length >= MIN_PARA_CHARS joined by \\n
    (middle paragraphs are always long enough; only the last can drop).
    """
    paras = [
        " ".join(words[i : i + PARA_WORDS])
        for i in range(0, len(words), PARA_WORDS)
    ]
    body = "".join(f"<p>{escape(p)}</p>" for p in paras)
    links = " ".join(
        f'<a href="/cat/{doc_id}/{j}">category link number {j}</a>'
        for j in range(6)
    )
    html = (
        "<!DOCTYPE html><html><head><script>var t=1;</script>"
        f"<title>doc {doc_id}</title></head><body>"
        '<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
        f'<div class="content">{body}</div>'
        f'<div class="links">{links}</div>'
        "<footer>&#169; example.com</footer></body></html>"
    ).encode("utf-8")
    expected = "\n".join(p for p in paras if len(p) >= MIN_PARA_CHARS)
    return html, expected


def html_pages_batch_from_documents(batch: pa.Table) -> pa.Table:
    """map_batches body: documents batch → general-HTML pages batch."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls, tss, htmls, gts = [], [], [], []
    for doc_id, text in zip(doc_ids, texts):
        html, gt = html_page_from_words(doc_id, text.split(" "))
        urls.append(url_for(doc_id))
        tss.append(ts_for(doc_id))
        htmls.append(html)
        gts.append(gt)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(gts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
