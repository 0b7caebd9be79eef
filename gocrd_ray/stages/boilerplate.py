"""Main-content extraction from general HTML: boilerplate stripping via
text-density + tag-path heuristics (north_star M9; no reference analog —
gocrd stops at PAGE-XML, this is the CC-scale generalization).

Algorithm (densitometric, in the spirit of the published Boilerpipe
(Kohlschütter et al., WSDM 2010, "Boilerplate Detection using Shallow
Text Features") / CETD (Sun et al. 2011) line of work — shallow-feature
block classification):

1. Tokenize with stdlib ``html.parser.HTMLParser`` (lenient, never
   throws on real-world tag soup).
2. Segment character data into BLOCKS at block-level tag boundaries
   (p/div/h1../li/td/article/section/...); skip script/style/noscript
   /template subtrees entirely.
3. Per block compute shallow features: text length, link density
   (chars emitted under <a> / total chars), stopword-ish token ratio,
   tag path (e.g. ``body/div/p``).
4. Classify: a block is CONTENT if it has enough text, low link
   density, and does not sit under a nav/aside/footer/header/menu
   path. Short blocks between two content blocks are absorbed
   (the classic local-context smoothing rule).
5. ``main_text`` = content blocks joined by "\\n" — same join rule as
   the PAGE-XML doc_text contract, with (block_idx, start, end) spans.

The stage is an actor-pool class: the tag sets / thresholds compile
once per actor; ``__call__`` is pure per batch. Deterministic — same
bytes, same output, no models.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li td th blockquote pre article section "
    "main figure figcaption dd dt br tr ul ol table body "
    "nav aside footer header form".split()  # block-level; flushing at their
    # boundaries also makes tag_path carry them for classification
)
SKIP_SUBTREE = frozenset("script style noscript template svg head".split())
BOILERPLATE_PATH = frozenset("nav aside footer header menu form button".split())

BLOCK_SCHEMA = pa.struct(
    [
        ("block_idx", pa.int32()),
        ("tag_path", pa.string()),
        ("text", pa.string()),
        ("n_chars", pa.int32()),
        ("n_link_chars", pa.int32()),
        ("is_content", pa.bool_()),
    ]
)

HTML_EXTRACT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("main_text", pa.string()),
        ("spans", pa.list_(pa.struct([
            ("block_idx", pa.int32()),
            ("start", pa.int64()),
            ("end", pa.int64()),
        ]))),
        ("n_blocks", pa.int32()),
        ("n_content_blocks", pa.int32()),
        ("error", pa.string()),
    ]
)


class _BlockSink:
    """The block/link state machine, independent of the tokenizer that
    feeds it (stdlib HTMLParser or the fast regex scanner below)."""

    def _init_blocks(self):
        self.stack: list[str] = []
        self.skip_depth = 0
        self.link_depth = 0
        self.blocks: list[dict] = []
        self.links: list[str] = []  # href targets, document order
        self._buf: list[str] = []
        self._link_chars = 0
        self._path_at_open = ""

    def _flush(self):
        text = "".join(self._buf)
        stripped = " ".join(text.split())
        if stripped:
            self.blocks.append(
                {
                    "tag_path": self._path_at_open or "/".join(self.stack[-3:]),
                    "text": stripped,
                    "n_chars": len(stripped),
                    "n_link_chars": min(self._link_chars, len(stripped)),
                }
            )
        self._buf = []
        self._link_chars = 0
        self._path_at_open = "/".join(self.stack[-3:])

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in SKIP_SUBTREE:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag == "a":
            self.link_depth += 1
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
                    break
        if tag in BLOCK_TAGS:
            self._flush()
        self.stack.append(tag)
        if tag in BLOCK_TAGS:
            self._path_at_open = "/".join(self.stack[-3:])

    def handle_endtag(self, tag):
        tag = tag.lower()
        if tag in SKIP_SUBTREE:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i] == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if self.skip_depth or not data:
            return
        self._buf.append(data)
        if self.link_depth:
            self._link_chars += len(" ".join(data.split()))


class _BlockParser(_BlockSink, HTMLParser):
    """stdlib-HTMLParser-driven tokenizer (the reference behavior the
    fast scanner is parity-tested against). _BlockSink must precede
    HTMLParser in the MRO — HTMLParser defines no-op handle_* stubs."""

    def __init__(self):
        HTMLParser.__init__(self, convert_charrefs=True)
        self._init_blocks()


import re as _re

# CPython html.parser's own tolerant tokenizers, reused verbatim so the
# self-closing decision below is bit-identical to parse_starttag's: an
# unquoted attribute value greedily eats a trailing '/' (so
# <a href=http://x.com/> is a NORMAL start tag), while a '/' left over
# after attribute tokenization makes the tag self-closing (<br/>).
from html.parser import attrfind_tolerant as _ATTRFIND
from html.parser import tagfind_tolerant as _TAGFIND

# one pass over the byte stream: every '<'-construct the stdlib parser
# recognizes, matched in C. Attribute soup inside a tag is consumed by
# the quoted-string-aware attr tail.
_START_RE = _re.compile(
    r"<([a-zA-Z][^\s/>]*)"  # tag name
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)"  # attr soup (quote-aware)
    r">",
    _re.DOTALL,
)
_END_RE = _re.compile(r"</([a-zA-Z][^\s>/]*)[^>]*>", _re.DOTALL)
_HREF_RE = _re.compile(
    r"""[hH][rR][eE][fF]\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]*))"""
)


class _FastBlockScanner(_BlockSink):
    """Regex tokenizer with the stdlib parser's observable behavior for
    this sink: same blocks, same links (parity-pinned by
    tests/test_boilerplate.py fuzz + corpus equality). ~5x faster than
    html.parser because tag scanning happens inside the C regex engine
    instead of Python-per-token callbacks.
    """

    def __init__(self):
        self._init_blocks()

    def scan(self, text: str):
        from html import unescape

        pos = 0
        n = len(text)
        find = text.find

        def recover(lt: int) -> int:
            # stdlib close() behavior for a construct that never
            # completes: swallow through the next '>' as literal data
            # (tags inside are NOT parsed), else a lone '<'
            gt = find(">", lt + 1)
            if gt >= 0:
                self.handle_data(text[lt : gt + 1])
                return gt + 1
            self.handle_data("<")
            return lt + 1

        while pos < n:
            lt = find("<", pos)
            if lt < 0:
                data = text[pos:]
                self.handle_data(unescape(data) if "&" in data else data)
                break
            if lt > pos:
                data = text[pos:lt]
                self.handle_data(unescape(data) if "&" in data else data)
            nxt = text[lt + 1 : lt + 2]
            if nxt == "!":
                if text.startswith("<!--", lt):
                    end = find("-->", lt + 4)
                    pos = recover(lt) if end < 0 else end + 3
                elif text.startswith("<![", lt):
                    end = find("]]>", lt + 3)  # marked section <![CDATA[..]]>
                    pos = recover(lt) if end < 0 else end + 3
                else:
                    end = find(">", lt + 2)  # <!DOCTYPE etc.
                    pos = recover(lt) if end < 0 else end + 1
                continue
            if nxt == "?":
                end = find(">", lt + 2)  # processing instruction
                pos = recover(lt) if end < 0 else end + 1
                continue
            if nxt == "/":
                m = _END_RE.match(text, lt)
                if m:
                    self.handle_endtag(m.group(1).lower())
                    pos = m.end()
                else:
                    end = find(">", lt + 2)  # bogus comment: </>, </3...
                    pos = recover(lt) if end < 0 else end + 1
                continue
            m = _START_RE.match(text, lt)
            if m is None:
                if nxt.isalpha():
                    pos = recover(lt)  # truncated/unterminated start tag
                else:
                    self.handle_data("<")  # '<' opening no construct
                    pos = lt + 1
                continue
            tag = m.group(1).lower()
            attrs_s = m.group(2)
            endpos = m.end()
            # replicate parse_starttag's leftover rule with the stdlib's
            # own regexes: tokenize name + attrs, then the stripped
            # remainder decides — '>' normal, '/>' self-closing, junk
            # falls back to literal data (html.parser ~parse_starttag)
            k = _TAGFIND.match(text, lt + 1).end()
            while k < endpos - 1:
                am = _ATTRFIND.match(text, k)
                if not am:
                    break
                k = am.end()
            leftover = text[k:endpos].strip()
            if leftover not in (">", "/>"):
                self.handle_data(text[lt:endpos])
                pos = endpos
                continue
            attrs: list = []
            if tag == "a" and "href" in attrs_s.lower():
                hm = _HREF_RE.search(attrs_s)
                if hm:
                    v = hm.group(2) or hm.group(3) or hm.group(4) or ""
                    attrs = [("href", unescape(v) if "&" in v else v)]
            self.handle_starttag(tag, attrs)
            pos = endpos
            if leftover == "/>":
                self.handle_endtag(tag)  # self-closing <br/>
            elif tag in ("script", "style"):
                # CDATA content model: raw text until the matching
                # close tag; no tags/entities inside
                cm = _re.compile(f"</{tag}", _re.IGNORECASE).search(text, pos)
                if cm is None:
                    pos = n  # unterminated: rest is (skipped) content
                else:
                    em = _END_RE.match(text, cm.start())
                    self.handle_endtag(tag)
                    pos = em.end() if em else n


class BoilerplateStripper:
    """Actor-pool map_batches stage: (url, html) → HTML_EXTRACT_SCHEMA.

    Thresholds compile once per actor; tune per corpus.
    """

    def __init__(
        self,
        min_content_chars: int = 40,
        max_link_density: float = 0.33,
        absorb_gap_chars: int = 15,
        engine: str = "fast",
    ):
        self.min_content_chars = min_content_chars
        self.max_link_density = max_link_density
        self.absorb_gap_chars = absorb_gap_chars
        self.engine = engine  # "fast" (regex scanner) | "stdlib"

    def extract_doc(self, html: bytes) -> dict:
        try:
            text = html.decode("utf-8", errors="replace")
            if self.engine == "fast":
                p = _FastBlockScanner()
                p.scan(text)
            else:
                p = _BlockParser()
                p.feed(text)
                p.close()
            p._flush()
        except Exception as e:  # parsers are lenient; belt-and-braces
            return {
                "main_text": None,
                "spans": None,
                "n_blocks": 0,
                "n_content_blocks": 0,
                "error": f"parse: {e}",
            }
        blocks = p.blocks
        flags = []
        for b in blocks:
            path_tags = set(b["tag_path"].split("/"))
            dense_enough = b["n_chars"] >= self.min_content_chars
            link_ok = (
                b["n_link_chars"] / b["n_chars"] <= self.max_link_density
                if b["n_chars"]
                else False
            )
            in_boiler = bool(path_tags & BOILERPLATE_PATH)
            flags.append(dense_enough and link_ok and not in_boiler)
        # local-context smoothing: short non-content between two content
        # blocks is absorbed (captions, inline headers)
        for i in range(1, len(blocks) - 1):
            if (
                not flags[i]
                and flags[i - 1]
                and flags[i + 1]
                and blocks[i]["n_chars"] <= self.absorb_gap_chars * 4
                and not (set(blocks[i]["tag_path"].split("/")) & BOILERPLATE_PATH)
            ):
                flags[i] = True
        parts, spans = [], []
        off = 0
        for i, (b, f) in enumerate(zip(blocks, flags)):
            if not f:
                continue
            if parts:
                off += 1
            spans.append({"block_idx": i, "start": off, "end": off + b["n_chars"]})
            off += b["n_chars"]
            parts.append(b["text"])
        return {
            "main_text": "\n".join(parts),
            "spans": spans,
            "n_blocks": len(blocks),
            "n_content_blocks": len(parts),
            "error": None,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        rows = [self.extract_doc(h or b"") for h in htmls]
        return pa.table(
            {
                "url": batch.column("url"),
                "main_text": pa.array([r["main_text"] for r in rows], pa.string()),
                "spans": pa.array(
                    [r["spans"] for r in rows],
                    HTML_EXTRACT_SCHEMA.field("spans").type,
                ),
                "n_blocks": pa.array([r["n_blocks"] for r in rows], pa.int32()),
                "n_content_blocks": pa.array(
                    [r["n_content_blocks"] for r in rows], pa.int32()
                ),
                "error": pa.array([r["error"] for r in rows], pa.string()),
            }
        ).cast(HTML_EXTRACT_SCHEMA)


def strip_boilerplate(pages_ds, *, concurrency=(1, 8), **thresholds):
    """pages Dataset (url, html) → main-content Dataset."""
    return pages_ds.map_batches(
        BoilerplateStripper,
        fn_constructor_kwargs=thresholds,
        batch_format="pyarrow",
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """Link harvesting: (url, target, link_seq) for every <a href> in
    document order (script/style subtrees excluded) — the outlink table
    a crawl-graph pipeline builds from."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out_u, out_t, out_s = [], [], []
    for u, h in zip(urls, htmls):
        p = _FastBlockScanner()
        try:
            p.scan((h or b"").decode("utf-8", errors="replace"))
        except Exception:
            continue
        for i, t in enumerate(p.links):
            out_u.append(u)
            out_t.append(t)
            out_s.append(i)
    return pa.table(
        {
            "url": pa.array(out_u, pa.string()),
            "target": pa.array(out_t, pa.string()),
            "link_seq": pa.array(out_s, pa.int64()),
        }
    )


def extract_links(pages_ds, **kwargs):
    return pages_ds.map_batches(
        extract_links_batch, batch_format="pyarrow", **kwargs
    )


# anchor harvesting: href + inner text in one pass. Inner markup is
# stripped (tags removed, whitespace collapsed) but entities are kept
# verbatim — a regex-level contract, same altitude as the link scanner.
_ANCHOR_RE = _re.compile(
    r'<a\b[^>]*\bhref="([^"]*)"[^>]*>(.*?)</a>', _re.DOTALL | _re.IGNORECASE
)
_TAG_STRIP_RE = _re.compile(r"<[^>]*>")
_WS_RE = _re.compile(r"\s+")


def extract_anchors_batch(batch: pa.Table) -> pa.Table:
    """(url, target, anchor) for every ``<a href>`` — the link table
    WITH its anchor text, the raw input of anchor-text aggregation."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out_u, out_t, out_a = [], [], []
    for u, h in zip(urls, htmls):
        s = (h or b"").decode("utf-8", errors="replace")
        for m in _ANCHOR_RE.finditer(s):
            out_u.append(u)
            out_t.append(m.group(1))
            out_a.append(
                _WS_RE.sub(" ", _TAG_STRIP_RE.sub("", m.group(2))).strip()
            )
    return pa.table(
        {
            "url": pa.array(out_u, pa.string()),
            "target": pa.array(out_t, pa.string()),
            "anchor": pa.array(out_a, pa.string()),
        }
    )


def anchor_stats(pages_ds, **kwargs):
    """Per-target anchor-text aggregation — the web-graph signal table
    (how a page is DESCRIBED by pages linking to it: inlink count,
    anchor vocabulary size, majority anchor).

    Scale shape: the per-occurrence anchor stream collapses to
    per-block DISTINCT ``(target, anchor)`` partial counts inside
    ``map_batches`` (the "Home"-on-every-page hot pair costs one row
    per block), then ONE narrow ``groupby(target, anchor).sum``
    shuffle; the final per-target fold follows the ``_bucket_pairs``
    sharding discipline — one ``map_groups`` callback per HASH SHARD
    of targets (n_shards bounded, never one per target) with the
    per-target run folds fully vectorized inside, so 10^9 distinct
    targets cost 10^9 numpy-run rows, not 10^9 Python callbacks.
    Per-target work is bounded by the target's anchor VOCABULARY,
    never by inlink count.

    Output: (target, n_inlinks, n_anchors, top_anchor) where
    top_anchor is the most frequent anchor, ties broken ascending.
    """
    import numpy as np
    import pyarrow.compute as pc

    anchors = pages_ds.map_batches(
        extract_anchors_batch, batch_format="pyarrow", **kwargs
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"target": b.column("target"), "anchor": b.column("anchor")})
        part = pa.TableGroupBy(t, ["target", "anchor"]).aggregate(
            [([], "count_all")]
        )
        return part.rename_columns(["target", "anchor", "n"])

    counted = (
        anchors.map_batches(partial, batch_format="pyarrow")
        .groupby(["target", "anchor"])
        .sum("n")
    )
    n_shards = 256

    def shard(b: pa.Table) -> pa.Table:
        # same vectorized bucket assignment as join._bucket_of: one
        # pandas hash_array call over the string keys, no per-row Python
        import pandas as pd

        col = b.column("target")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = pd.util.hash_array(np.asarray(col, dtype=object), categorize=False)
        sh = pa.array((h % n_shards).astype(np.int64), pa.int64())
        return b.append_column("__shard", sh)

    def fold_shard(group: pa.Table) -> pa.Table:
        tgt = np.asarray(group.column("target").to_pylist(), dtype=object)
        anc = np.asarray(group.column("anchor").to_pylist(), dtype=object)
        n = group.column("sum(n)").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # per-target runs ordered (n desc, anchor asc): first of each
        # run is the top anchor; reduceat folds sums and counts
        order = np.lexsort((anc, -n, tgt))
        ts, ns = tgt[order], n[order]
        first = np.r_[True, ts[1:] != ts[:-1]]
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(ns, starts)
        lens = np.diff(np.r_[starts, len(ts)])
        keep = order[starts]
        return pa.table({
            "target": pa.array(tgt[keep], pa.string()),
            "n_inlinks": pa.array(sums, pa.int64()),
            "n_anchors": pa.array(lens.astype(np.int64), pa.int64()),
            "top_anchor": pa.array(anc[keep], pa.string()),
        })

    return (
        counted.map_batches(shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(fold_shard, batch_format="pyarrow")
    )
