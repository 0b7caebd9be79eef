"""Scalar kits (SURVEY.md §2.8): coordinate parsing, bbox reduction,
span arithmetic, url helpers — vectorized where Arrow kernels exist.

The per-row forms live in extract.py's hot path; these are the reusable/
testable equivalents plus vectorized variants for standalone columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..oracle import PolygonError, bbox, parse_points

__all__ = ["parse_points", "bbox", "PolygonError", "bbox_of_coords_column",
           "host_of_url", "spans_cover", "span_slice", "url_parts",
           "canonicalize_urls", "domain_suffix_hits",
           "suffix_blocklist_filter"]


def bbox_of_coords_column(coords: pa.Array) -> pa.Array:
    """list<struct{x,y}> column → struct{x0,y0,x1,y1} column, vectorized.

    Null coords → null bbox (reference: polygon error, SURVEY §2.12.9).
    """
    if isinstance(coords, pa.ChunkedArray):
        coords = coords.combine_chunks()
    flat = pc.list_flatten(coords)
    parents = pc.list_parent_indices(coords).to_numpy(zero_copy_only=False)
    xs = pc.struct_field(flat, "x").to_numpy(zero_copy_only=False)
    ys = pc.struct_field(flat, "y").to_numpy(zero_copy_only=False)
    n = len(coords)
    x0 = np.full(n, np.iinfo(np.int64).max)
    y0 = np.full(n, np.iinfo(np.int64).max)
    x1 = np.full(n, np.iinfo(np.int64).min)
    y1 = np.full(n, np.iinfo(np.int64).min)
    np.minimum.at(x0, parents, xs)
    np.minimum.at(y0, parents, ys)
    np.maximum.at(x1, parents, xs)
    np.maximum.at(y1, parents, ys)
    lengths = pc.list_value_length(coords).to_numpy(zero_copy_only=False)
    valid = ~np.isnan(np.where(np.isnan(lengths), np.nan, lengths)) & (
        np.nan_to_num(lengths, nan=0) > 0
    )
    def arr(v):
        return pa.array(
            [int(x) if ok else None for x, ok in zip(v, valid)], pa.int32()
        )
    return pa.StructArray.from_arrays(
        [arr(x0), arr(y0), arr(x1), arr(y1)],
        names=["x0", "y0", "x1", "y1"],
        mask=pa.array([not ok for ok in valid]),  # null/empty coords → null bbox
    )


def host_of_url(urls: pa.Array) -> pa.Array:
    """Vectorized authority extraction: 'scheme://host/…' → host."""
    return pc.struct_field(
        pc.extract_regex(urls, r"^[a-z]+://(?P<host>[^/]+)/"), "host"
    )


_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#:]+)"
    r"(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"
)


def url_parts(urls: pa.Array) -> pa.StructArray:
    """Vectorized URL decomposition: struct<scheme, host, port, path,
    query, fragment> (one C-regex pass; non-matching rows → null)."""
    return pc.extract_regex(urls, _URL_RE)


_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def canonicalize_urls(urls: pa.Array) -> pa.Array:
    """Canonical URL form for dedup keys: scheme+host lowercased,
    default port stripped, fragment dropped, empty path → '/', query
    parameters sorted ('?b=2&a=1' == '?a=1&b=2'). Rows that don't parse
    as absolute URLs pass through unchanged (never lose a key).

    Scheme/host/fragment work is vectorized Arrow kernels; only the
    rare query-string sort is per-row Python.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = url_parts(urls)
    valid = pc.is_valid(parts).to_pylist()
    rows = parts.to_pylist()
    out: list = []
    for i in range(len(urls)):
        raw = urls[i].as_py()
        if not valid[i] or raw is None:
            out.append(raw)
            continue
        p = rows[i]
        scheme = p["scheme"].lower()
        host = p["host"].lower()
        port = p["port"]
        path = p["path"] or "/"
        query = p["query"]
        u = scheme + "://" + host
        if port and port != _DEFAULT_PORTS.get(scheme):
            u += ":" + port
        u += path
        if query:
            u += "?" + "&".join(sorted(query.split("&")))
        out.append(u)
    return pa.array(out, pa.string())


def spans_cover(text: str, spans: list[dict]) -> bool:
    """Invariant check: spans tile doc_text with single-\\n separators
    (SURVEY §2.12.10)."""
    if not spans:
        return text == ""
    if spans[0]["start"] != 0 or spans[-1]["end"] != len(text):
        return False
    for prev, cur in zip(spans, spans[1:]):
        if cur["start"] != prev["end"] + 1:
            return False
        if text[prev["end"]] != "\n":
            return False
    return True


def span_slice(text: str, span: dict) -> str:
    """The region text a span denotes — byte-exact."""
    return text[span["start"] : span["end"]]


def domain_suffix_hits(hosts, blocked: set[str],
                       max_labels: int = 127) -> pa.Array:
    """Boolean mask: host is blocked under DOMAIN-SUFFIX semantics
    (UT1 / Pi-hole style blocklists): ``example.com`` in the list
    blocks ``example.com`` AND every subdomain (``a.b.example.com``)
    — never substrings (``notexample.com`` stays clean).

    Fully vectorized: the host column is tested against the set, then
    the leading label is stripped with ONE RE2 kernel per depth
    (``^[^.]*\\.`` → the parent domain) and re-tested — one ``is_in``
    pass per distinct depth PRESENT IN THE BATCH (the loop exits as
    soon as nothing strips), each O(batch). Rows whose strip produced
    no change (no dot left) are masked out of the re-test so a bare
    TLD is never matched at the wrong depth. Null hosts → not blocked.
    ``max_labels`` (default 127, the DNS label bound) is a safety
    valve, not a truncation: if hosts are still stripping at the cap
    the kernel raises instead of letting deeper-nested hosts silently
    evade the blocklist.

    The broadcast ``is_in`` value-set is right to ~10^7 entries; a
    10^9-entry blocklist swaps the set for Bloom bits + the exact
    verify of ``bloom.bloom_blocklist_filter_ds`` — the suffix
    EXPANSION (this kernel chain) is unchanged.
    """
    cur = pc.fill_null(pc.cast(hosts, pa.string()), "")
    if isinstance(cur, pa.ChunkedArray):
        cur = cur.combine_chunks()
    value_set = pa.array(sorted(blocked), pa.string())
    hit = pc.is_in(cur, value_set=value_set)
    for depth in range(max_labels):
        nxt = pc.replace_substring_regex(
            cur, pattern=r"^[^.]*\.", replacement="", max_replacements=1
        )
        stripped = pc.not_equal(nxt, cur)
        if not pc.any(stripped).as_py():
            break
        if depth == max_labels - 1:
            raise ValueError(
                f"domain_suffix_hits: hosts still nested after "
                f"{max_labels} label strips — raise max_labels (DNS "
                "caps labels at 127) instead of letting deep hosts "
                "evade the blocklist"
            )
        hit = pc.or_(hit, pc.and_(stripped, pc.is_in(nxt, value_set=value_set)))
        cur = nxt
    return hit


def suffix_blocklist_filter(ds, blocked: set[str], host_col: str = "host",
                            max_labels: int = 127):
    """Drop rows whose ``host_col`` falls under a blocked domain suffix
    (see ``domain_suffix_hits``) — the crawl-pipeline domain-exclusion
    stage with registrable-domain semantics (one ``example.com`` entry
    kills every mirror subdomain). Pure streaming map, zero shuffle."""

    def keep(b: pa.Table) -> pa.Table:
        mask = domain_suffix_hits(b.column(host_col), blocked,
                                  max_labels=max_labels)
        return b.filter(pc.invert(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
