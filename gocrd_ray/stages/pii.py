"""PII redaction: mask emails / IPv4 addresses / phone-like digit runs
and count what was masked — the standard privacy pass of a web-scale
training-data pipeline (e.g. the C4 and RefinedWeb cleanups).

Pure per-row streaming map, no shuffle at any scale; all regex work is
RE2 inside Arrow C++ kernels (`count_substring_regex` /
`replace_substring_regex`). DuckDB also uses RE2, so the SQL mirror is
bit-exact on both the redacted TEXT and the counts — the same pattern
strings are shared between engine and oracle via PATTERNS below.

Passes run in a fixed order (email → ipv4 → phone) because later
patterns must see earlier replacements (a masked email leaves no
digits for the phone pass to over-match).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — order matters, see module docstring.
# ipv4 requires valid octets (0-255) so version strings like 10.20.30.999
# stay untouched; phone requires the NANP 3-3-4 grouping WITH separators
# (optional +CC), so ISO dates (4-2-2), year lists (4-4-4) and bare digit
# runs are not destroyed — international formats without that grouping are
# deliberately out of scope and documented, not silently approximated.
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b" + _OCTET + r"(?:\." + _OCTET + r"){3}\b", "[IP]"),
    ("phone",
     r"(?:\+\d{1,2}[ \-])?\(?\d{3}\)?[ \-]\d{3}[ \-]\d{4}\b",
     "[PHONE]"),
)


def redact_batch(batch: pa.Table, *, text_col: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """(id, text_redacted, n_email, n_ipv4, n_phone) for one batch."""
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    counts = {}
    for name, pat, repl in PATTERNS:
        counts[name] = pc.cast(
            pc.count_substring_regex(txt, pat), pa.int64()
        )
        txt = pc.replace_substring_regex(txt, pat, repl)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "text_redacted": txt,
            **{f"n_{name}": counts[name] for name, _, _ in PATTERNS},
        }
    )


def redact_pii(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Streaming PII redaction over a documents/pages Dataset."""
    return ds.map_batches(
        lambda b: redact_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
