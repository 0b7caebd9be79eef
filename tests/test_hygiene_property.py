"""Property tests for the text-hygiene stages (decontam n-grams, PII
redaction, normalization) against INDEPENDENT pure-Python references
(`re` with re.ASCII to match RE2's ASCII \\s and \\b, `unicodedata` for
NFC). The SQL-parity suite pins engine == DuckDB; these pin both
against a third implementation on arbitrary generated text."""

import re
import unicodedata

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from gocrd_ray.stages import decontam
from gocrd_ray.stages.pii import PATTERNS, redact_batch
from gocrd_ray.stages.text_stats import (
    NORM_CTRL_RE,
    NORM_WS_RE,
    normalize_batch,
)

# alphabet exercising the interesting classes: ascii letters/digits,
# PII glue (@ . + -), whitespace kinds, controls, unicode incl. a
# combining char (NFC-relevant) and non-ascii whitespace (RE2-vs-
# Python-\s divergence trap)
ALPHA = "ab1. @+-_\t\n\r\x01\x1f\xa0éaͤſ!"
texts = st.lists(st.text(alphabet=ALPHA, max_size=40), min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_normalize_matches_python_reference(ts):
    out = normalize_batch(
        pa.table({"doc_id": list(range(len(ts))), "text": ts})
    )
    for i, t in enumerate(ts):
        ref = unicodedata.normalize("NFC", t)
        ref = re.sub(NORM_CTRL_RE, "", ref)
        ref = re.sub(NORM_WS_RE, " ", ref, flags=re.ASCII)
        ref = ref.strip(" ")
        assert out.column("text_norm")[i].as_py() == ref
        assert out.column("n_chars_before")[i].as_py() == len(t)
        assert out.column("n_chars_after")[i].as_py() == len(ref)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_pii_redaction_matches_python_reference(ts):
    out = redact_batch(
        pa.table({"doc_id": list(range(len(ts))), "text": ts})
    )
    for i, t in enumerate(ts):
        ref = t
        counts = {}
        for name, pat, repl in PATTERNS:
            counts[name] = len(re.findall(pat, ref, flags=re.ASCII))
            ref = re.sub(pat, repl, ref, flags=re.ASCII)
        assert out.column("text_redacted")[i].as_py() == ref, (t, ref)
        for name, _, _ in PATTERNS:
            assert out.column(f"n_{name}")[i].as_py() == counts[name], (
                t, name
            )


@settings(max_examples=150, deadline=None)
@given(texts, st.integers(min_value=1, max_value=4))
def test_token_ngrams_match_python_reference(ts, n):
    grams, parents = decontam._token_ngrams(pa.array(ts, pa.string()), n)
    got = list(zip(parents.tolist(), grams.to_pylist()))
    want = []
    for i, t in enumerate(ts):
        toks = t.split(" ")  # keeps empties, like Arrow split_pattern
        for j in range(len(toks) - n + 1):
            want.append((i, " ".join(toks[j : j + n])))
    assert got == want
