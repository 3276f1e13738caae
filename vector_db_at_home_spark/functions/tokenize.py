"""The engine's ONE shared tokenizer (VERDICT r7 task 4).

Every text operator historically split on single spaces — deliberate
(cross-engine exact, and the synthetic corpus is space-separated), but
on real corpora "word." ≠ "word" inflates vocabulary and weakens every
dedup/retrieval/BPE result.  This helper gives the four token consumers
(``textstats``, ``tfidf``, ``invindex``, ``bpe``) a common opt-in
``tokenize_mode``:

- ``"space"`` (default everywhere — behavior unchanged): ``split(col,
  ' ')``.  Note split KEEPS empty strings around doubled separators;
  callers that filter them keep doing so.
- ``"regex"``: ``regexp_extract_all(col, '[A-Za-z0-9]+')`` — word
  pieces only, punctuation and whitespace runs dropped, never an empty
  token.

Cross-engine constraint (why the pattern is frozen here): the regex
must mean the same thing to Spark's Java regex engine and DuckDB's RE2
(the oracle side).  ``[A-Za-z0-9]+`` uses only literal character
classes — no ``\\w``/``\\b`` (Unicode-dependent), no lookarounds (RE2
lacks them), no case-insensitive flags (collation-dependent) — the same
discipline as ``textstats.BPEISH_PATTERN`` and the PII patterns, both
oracle-proven.  Callers wanting case folding apply ``lower()``
themselves (exactly where they already do for space mode).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The one cross-engine word pattern (see module docstring).
TOKEN_REGEX = "[A-Za-z0-9]+"

MODES = ("space", "regex")


def tokens_col(col: Column, mode: str = "space") -> Column:
    """Array-of-tokens column for ``mode`` (see module docstring)."""
    if mode == "space":
        return F.split(col, " ")
    if mode == "regex":
        return F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0)
    raise ValueError(f"tokenize_mode must be one of {MODES}, got {mode!r}")


def tokens_py(text: str, mode: str = "space") -> list[str]:
    """Driver-side twin of :func:`tokens_col` — for phrase/query strings
    that must tokenize exactly like the indexed corpus."""
    if mode == "space":
        return text.split(" ")
    if mode == "regex":
        import re

        return re.findall(TOKEN_REGEX, text)
    raise ValueError(f"tokenize_mode must be one of {MODES}, got {mode!r}")


def normalize_query_terms(terms: list[str], mode: str = "space") -> list[str]:
    """Query-term normalization shared by the corpus-scan AND
    indexed retrieval paths (ADVICE r9): each raw term lowercases and
    tokenizes under ``mode`` exactly like the corpus, so a term
    containing a space or punctuation (e.g. ``'foo bar'``, or
    ``'foo-bar'`` in regex mode) expands to the SAME token list
    everywhere — previously the corpus-scan BM25/RRF matched such a
    term verbatim (never hitting any corpus token) while the indexed
    path split it, breaking the advertised bit-identical parity.
    Single-word alphanumeric terms are unchanged under both modes."""
    out: list[str] = []
    for raw in terms:
        out.extend(t for t in tokens_py(raw.lower(), mode) if t)
    return out
