"""Text-analysis column functions for training-data pipelines: tokenization,
shingling, quality stats, language-ID heuristics, fingerprinting.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen-friendly);
no Python UDFs in any hot path. Regex patterns are kept in the common subset
of Java regex / RE2 so oracle engines compute identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from tdataframe_spark.functions.numeric import portable_hash64

# BPE-ish word/number/punct tokenizer pattern (Java+RE2-compatible)
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def words(text: Column | str) -> Column:
    """Whitespace tokenization (single-space convention of the corpus)."""
    return F.split(_c(text), " ")


def n_words(text: Column | str) -> Column:
    return F.size(words(text))


def n_tokens(text: Column | str) -> Column:
    """Token count under the BPE-ish regex tokenizer."""
    return F.regexp_count(_c(text), F.lit(TOKEN_PATTERN))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> (JVM-side:
    sequence + transform + array_join; no explode until the caller asks)."""
    w = words(text)
    # guard: sequence(0, k) DESCENDS for k < 0, so short docs must yield []
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
    ).otherwise(F.expr("array()").cast("array<int>"))
    sh = F.transform(
        idx, lambda i: F.array_join(F.slice(w, i + 1, n), " ")
    )
    return F.array_distinct(sh)


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    """All word n-grams in order, duplicates kept (unlike ``word_shingles``
    which is the distinct set) — the per-document frequency view that
    repetition-quality signals need. JVM-side sequence+transform."""
    w = words(text)
    idx = F.when(
        F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(w, i + 1, n), " "))


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data hygiene)
#
# Patterns live in the Java-regex ∩ RE2 subset so DuckDB (RE2) computes the
# same matches; insertion order IS the redaction order (emails first — they
# contain dotted/numeric substrings the later patterns could split).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    "ipv4": ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    "phone": ("[0-9]{2,3}-[0-9]{3,4}-[0-9]{3,4}(-[0-9]{4})?", "<PHONE>"),
}


def count_pii(text: Column | str, kinds: list[str] | None = None) -> Column:
    """Total PII matches in the ORIGINAL text (sum over pattern kinds)."""
    t = _c(text)
    out = F.lit(0)
    for kind in kinds or list(PII_PATTERNS):
        out = out + F.regexp_count(t, F.lit(PII_PATTERNS[kind][0]))
    return out.cast("long")


def redact_pii(
    text: Column | str, kinds: list[str] | None = None
) -> Column:
    """Replace every PII match with its kind token (``<EMAIL>`` etc.),
    chained in ``PII_PATTERNS`` order. Pure ``regexp_replace`` — JVM-side,
    streaming-safe, and exactly reproducible in any RE2/PCRE engine."""
    out = _c(text)
    for kind in kinds or list(PII_PATTERNS):
        pat, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, token)
    return out


def _marker_hits(text: Column | str, markers: list[str]) -> Column:
    """Exact marker-word occurrence count: word-split membership test.
    (A ' (m) ' regex undercounts ADJACENT markers — each match consumes
    the shared space, so 'the the the' counted 2 of 3.)"""
    return F.size(
        F.filter(
            words(F.lower(_c(text))),
            lambda w: w.isin([m.lower() for m in markers]),
        )
    )


def stopword_ratio(text: Column | str, markers: list[str]) -> Column:
    """(# marker-word occurrences) / (# words); exact word matching."""
    hits = _marker_hits(text, markers)
    return hits.cast("double") / F.greatest(n_words(text), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Cheap document-quality heuristic in [0,1]: penalize very short docs,
    high punctuation density, and single-char words."""
    t = _c(text)
    nw = n_words(t).cast("double")
    npunct = F.regexp_count(t, F.lit("[^A-Za-z0-9 ]")).cast("double")
    nchar = F.length(t).cast("double")
    len_score = F.least(nw / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(npunct / F.greatest(nchar, F.lit(1.0)) * 5, F.lit(1.0))
    return F.round((len_score + punct_score) / 2, 6)


def fingerprint64(text: Column | str) -> Column:
    """Order-invariant-normalized document fingerprint: lowercase, collapse
    whitespace, 60-bit portable hash (cross-engine reproducible)."""
    norm = F.regexp_replace(F.lower(_c(text)), "\\s+", " ")
    return portable_hash64(F.trim(norm))


def lang_guess(text: Column | str) -> Column:
    """Heuristic language ID: argmax of marker-stopword ratios, 'und' when
    no marker hits. Deterministic CASE cascade (ties broken by fixed
    language order en>es>fr>de)."""
    scores = {
        lang: _marker_hits(text, m) for lang, m in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties in the final CASE cascade
    for lang in reversed(list(scores)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr
