"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All native column expressions (JVM, codegen) — these run over every
document at corpus scale, so no Python may appear in the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-ratio
# language heuristic. Deliberately small: the heuristic's shape (score
# per language via token overlap, argmax) is what matters at scale.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"],
    "es": ["el", "la", "los", "que", "de", "es", "un", "una", "por", "con"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punct boundaries (a cheap BPE proxy for cost
    estimation before real tokenization)."""
    pieces = F.split(F.trim(text), r"\s+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=\d)|(?<=\d)(?=[A-Za-z])")
    return F.size(F.filter(pieces, lambda p: F.length(p) > 0))


def punct_ratio(text: Column) -> Column:
    n = F.greatest(F.length(text), F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    return punct / n


def digit_ratio(text: Column) -> Column:
    n = F.greatest(F.length(text), F.lit(1))
    return F.length(F.regexp_replace(text, r"[^0-9]", "")) / n


def stopword_ratio(tokens: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(tokens), F.lit(1))


def quality_score(text: Column, tokens: Column) -> Column:
    """Composite [0,1] doc-quality heuristic: length band + low punct /
    digit density + stopword presence. Mirrors common web-corpus
    filtering rules (C4/Gopher-style) as pure column algebra."""
    n_tok = F.size(tokens)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.2))
    mean_tok_len = F.length(text) / F.greatest(n_tok, F.lit(1))
    tok_len_ok = F.when((mean_tok_len >= 2) & (mean_tok_len <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    p_ok = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    d_ok = F.lit(1.0) - F.least(digit_ratio(text) * 4, F.lit(1.0))
    return (len_ok * 0.3 + tok_len_ok * 0.2 + p_ok * 0.25 + d_ok * 0.25)


LANG_PRIORITY = ["en", "de", "es", "fr"]  # tie-break order (fixed, documented)


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Count of tokens (with multiplicity) found in lang's stopword list."""
    sw_arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(sw_arr, t)))


def language_id(tokens: Column) -> Column:
    """Heuristic language id: argmax over per-language stopword hit
    counts with a fixed priority tie-break (LANG_PRIORITY order);
    'und' when nothing matches. Expressed as a >=-chain so the exact
    semantics are reproducible in plain SQL."""
    hits = {lang: stopword_hits(tokens, lang) for lang in LANG_PRIORITY}
    result = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        cond = hits[lang] > 0
        for o in LANG_PRIORITY:
            if o == lang:
                continue
            # strict > for higher-priority langs listed before `lang`,
            # >= for those after — equivalent to first-match in priority order
            cond = cond & (
                (hits[lang] > hits[o])
                if LANG_PRIORITY.index(o) < LANG_PRIORITY.index(lang)
                else (hits[lang] >= hits[o])
            )
        result = F.when(cond, F.lit(lang)).otherwise(result)
    return result


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 hex of the
    whitespace-normalized, lowercased text. (md5 chosen over xxhash64
    so the DuckDB oracle can reproduce it bit-for-bit.)"""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def rolling_fingerprints(tokens: Column, window: int = 8, hash_mode: str = "xxhash64") -> Column:
    """Rolling window fingerprints (array<bigint>): hash of each
    w-token window — the building block for fuzzy containment /
    plagiarism-style matching. Docs shorter than the window yield []
    (Spark's sequence(1, 0) is DESCENDING [1, 0], so the previously
    unguarded index range crashed on short docs with an invalid
    slice(start=0) — round-3 fix, CASE WHEN branches evaluate lazily).

    hash_mode='md5': md5-derived 60-bit fingerprints (hashing.md5_long)
    so a DuckDB oracle can replay the windows bit-for-bit."""
    from entity_resolution_spark.functions.hashing import md5_long

    n = F.size(tokens)
    idx = F.when(n >= window, F.sequence(F.lit(1), n - (window - 1))).otherwise(
        F.array().cast("array<int>")
    )

    def h(c: Column) -> Column:
        return md5_long(c) if hash_mode == "md5" else F.xxhash64(c)

    return F.transform(idx, lambda i: h(F.concat_ws(" ", F.slice(tokens, i, window))))


# PII patterns, deliberately restricted to syntax BOTH Java regex
# (Spark) and RE2 (DuckDB oracle) implement identically: no
# lookarounds, no backreferences. Applied email -> ip -> phone (an
# already-redacted token can never re-match a later pattern).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and US-style phone numbers with
    <EMAIL> / <IP> / <PHONE> placeholders — the scrub every
    web-crawl-to-training-data pipeline runs before tokenization.
    Pure regexp_replace chain: JVM-side, zero shuffle, and the
    restricted pattern syntax keeps it SQL-oracle-replayable."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IP_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> list[Column]:
    """Match counts [n_emails, n_ips, n_phones] on the RAW text —
    audit metrics for redaction coverage dashboards."""
    return [
        F.regexp_count(text, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(text, F.lit(PII_IP_RE)).alias("n_ips"),
        F.regexp_count(text, F.lit(PII_PHONE_RE)).alias("n_phones"),
    ]


# Unicode scripts recognized by script_counts / dominant_script, in
# fixed tie-break priority order (first listed wins ties — same
# documented-determinism contract as LANG_PRIORITY). Java regex spells
# the property \p{IsHan}; RE2 (DuckDB and most SQL engines) spells it
# \p{Han} — both are the same Unicode Script property, so an oracle
# replays these counts with the RE2 spelling.
SCRIPT_PRIORITY = [
    "Latin", "Cyrillic", "Greek", "Arabic", "Han",
    "Hiragana", "Katakana", "Hangul", "Devanagari",
]


def script_count(text: Column, script: str) -> Column:
    """Number of characters of one Unicode script in `text` — strip
    everything NOT in the script, count what's left. Pure JVM regexp,
    zero shuffle."""
    if script not in SCRIPT_PRIORITY:
        raise ValueError(f"script_count: unknown script {script!r}")
    kept = F.regexp_replace(text, f"[^\\p{{Is{script}}}]", "")
    return F.coalesce(F.length(kept), F.lit(0)).alias(f"n_{script.lower()}")


def dominant_script(text: Column) -> Column:
    """Argmax over SCRIPT_PRIORITY character counts with the fixed
    priority tie-break; 'und' when no recognized script appears.
    Multilingual corpus construction filters/stratifies on this before
    (or alongside) stopword language-ID, which only covers Latin-script
    languages."""
    counts = {s: script_count(text, s) for s in SCRIPT_PRIORITY}
    result = F.lit("und")
    for script in reversed(SCRIPT_PRIORITY):
        cond = counts[script] > 0
        for o in SCRIPT_PRIORITY:
            if o == script:
                continue
            cond = cond & (
                (counts[script] > counts[o])
                if SCRIPT_PRIORITY.index(o) < SCRIPT_PRIORITY.index(script)
                else (counts[script] >= counts[o])
            )
        result = F.when(cond, F.lit(script.lower())).otherwise(result)
    return result
