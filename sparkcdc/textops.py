"""Text-analysis operators for training-data pipelines over the
``documents`` table: token counting, language-ID heuristic, quality
scoring, document fingerprinting. All native Catalyst expressions —
per-row, deterministic, and expressible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

STOPWORDS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
}


def _occurrences(text, word):
    """# of occurrences of ' word ' in ' text ' — the portable
    length-difference trick (identical in Spark SQL and DuckDB)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" ")))) / (
        len(needle) - 1
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens_ws": F.size(F.split(F.trim(t), "\\s+")),
            "n_tokens_bpe": F.size(F.regexp_extract_all(t, F.lit(BPE_RE), F.lit(0))),
        }
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic: argmax of per-language
    stopword hit counts, ties broken by language-name order."""
    t = F.col(text_col)
    scores = {
        lang: sum([_occurrences(t, w) for w in words], F.lit(0.0))
        for lang, words in STOPWORDS.items()
    }
    ordered = sorted(scores)  # deterministic tiebreak
    best = F.lit(ordered[0])
    best_score = scores[ordered[0]]
    for lang in ordered[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return df.withColumn("lang_guess", F.when(best_score > 0, best).otherwise(F.lit("und")))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio,
    mean token length. Per-row arithmetic over exact ints — bit-stable
    across engines."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_ws = F.size(F.split(F.trim(t), "\\s+"))
    n_punct = F.size(F.regexp_extract_all(t, F.lit("[^A-Za-z0-9\\s]"), F.lit(0)))
    n_stop = sum(
        [_occurrences(t, w) for ws in STOPWORDS.values() for w in ws], F.lit(0.0)
    )
    return df.withColumns(
        {
            "n_chars_m": n_chars,
            "punct_ratio": n_punct / n_chars,
            "stopword_ratio": n_stop / n_ws,
            "mean_tok_len": (F.length(F.regexp_replace(t, "\\s+", "")) / n_ws),
        }
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (md5 is available & identical in Spark and DuckDB)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


# Gopher-style repetition filter thresholds (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", §A1.1 repetition rules), re-tuned so the
# keep/drop boundary bisects the synthetic corpus' observed distribution.
REPETITION_MAX_TOP_WORD_FRAC = 0.12
REPETITION_MAX_TOP_BIGRAM_FRAC = 0.10


def with_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition metrics: duplicate-word fraction, fraction of
    tokens in the most frequent word, and fraction covered by the most
    frequent word-bigram, plus the composed keep/drop decision.

    100 TB shape: everything is a per-row array-lambda expression over the
    split token array — NO explode, NO groupBy, zero shuffle; the whole
    operator pipelines inside the scan stage. Per-row cost is
    O(len·distinct) which is bounded by document length, not corpus size.
    Counts are exact ints; the fractions are single IEEE divisions, so the
    DuckDB oracle matches bit-for-bit.
    """
    ws = F.split(F.trim(F.col(text_col)), "\\s+")
    n = F.size(ws)
    uniq = F.array_distinct(ws)
    word_counts = F.transform(uniq, lambda u: F.size(F.filter(ws, lambda x: x == u)))
    # sequence(1, n-1) is DESCENDING for n < 2 in Spark — short-circuit the
    # one-word doc to an explicit empty array (same trap as decontam.py).
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(F.element_at(ws, i), F.lit(" "), F.element_at(ws, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bigram_counts = F.transform(
        F.array_distinct(bigrams), lambda b: F.size(F.filter(bigrams, lambda x: x == b))
    )
    top_word_frac = F.array_max(word_counts) * F.lit(1.0) / n
    top_bigram_frac = (
        F.coalesce(F.array_max(bigram_counts), F.lit(0)) * F.lit(2.0) / n
    )
    return df.withColumns(
        {
            "dup_word_frac": (n - F.size(uniq)) * F.lit(1.0) / n,
            "top_word_frac": top_word_frac,
            "top_bigram_frac": top_bigram_frac,
            "repetition_keep": (top_word_frac <= REPETITION_MAX_TOP_WORD_FRAC)
            & (top_bigram_frac <= REPETITION_MAX_TOP_BIGRAM_FRAC),
        }
    )


# PII redaction patterns — portable regex subset (no lookaround, no
# backrefs) so Java (Spark) and RE2 (DuckDB) agree match-for-match.
# Applied in order: email first (its local part can contain digits/dots
# that the later patterns would otherwise bite into).
PII_PATTERNS = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}\\b", "<PHONE>"),
]


def with_pii_redacted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub for training corpora: replace emails, IPv4 addresses and
    phone numbers with typed placeholders, and emit per-category match
    counts (for corpus-level PII-rate monitoring).

    Pure `regexp_replace` / `regexp_extract_all` — per-row, zero shuffle,
    whole-stage-codegen'd. Counts are taken BEFORE redaction so a category
    count never depends on the previous replacement's placeholder text;
    replacements then apply in PII_PATTERNS order.
    """
    t = F.col(text_col)
    counts = {
        f"n_{name}": F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        for name, pat, _ in PII_PATTERNS
    }
    red = t
    for _, pat, placeholder in PII_PATTERNS:
        red = F.regexp_replace(red, pat, placeholder)
    return df.withColumns({**counts, "text_redacted": red})
