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
