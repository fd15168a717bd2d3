"""Text-analysis operators for training-data pipelines (driver extras):
token counting, quality scoring, language-ID heuristic, bottom-k document
fingerprints. All pure ``pyspark.sql.functions`` (JVM-side, codegen'd) —
no Python UDFs — and each has an ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic stopword votes per language (heuristic language-ID).
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "la", "que"],
    "fr": ["le", "la", "et"],
    "zh": ["的", "是", "了"],
}

PUNCT_CLASS = r"[.,;:!?]"


def _token_count_col(text: str):
    """Whitespace token count; empty/blank → 0."""
    return F.when(
        F.length(F.trim(F.col(text))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text)), r"\s+")))


def with_token_count(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", _token_count_col(text))


def with_quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Deterministic quality features + composite score:
    punct ratio, mean token length, stopword ratio (en markers)."""
    n_tok = _token_count_col(text)
    n_chars = F.length(F.col(text))
    punct = n_chars - F.length(F.regexp_replace(F.col(text), PUNCT_CLASS, ""))
    stop = sum(
        (
            F.size(F.split(F.concat(F.lit(" "), F.col(text), F.lit(" ")),
                           f" {w} ")) - 1
            for w in LANG_MARKERS["en"]
        ),
        F.lit(0),
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn(
            "punct_ratio",
            F.round(punct / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "mean_token_len",
            F.round(
                (n_chars - F.greatest(n_tok - 1, F.lit(0)))
                / F.greatest(n_tok, F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "stopword_ratio",
            F.round(stop / F.greatest(n_tok, F.lit(1)), 6),
        )
        .withColumn(
            "quality_score",
            F.round(
                F.least(F.col("stopword_ratio") * 2, F.lit(1.0)) * 0.4
                + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.3
                + F.least(n_tok / 100.0, F.lit(1.0)) * 0.3,
                6,
            ),
        )
    )


def with_lang_pred(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-vote language ID; ties broken by language order (sorted);
    zero votes → 'unknown'."""
    padded = F.concat(F.lit(" "), F.col(text), F.lit(" "))
    scores = {
        lang: sum(
            (F.size(F.split(padded, f" {w} ")) - 1 for w in words),
            F.lit(0),
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("unknown")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn("lang_pred", pred)


def token_hash_col():
    """Shared 32-bit token hash: int of first 8 md5 hex chars — identical
    in Spark (conv) and DuckDB (('0x'||substr(md5(t),1,8))::BIGINT)."""
    return lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")


def doc_fingerprint(df: DataFrame, text: str = "text", k: int = 8,
                    id_col: str = "doc_id") -> DataFrame:
    """Bottom-k sketch fingerprint: the k smallest 32-bit token hashes per
    document — an order-insensitive near-dup fingerprint (bottom-k minwise
    sketch; same family as the reference's per-block hash index)."""
    h = token_hash_col()
    toks = F.array_distinct(F.split(F.trim(F.col(text)), r"\s+"))
    hashes = F.transform(toks, h)
    return df.select(
        F.col(id_col),
        F.slice(F.array_sort(hashes), 1, k).alias("fingerprint"),
    ).where(F.length(F.trim(F.col(text))) > 0)
