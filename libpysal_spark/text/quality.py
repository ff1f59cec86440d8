"""Text analysis: language-ID, quality scoring, token stats, fingerprints.

Training-data pipeline primitives over the corpus table, all expressed as
native column expressions (regexp + arithmetic) — whole-stage codegen, no
Python, trivially 100 TB-scan-shaped (embarrassingly parallel projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libpysal_spark.text.dedup import tokens
from libpysal_spark.tiling import ensure_min_parallelism

# tiny public stopword seeds per language (heuristic language-ID)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
    "it": ["il", "che", "di", "la", "per"],
}


def _marker_count(text_col: str, words: list[str]) -> F.Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    c = F.regexp_count(F.lower(F.col(text_col)), F.lit(pat))
    return c.cast("long")


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax of stopword-marker hits.

    Deterministic tie-break: lexicographically smallest language code.
    """
    scores = [(_marker_count(text_col, ws)).alias(f"score_{lg}") for lg, ws in LANG_MARKERS.items()]
    df = ensure_min_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"), *scores
    )
    pairs = F.array(
        *[
            F.struct((-F.col(f"score_{lg}")).alias("neg"), F.lit(lg).alias("lang"))
            for lg in LANG_MARKERS
        ]
    )
    best = F.array_sort(pairs)[0]
    return df.select(
        "doc_id",
        best["lang"].alias("lang_pred"),
        (-best["neg"]).cast("long").alias("lang_score"),
    )


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len)."""
    toks = tokens(text_col)
    return ensure_min_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        (F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
         / F.size(toks)).alias("avg_token_len"),
    )


BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_stats_bpe(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens, bytes_per_token).

    The BPE-ish count splits alpha runs / single digits / punctuation like a
    byte-pair-encoded vocabulary's pre-tokenizer (GPT-2-style regex class
    structure, public) — the standard budget estimator for LLM training-data
    pipelines; a pure regexp projection, scan-shaped.
    """
    ws = tokens(text_col)
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH)).cast("long")
    return ensure_min_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        F.size(ws).cast("long").alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (F.length(text_col) / F.greatest(bpe, F.lit(1))).alias("bytes_per_token"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stopword_ratio, punct_ratio, uniq_ratio, quality).

    Length / punctuation / stopword heuristics (Gopher/C4-style rules, public):
    quality = clamped combination, in [0, 1].
    """
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("double")
    stop = _marker_count(text_col, LANG_MARKERS["en"]).cast("double")
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("double")
    chars = F.length(text_col).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    stop_ratio = stop / n_tok
    punct_ratio = punct / chars
    uniq_ratio = uniq / n_tok
    quality = F.least(
        F.greatest(
            F.lit(0.0),
            F.lit(0.4) * F.least(stop_ratio * 5, F.lit(1.0))
            + F.lit(0.3) * uniq_ratio
            + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))),
        ),
        F.lit(1.0),
    )
    return ensure_min_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        quality.alias("quality"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): md5 of the sorted distinct lowercase token set —
    the classic key-collision / OpenRefine fingerprint for fuzzy dedup."""
    toks = F.array_sort(F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")))
    return ensure_min_parallelism(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.concat_ws(" ", toks)).alias("fingerprint"),
    )
