"""End-to-end corpus curation: the composed keep/drop decision an LLM
training-data pipeline applies per document, built entirely from this
package's operators:

  1. quality      — too short / too low type-token ratio
                    (text.py::quality_metrics)
  2. repetition   — Gopher-style duplicate-bigram fraction
                    (text.py::repetition_metrics_df)
  3. duplicate    — exact-dedup keeper election (min doc id per md5)
  4. contaminated — n-gram overlap with the eval set
                    (decontaminate.py::ngram_overlap)

Rules are evaluated in that order; the first failing rule names the
outcome (``kept`` when none fail), so every document gets exactly one
attribution and the per-reason counts sum to the corpus size.

Scale shape: three per-doc metric frames each reduce to one row per doc
before the id-keyed joins, the dedup election is one hash-partition by
content fingerprint, and the contamination join broadcasts the eval grams
— nothing in the composition shuffles the raw text more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.datapipe import decontaminate
from lab_flink_repository_analytics_spark.datapipe import text as TX

#: Default thresholds (tuned for the synthetic corpus; production values
#: are corpus-specific knobs).
MIN_TOKENS = 5
MIN_DISTINCT_RATIO = 0.3
MAX_DUP_BIGRAM_FRACTION = 0.9
MAX_CONTAMINATION_RATIO = 0.2


def curation_outcomes(
    docs: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
) -> DataFrame:
    """All ``docs`` columns plus an ``outcome`` label per document.

    ``eval_set`` is the benchmark slice (subset of ``docs`` by id); eval
    documents are excluded from the contamination *training* side and can
    only be dropped by the content rules.
    """
    # per-row quality metrics AND the duplicate-bigram fraction ride along
    # in the dedup-election frame: the window only partitions by content
    # hash, so the projections cost no extra scan or join.  The repetition
    # rule only reads dup_bigram_fraction = 1 − distinct/total bigrams,
    # which is ROW-LOCAL over the codegen lookahead-capture bigram array
    # (size + array_distinct) — computing it here instead of joining
    # text.repetition_metrics_df removes that branch's corpus scan, two
    # Generates, two two-level aggregations and an id-keyed join from the
    # composition (round-10, guide §2.3/§2.4; the full metrics frame still
    # serves callers that need top_word_fraction).  Same values as the
    # exploded form: total = size, distinct = size∘array_distinct, and a
    # doc with no bigrams reports 0.0 exactly like the old
    # coalesce-after-left-join — which also matches the oracle twin's
    # documents-LEFT JOIN-bstat shape for token-less docs.
    bigrams = F.regexp_extract_all(
        F.col(text_col), F.lit("(?:^| )(?=([^ ]+ [^ ]+))"), 1
    )
    n_bg = F.size(bigrams)
    dup_frac = F.when(
        n_bg > 0,
        F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / n_bg,
    ).otherwise(F.lit(0.0))
    base = docs.select(
        *docs.columns,
        TX.quality_metrics(text_col).alias("qm"),
        dup_frac.alias("dup_bigram_fraction"),
        F.min(id_col)
        .over(Window.partitionBy(F.md5(F.col(text_col))))
        .alias("keep_id"),
    ).select(
        *docs.columns,
        F.col("qm.n_tokens").alias("n_tokens"),
        F.col("qm.distinct_ratio").alias("distinct_ratio"),
        "dup_bigram_fraction",
        "keep_id",
    )
    train = docs.join(eval_set.select(id_col), id_col, "left_anti")
    cont = decontaminate.ngram_overlap(
        train, eval_set, text_col, id_col, ngram
    ).select(id_col, "contamination_ratio")

    joined = base.join(cont, id_col, "left")
    outcome = (
        F.when(
            (F.col("n_tokens") < MIN_TOKENS)
            | (F.col("distinct_ratio") < MIN_DISTINCT_RATIO),
            F.lit("quality"),
        )
        .when(
            F.col("dup_bigram_fraction") > MAX_DUP_BIGRAM_FRACTION,
            F.lit("repetition"),
        )
        .when(F.col(id_col) != F.col("keep_id"), F.lit("duplicate"))
        .when(
            F.coalesce(F.col("contamination_ratio"), F.lit(0.0))
            > MAX_CONTAMINATION_RATIO,
            F.lit("contaminated"),
        )
        .otherwise(F.lit("kept"))
    )
    return joined.select(*docs.columns, outcome.alias("outcome"))


def curation_summary(
    docs: DataFrame,
    eval_set: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
) -> DataFrame:
    """Per-group outcome counts: ``(group, outcome, n)``."""
    out = curation_outcomes(docs, eval_set, text_col, id_col, ngram)
    return out.groupBy(group_col, "outcome").agg(F.count(F.lit(1)).alias("n"))
