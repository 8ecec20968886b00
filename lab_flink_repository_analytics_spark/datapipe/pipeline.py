"""End-to-end pretraining-data pipeline: the composed batch job a user
runs nightly, built ENTIRELY from this package's operators —

  1. curate    — quality / repetition / exact-dup / contamination gate
                 (curation.py::curation_outcomes, first-failing-rule
                 attribution)
  2. split     — leakage-safe train/valid/test assignment keyed on the
                 near-dup CLUSTER id (graph.py connected components over
                 MinHash-LSH candidates + sampling.deterministic_split),
                 so near-duplicates never straddle splits
  3. chunk     — fixed-token context windows with overlap
                 (text.py::chunk_documents, row-local)
  4. pack      — chunks binned to ~capacity-token training sequences per
                 (split, shard) via a window cumsum (the sequence-packing
                 shape; shard = salted doc hash, reshard-stable)
  5. write     — parquet partitioned by split + a JSON manifest of
                 per-stage counts

Scale shape: the corpus text is scanned once per stage family (curation
metrics fuse into one pass; chunking is row-local over the kept slice);
the only corpus-scale shuffles are the ones the constituent operators
already document (content-hash election, LSH band join, CC rounds, the
per-(split, shard) packing window).  Manifest counts are bounded
aggregates — #rules + #splits + two scalars — not data collects.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lab_flink_repository_analytics_spark.datapipe import curation
from lab_flink_repository_analytics_spark.datapipe import dedup as DD
from lab_flink_repository_analytics_spark.datapipe import graph, sampling
from lab_flink_repository_analytics_spark.datapipe import text as TX

#: packing capacity (tokens per training sequence) and shard fan-out
#: defaults sized for the fixtures; production = context length and
#: O(#output files)
DEFAULT_CAPACITY = 256
DEFAULT_SHARDS = 4


def leakage_safe_split(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``docs`` plus a ``split`` column keyed on the near-dup cluster id."""
    pairs = DD.near_dup_candidates(docs, text_col=text_col, id_col=id_col).select(
        "id_a", "id_b"
    )
    labels = graph.connected_components(
        pairs, src="id_a", dst="id_b", nodes=docs.select(id_col), node_col=id_col
    ).select(F.col("node").alias(id_col), F.col("component").alias("cluster_id"))
    assigned = sampling.deterministic_split(labels, "cluster_id").select(
        id_col, "cluster_id", "split"
    )
    return docs.join(assigned, id_col)


def pack_chunks(
    chunks: DataFrame,
    capacity: int = DEFAULT_CAPACITY,
    n_shards: int = DEFAULT_SHARDS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each chunk a (shard, bin) so bins hold ~``capacity`` tokens.

    Concat-then-split binning (the sequence-packing shape): within each
    (split, shard) the chunks are laid out in deterministic (doc, chunk)
    order and cut every ``capacity`` tokens by cumulative offset — one
    window per (split, shard), reshard-stable because the shard is a
    salted hash of the doc id."""
    shard = F.pmod(
        TX.md5_hash32(F.concat(F.lit("shard"), F.col(id_col).cast("string"))),
        F.lit(n_shards),
    ).cast("int")
    w = (
        Window.partitionBy("split", "shard")
        .orderBy(id_col, "chunk_index")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        chunks.withColumn("shard", shard)
        .withColumn(
            "bin",
            (
                F.coalesce(F.sum("n_chunk_tokens").over(w), F.lit(0))
                / capacity
            ).cast("bigint"),
        )
    )


def run_pretraining_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    eval_set: DataFrame,
    out_dir: str,
    chunk_tokens: int = 64,
    overlap: int = 8,
    capacity: int = DEFAULT_CAPACITY,
    n_shards: int = DEFAULT_SHARDS,
) -> dict:
    """Run curate → split → chunk → pack → write; returns the manifest.

    Output layout: ``{out_dir}/chunks/split=.../*.parquet`` (columns
    doc_id, chunk_index, n_chunk_tokens, chunk, shard, bin) and
    ``{out_dir}/manifest.json``.
    """
    from lab_flink_repository_analytics_spark.session import persist_bounded

    # one curation pass feeds both the manifest counts and the kept slice
    outcomes = persist_bounded(
        curation.curation_outcomes(docs, eval_set), "pipeline.outcomes"
    )
    drop_counts = {
        r["outcome"]: r["n"]
        for r in outcomes.groupBy("outcome")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = outcomes.filter(F.col("outcome") == "kept").select(*docs.columns)

    with_split = leakage_safe_split(kept)
    chunks = TX.chunk_documents(
        with_split.select("doc_id", "text"), chunk_tokens, overlap
    ).join(with_split.select("doc_id", "split"), "doc_id")
    packed = pack_chunks(chunks, capacity=capacity, n_shards=n_shards)

    chunks_dir = os.path.join(out_dir, "chunks")
    packed.write.mode("overwrite").partitionBy("split").parquet(chunks_dir)

    written = spark.read.parquet(chunks_dir)
    split_counts = {
        r["split"]: {"chunks": r["chunks"], "bins": r["bins"], "tokens": r["tokens"]}
        for r in written.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("chunks"),
            F.countDistinct("shard", "bin").alias("bins"),
            F.sum("n_chunk_tokens").alias("tokens"),
        )
        .collect()
    }
    manifest = {
        # attribution partitions the corpus, so the rule counts ARE the
        # input count — no separate scan
        "input_docs": sum(drop_counts.values()),
        "dropped": {k: v for k, v in drop_counts.items() if k != "kept"},
        "kept_docs": drop_counts.get("kept", 0),
        "chunk_tokens": chunk_tokens,
        "overlap": overlap,
        "capacity": capacity,
        "n_shards": n_shards,
        "splits": split_counts,
        "chunks_dir": chunks_dir,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def incremental_ingest(
    spark: SparkSession,
    new_docs: DataFrame,
    ledger_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Nightly-batch ingestion against a content-fingerprint ledger: admit
    only documents whose md5 fingerprint has never been seen — WITHOUT
    rescanning the existing corpus.

    The ledger is a parquet table of (fp, keep_id) — one row per distinct
    content ever admitted.  A new batch:

      1. dedups WITHIN the batch (min-id keeper per fingerprint);
      2. anti-joins the ledger on fp — at 100 TB this is a join of
         batch-size vs ledger-size keyed on the fingerprint hash; with the
         ledger bucketed by fp (io/bucketing.py) the big side never
         shuffles, and Spark's runtime bloom filter prunes most ledger
         row groups for a small batch;
      3. appends the admitted fingerprints to the ledger — the corpus
         itself is immutable-append, the ledger is the only mutable state
         (bounded: one row per distinct content).

    Returns {"batch": n, "admitted": n, "dup_in_batch": n, "dup_vs_ledger": n}.
    Idempotent per content: replaying a batch admits nothing new.
    """
    from pyspark.errors import AnalysisException

    from lab_flink_repository_analytics_spark.session import persist_bounded

    # NULL text gets a sentinel so md5 never yields a NULL key (a NULL fp
    # would silently drop the row from every equi-join and misreport it)
    fp = F.md5(F.coalesce(F.col(text_col), F.lit("\u0000<null>")))
    # one batch scan: per-fingerprint multiplicity + keeper election is
    # the only state the ledger protocol needs
    per_fp = persist_bounded(
        new_docs.select(fp.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("keep_id")),
        "pipeline.ingest_fp",
    )
    totals = per_fp.agg(
        F.sum("cnt").cast("bigint").alias("n_batch"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    ).first()
    n_batch, n_batch_kept = totals["n_batch"] or 0, totals["n_kept"]
    try:
        ledger = spark.read.parquet(ledger_dir).select("fp")
        admitted = per_fp.join(ledger, "fp", "left_anti")
    except AnalysisException:  # first batch: ledger path does not exist yet
        admitted = per_fp
    # materialize BEFORE appending: the anti-join reads the same ledger
    # path the append writes to, so the count and the write must come from
    # ONE computed result — a lineage-carrying plan re-executed by the
    # write (or a task retry) could re-list the destination mid-append.
    # The checkpoint also collapses count + write into a single scan.
    admitted = admitted.select("fp", "keep_id").localCheckpoint(eager=True)
    n_admitted = admitted.count()
    admitted.write.mode("append").parquet(ledger_dir)
    return {
        "batch": n_batch,
        "admitted": n_admitted,
        "dup_in_batch": n_batch - n_batch_kept,
        "dup_vs_ledger": n_batch_kept - n_admitted,
    }
