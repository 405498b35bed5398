"""Post-extraction curation over the documents table — the step between
"extracted" and "training-ready" that every crawl pipeline runs.

Operates on the EXTRACTION OUTPUT schema (operators/extract.
DOCUMENTS_SCHEMA: url / passage_idx / content / error / …), unlike the
dedup operators over the analytics ``documents`` fixture (doc_id / text) —
the two schemas meet real pipelines at different stages, so both surfaces
exist.

One configurable pass:

* quarantine rows dropped (``error`` non-null) — they were kept through
  extraction so accounting sees them, but never enter a corpus;
* optional length gate (``min_chars``) and script-based language filter
  (the JVM CASE expression from operators/text_analysis);
* exact passage dedup on ``sha2(content, 256)`` — same 32-byte-key design
  as ``dedup.exact_dedup`` (the wide content column is never a shuffle
  key); the canonical survivor is the lexicographically smallest
  ``(url, passage_idx)``, deterministic at any parallelism.

Returns ``(curated_df, stats_plan)`` — stats is a 1-row DataFrame counting
what each stage removed (materialize it once; it shares the curated plan's
lineage up to the scan).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _script_of(content_col) -> "F.Column":
    # the SAME expression object as operators.text_analysis (one definition,
    # cannot drift from the detect_script oracle)
    from document_automation_spark.operators.text_analysis import script_case_expr

    return script_case_expr(content_col)


def curate_extracted(
    documents: DataFrame,
    min_chars: Optional[int] = None,
    scripts: Optional[Sequence[str]] = None,
    drop_exact_dups: bool = True,
) -> Tuple[DataFrame, DataFrame]:
    """Curate extraction output into a training-ready passages table.

    Cost: TWO actions total — one flag aggregation over the input for the
    per-stage counters (not one count() per stage) and one count of the
    deduped output; at corpus scale callers should persist ``documents``
    if they also consume ``curated`` afterwards."""
    quarantined_f = F.col("error").isNotNull()
    gate_f = F.lit(False)
    if min_chars is not None:
        gate_f = gate_f | (F.length("content") < min_chars)
    if scripts is not None:
        gate_f = gate_f | ~_script_of(F.col("content")).isin(list(scripts))
    counts = documents.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(quarantined_f.cast("long")).alias("quarantined"),
        F.sum((~quarantined_f & gate_f).cast("long")).alias("gated"),
    ).first()
    total, n_quarantined, n_gated_out = (
        counts.total,
        counts.quarantined or 0,
        counts.gated or 0,
    )

    gated = documents.filter(~quarantined_f & ~gate_f)

    curated = gated
    if drop_exact_dups:
        keyed = gated.withColumn("_ck", F.sha2(F.col("content"), 256))
        keep = (
            keyed.groupBy("_ck")
            .agg(F.min(F.struct("url", "passage_idx")).alias("_keep"))
            .select(
                F.col("_ck"),
                F.col("_keep.url").alias("_ku"),
                F.col("_keep.passage_idx").alias("_kp"),
            )
        )
        curated = (
            keyed.join(
                keep,
                (keyed["_ck"] == keep["_ck"])
                & (keyed["url"] == keep["_ku"])
                & (keyed["passage_idx"] == keep["_kp"]),
                "left_semi",
            )
            .drop("_ck")
        )
    n_curated = curated.count()
    n_gated_in = total - n_quarantined - n_gated_out

    spark = documents.sparkSession
    stats = spark.createDataFrame(
        [
            (
                total,
                n_quarantined,
                n_gated_out,
                n_gated_in - n_curated,
                n_curated,
            )
        ],
        "rows_in long, quarantined long, gated long, deduped long, rows_out long",
    )
    return curated, stats
