"""Streaming incremental-crawl document ingest: the end-to-end loop the
batch pieces of this round compose into — per micro-batch of crawled
documents, drop near-duplicates of everything ALREADY KEPT (the
persisted MinHash model), drop in-batch near-duplicates, append the
survivors to the corpus store, and append THEIR signatures to the
model so the next batch dedups against them.

This is the continuously-crawled-store shape the batch operators
document individually (`minhash_fit` / `cross_corpus_dedup(model=…)` /
`minhash_update`), driven by Structured Streaming: ``foreachBatch``
gives every micro-batch the full batch writer, and the model is
APPEND-ONLY parquet of integer signature rows — no read-modify-write
cycle, so a model read never races its own update.

Exactly-once: a replayed epoch re-appends survivors and signatures.
The model-side dedup is self-match-immune (a replayed document matching
its own stored signature is filtered by id before the drop decision),
and the store read path dedups by document id (ANY_WINS) — the same
absorb-duplicates-on-read contract the metrics store carries
(streaming/ingest.py:start_ingest_bucketed docstring).

Reference tie-in: the reference's ingest-time series-id dedup
(TimeSeriesIdFieldMapper) is the metrics analog of this content-level
gate; the reference has no document tier — this extends its
dedup-at-write idea to the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from time_series_db_spark.pipeline import dedup

#: crawl drop schema: one JSON doc per line
DOC_SCHEMA = "doc_id LONG, text STRING, source STRING"


def _model_nonempty(spark: SparkSession, model_path: str) -> bool:
    """True when the accumulated model parquet exists and has rows.

    Only a missing path (the first-ever batch, before anything was
    appended) maps to False.  Every OTHER read failure — corrupt
    footer, permission error, schema-inference failure — propagates:
    treating those as "no model yet" would silently skip cross-batch
    dedup and permanently append near-duplicates; failing the
    micro-batch instead makes Structured Streaming replay the epoch
    once the store is healthy again.
    """
    from pyspark.errors import AnalysisException

    try:
        return bool(spark.read.parquet(model_path).take(1))
    except AnalysisException as exc:
        cond = None
        for probe in ("getCondition", "getErrorClass"):
            fn = getattr(exc, probe, None)
            if fn is not None:
                try:
                    cond = fn()
                except Exception:  # noqa: BLE001 - probe only
                    cond = None
                if cond:
                    break
        if cond == "PATH_NOT_FOUND" or (
            cond is None and "PATH_NOT_FOUND" in str(exc)
        ):
            return False
        raise


def ingest_doc_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    model_path: str,
    threshold: float = 0.8,
) -> None:
    """One micro-batch of the incremental-crawl loop (shared by the
    streaming commit and batch backfills):

    1. drop batch docs near-duplicating the ACCUMULATED model
       (``cross_corpus_dedup(model=…)`` — the reference side pays no
       text scan; self-id matches are ignored so epoch replays cannot
       drop a document against its own stored signature);
    2. drop in-batch near-duplicates — survivors are resolved per
       CONNECTED COMPONENT of the in-batch near-dup graph (min id over
       the component), the same semantics as the batch
       :func:`~time_series_db_spark.pipeline.dedup.dedup_survivors`
       operator.  Note the inherent cluster-collapse property: in a
       chain 1~2, 2~3 (1 not similar to 3) only doc 1 survives, so a
       transitively-dropped doc may have no near-dup among the
       survivors — one canonical doc per similarity cluster is the
       contract, not pairwise-cover;
    3. append survivors to the corpus store and their signatures to
       the model.

    Per-batch cost scales with the BATCH — and the batch text is
    hashed exactly ONCE: the signature table feeds the model-side
    dedup, the in-batch dedup AND the model append (before this, each
    of the three stages re-shingled and re-hashed the text — the
    hot-path 3× caught in review).  Never touches the accumulated
    corpus.
    """
    from time_series_db_spark.cache import persist_tracked

    batch = persist_tracked(batch)
    sigs = persist_tracked(dedup.minhash_signatures(batch))
    if _model_nonempty(spark, model_path):
        model = spark.read.parquet(model_path)
        flags = dedup.cross_corpus_dedup(
            model=model, threshold=threshold, incoming_sigs=sigs
        ).filter(F.col("ref_id") != F.col("doc_id"))
        kept = batch.join(flags.select("doc_id"), "doc_id", "left_anti")
    else:
        kept = batch
    # in-batch survivors over the SAME signature table: verified
    # near-dup pairs -> connected components -> keep the component-min
    # id (identical to the batch dedup_survivors contract; a plain
    # "drop if any smaller-id neighbor" rule keeps LOCAL minima, which
    # diverges from the batch operator on chains like 1~3~2)
    sigs_kept = sigs.join(kept.select("doc_id"), "doc_id", "left_semi")
    pairs = dedup.jaccard_verify(
        dedup.lsh_candidate_pairs(sigs_kept), sigs_kept
    ).filter(F.col("jaccard") >= F.lit(float(threshold)))
    kept = persist_tracked(dedup.dedup_survivors(kept, pairs))
    kept.write.mode("append").parquet(store_path)
    sigs.join(kept.select("doc_id"), "doc_id", "left_semi").write.mode(
        "append"
    ).parquet(model_path)


def read_corpus(spark: SparkSession, store_path: str) -> DataFrame:
    """Store read path: ANY_WINS by document id — absorbs the
    duplicate appends an epoch replay can produce (the store-side half
    of the exactly-once contract).  The winner is picked as ONE whole
    row (min over a struct of the remaining columns — lexicographic,
    deterministic): per-column mins would stitch a frankenstein row
    from two different appends of the same id (re-crawled content that
    no longer near-matches its own stored signature IS kept by design,
    so same-id rows with different content are a legal store state)."""
    docs = spark.read.parquet(store_path)
    other = [c for c in docs.columns if c != "doc_id"]
    return (
        docs.groupBy("doc_id")
        .agg(F.min(F.struct(*other)).alias("__row"))
        .select("doc_id", *[F.col(f"__row.{c}").alias(c) for c in other])
    )


def start_doc_ingest(
    spark: SparkSession,
    source_dir: str,
    store_path: str,
    model_path: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuous crawl ingest: watch ``source_dir`` for JSON document
    drops and run :func:`ingest_doc_batch` per micro-batch."""
    raw = spark.readStream.schema(DOC_SCHEMA).json(source_dir)

    def _commit(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_doc_batch(
            spark, batch_df, store_path, model_path, threshold
        )

    writer = (
        raw.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
