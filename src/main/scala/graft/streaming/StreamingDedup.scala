package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate detection: the streaming
  * counterpart of `ops.Dedup`'s batch LSH, for dedup-at-ingest (drop a
  * document the moment it arrives if something near-identical was already
  * admitted).
  *
  * Two pieces:
  *  1. `bandedSignatures` — per-row banded minhash signatures computed
  *     entirely in array-land column algebra (shingle → hash → 16
  *     permutation minima → 8 two-row bands), NO explode-shuffle: the same
  *     expression works on a batch frame and a streaming micro-batch, and
  *     on a stream it keeps the stateless prefix of the plan shuffle-free.
  *  2. `nearDupHits` — keyed state per (band, bsig) bucket via
  *     `flatMapGroupsWithState`: the first document to claim a bucket owns
  *     it; any later arrival in the same bucket emits a (doc, dup_of)
  *     candidate hit. State per bucket is ONE long (the owner id) — at
  *     100 TB the state store holds one entry per distinct band signature,
  *     which is bounded by corpus size × 8, and can be aged out with a
  *     processing-time timeout where the dedup horizon is finite.
  *
  * A hit is a CANDIDATE (same guarantee as batch LSH): callers verify with
  * exact Jaccard on the candidate pair if false positives matter.
  * Permutation constants match ops.Dedup (FNV-1a 64 id space, so this is
  * the production/fast variant — same ids as `dedup_minhash_fast`, whose
  * DuckDB oracle therefore also pins this path's signature function).
  */
object StreamingDedup {
  private val P = 2147483647L // 2^31-1

  case class DupHit(doc_id: Long, dup_of: Long)

  /** (doc_id, band, bsig) — one row per band per doc; everything up to the
    * explode is per-row narrow algebra. */
  def bandedSignatures(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      // fused shingle→distinct→FNV-1a-id kernel (ShingleIdsExpr), same
      // ids as the batch pipelines' fast path
      .withColumn("sids", expr("shingle_sids_fnv(w, 3)"))
      // all 16 permutation minima in ONE fused codegen'd pass
      // (graft.functions.MinHash16Expr) — the 16-HOF spelling ran
      // interpreted and materialized 16 arrays per row
      .select(col("doc_id"), expr("minhash16(sids)").as("mh"))
      .select(col("doc_id"), explode(array((0 until 8).map(j =>
        struct(lit(j).as("band"),
          (col("mh")(2 * j) * P + col("mh")(2 * j + 1)).as("bsig"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
  }

  /** Streaming SPAN-LEVEL near-dup candidate hits — winnowing at ingest:
    * each arriving doc is fingerprinted by the fused `winnow_fps` kernel
    * (pure per-row algebra + one narrow explode — no shuffle, no
    * streaming state; the declarative window spelling cannot run on a
    * stream at all) and probed against the STORED posting index, passed
    * in as a static (fp, doc_id) frame — the stream-static equi-join,
    * zero state like IngestFilters' domain gate. Emits one row per
    * shared fingerprint (doc_id, dup_of, fp); thresholding (the batch
    * incr rule keeps ≥2 shared) is the consumer's call — the same
    * candidate discipline as nearDupHits. One code path: a batch frame
    * through this function is the batch analog, spec-pinned identical. */
  def winnowHits(docs: DataFrame, postings: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), explode(expr("winnow_fps(split(text, ' '))")).as("fp"))
      .join(postings.select(col("fp"), col("doc_id").as("dup_of")), "fp")
      .select(col("doc_id"), col("dup_of"), col("fp"))
  }

  /** Streaming near-dup candidate hits. Works on a streaming `docs` frame
    * with columns (doc_id: long, text: string). */
  def nearDupHits(docs: DataFrame): Dataset[DupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandedSignatures(docs)
      .select(col("band"), col("bsig"), col("doc_id"))
      .as[(Int, Long, Long)]
      .groupByKey { case (band, bsig, _) => (band, bsig) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[(Int, Long, Long)], state: GroupState[Long]) => {
          val ids = rows.map(_._3).toSeq.sorted
          val owner = state.getOption.getOrElse(ids.head)
          if (!state.exists) state.update(owner)
          ids.filter(_ != owner).distinct.map(DupHit(_, owner)).iterator
        })
  }
}
