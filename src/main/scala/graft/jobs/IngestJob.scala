package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.engine.Tables
import graft.streaming.{DriftMonitor, IngestFilters, StreamingDedup}

/** The production INGEST topology as one runnable job — the streaming
  * counterpart of curate_pipeline_v2, binding the pieces the library
  * ships: arriving document batches are (1) card-monitored RAW (drift
  * verdicts against the versioned reference card — monitoring must see
  * what the gates would hide), (2) probed against the stored DEDUP
  * indexes (whole-doc minhash bands + span-level winnowing postings)
  * with candidate hits written alongside admissions, (3) gated by the
  * classifier and the domain decision table, and (4) appended to the
  * admitted corpus sink.
  *
  * Reference artifacts (the domain decision table, the drift reference
  * card) are computed from the BASE corpus once at job start — versioned
  * batch artifacts, not stream-learned state (the IngestFilters /
  * DriftMonitor discipline): two workers or two restarts must agree on
  * what normal is and which domains are kept.
  *
  * Scale: everything per-batch is stateless (one aggregate for the
  * card, narrow gates, a broadcast decision join), so the job's state
  * is ONLY the file-source offset log in the checkpoint. Restart-safe
  * end to end: foreachBatch is at-least-once, so each sink write is
  * made IDEMPOTENT by landing in (and overwriting) its own batch_id
  * partition — a replayed batch rewrites the same partitions instead
  * of appending duplicates (see processBatch).
  */
object IngestJob {
  val arrivalSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  /** Batch-side reference state for the topology — every frame here is
    * MATERIALIZED (durable artifact or localCheckpoint), never a lazy
    * plan over the base corpus: the r9 defect was the decision table
    * being lazy, which re-ran the full base scan + classifier +
    * aggregate inside every micro-batch's broadcast join. */
  final case class Refs(
      decisions: DataFrame,            // domain admission table (durable artifact)
      drift: DriftMonitor.Reference,   // one collected summary row
      bandIndex: DataFrame,            // minhash band signatures (durable artifact)
      winnowPostings: DataFrame)       // df-capped winnowing postings (from 2 artifacts)

  /** Resolve the reference artifacts once at job start. The decision
    * table and band index resolve through the durable store
    * (GRAFT_INDEX_DIR — IndexBuild wrote them; localCheckpoint memo
    * without a store). The capped winnowing postings are a join of the
    * two winnow artifacts, checkpointed HERE so each micro-batch's
    * stream-static probe reads cached blocks instead of re-running the
    * cap join per batch. */
  def references(spark: SparkSession, baseDir: String): Refs =
    Refs(
      IngestFilters.domainDecisionsArtifact(spark, baseDir),
      DriftMonitor.referenceFrom(Tables(spark, baseDir, "documents")),
      graft.ops.Dedup.baseBandIndex(spark, baseDir),
      graft.ops.TextOps.winnowCappedPostings(spark, baseDir).localCheckpoint())

  /** Publish one sink's batch partition ATOMICALLY: stage the write to a
    * HIDDEN dot-prefixed sibling — Hadoop/Spark input listings skip
    * paths starting with `.` or `_`, so no reader ever lists the stage —
    * then rename into place (IndexStore.save's publish discipline at
    * partition granularity; rename is atomic on HDFS and posix). */
  private[jobs] def publishPartition(df: DataFrame, sinkDir: String,
      batchId: Long): Unit = {
    val dest = new Path(s"$sinkDir/batch_id=$batchId")
    val tmp = new Path(s"$sinkDir/.batch_id=$batchId.staging")
    val fs = tmp.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(tmp, dest))
      sys.error(s"IngestJob: could not publish $tmp -> $dest")
  }

  /** One micro-batch through the topology — IDEMPOTENT by batch id:
    * each sink write lands in (and replaces) that batch's own
    * `batch_id=N` partition directory, so a crash between the writes
    * and the offset-log commit replays the batch into the SAME
    * partitions instead of appending duplicates. foreachBatch is
    * at-least-once; idempotent writes are what upgrade the pipeline to
    * effectively-once (partition discovery supplies batch_id on read).
    *
    * Each partition is published via stage + rename (publishPartition),
    * so a reader racing a replay observes the partition either absent,
    * fully old, or fully new — NEVER partially written (the r10
    * read-side caveat, closed; IngestJobSpec's staged-dir test pins that
    * a reader cannot see in-flight rows). The remaining non-atomicity is
    * ACROSS sinks: a crash between two partition publishes leaves the
    * sinks one batch out of step until the offset-log replay completes. */
  private[jobs] def processBatch(df: DataFrame, batchId: Long,
      outDir: String, refs: Refs): Unit = {
    // the batch frame has ≥3 consumers below (drift card, gates, two
    // dup probes) — pin it so foreachBatch's source isn't re-read per sink
    val batch = df.localCheckpoint()
    // monitor the RAW batch — a gated view would hide the outage
    publishPartition(
      DriftMonitor.drift(DriftMonitor.card(batch), refs.drift),
      s"$outDir/drift", batchId)
    // DUP-GATE probes against the STORED indexes — candidates written
    // alongside admissions (flag, don't silently drop: the admission
    // policy is a downstream curation decision; the gate's job is to
    // make every near-dup arrival VISIBLE the moment it lands).
    //  - whole-doc: the arriving batch's md5-space band signatures
    //    equi-joined against the durable band index (index × batch only)
    //  - span-level: StreamingDedup.winnowHits — the ONE code path shared
    //    with the streaming library — against the df-capped postings,
    //    thresholded by the same MinSharedFps rule as the batch query
    publishPartition(
      graft.ops.Dedup.crossCandidates(refs.bandIndex,
          graft.ops.Dedup.arrivalBandSigs(batch))
        .select(col("db").as("doc_id"), col("da").as("dup_of")),
      s"$outDir/dup_hits", batchId)
    publishPartition(
      StreamingDedup.winnowHits(batch, refs.winnowPostings)
        .groupBy("doc_id", "dup_of").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= graft.ops.TextOps.MinSharedFps),
      s"$outDir/winnow_hits", batchId)
    publishPartition(
      IngestFilters.domainGate(IngestFilters.classifierGate(batch), refs.decisions),
      s"$outDir/admitted", batchId)
  }

  /** Start the ingest stream over a JSON-lines arrival directory. */
  def run(spark: SparkSession, baseDir: String, inDir: String,
      outDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val refs = references(spark, baseDir)
    val arrivals = spark.readStream.schema(arrivalSchema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    arrivals.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        processBatch(df, batchId, outDir, refs)
      }
      .start()
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 3)
      sys.error("usage: IngestJob <baseDir> <inDir> <outDir> [checkpointDir]")
    val Array(baseDir, inDir, outDir) = args.take(3)
    val checkpoint = args.lift(3).getOrElse(s"$outDir/_checkpoint")
    val spark = graft.engine.SessionDefaults(SparkSession.builder())
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, baseDir, inDir, outDir, checkpoint).awaitTermination()
    spark.stop()
  }
}
