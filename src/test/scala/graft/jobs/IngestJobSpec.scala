package graft.jobs

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.IngestFilters

/** Drives the full ingest job over a real file source: a healthy
  * arrival file and a truncated-pages file, one micro-batch each
  * (maxFilesPerTrigger=1 + AvailableNow). Pins that (1) admission is
  * doc-identical to the batch gate path, (2) the drift log carries one
  * verdict per batch, and (3) the truncated batch — which passes no
  * per-row gate differently — is the one the card monitor flags. */
class IngestJobSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** One arrival as a JSON line. BOTH string fields are escaped,
    * control chars included: a corpus text (or source) with a quote,
    * backslash, or newline must not split the fixture into invalid
    * JSON lines. */
  private def jsonEsc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private def jsonLine(t: (Long, String, String)): String =
    s"""{"doc_id":${t._1},"source":"${jsonEsc(t._2)}","text":"${jsonEsc(t._3)}"}"""

  test("ingest job: batch-identical admission, per-batch drift log, outage flagged") {
    val in = Files.createTempDirectory("graft-ingest-in").toString
    val out = Files.createTempDirectory("graft-ingest-out").toString
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // file 1: healthy arrivals; file 2 (later mtime): the dead-crawler
    // batch — every page truncated
    Files.write(Paths.get(s"$in/batch1.json"),
      rows.map(jsonLine).mkString("\n").getBytes("UTF-8"))
    val broken = (0 until 40)
      .map(i => (9000L + i, "src_broken", "short page only"))
    val f2 = Paths.get(s"$in/batch2.json")
    Files.write(f2, broken.map(jsonLine).mkString("\n").getBytes("UTF-8"))
    f2.toFile.setLastModified(System.currentTimeMillis() + 60000)

    val q = IngestJob.run(spark, dir, in, out, s"$out/_checkpoint")
    try q.awaitTermination(120000) finally q.stop()

    // drift log: one verdict per micro-batch; the broken batch flagged
    // (batch_id arrives via partition discovery → inferred int, cast up)
    val drift = spark.read.parquet(s"$out/drift")
      .select(col("batch_id").cast("long"), col("docs"), col("verdict")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(drift.length == 2, s"expected 2 micro-batches, got ${drift.toSeq}")
    assert(drift(0) == ((0L, 60L, "ok")), s"healthy batch: ${drift(0)}")
    assert(drift(1) == ((1L, 40L, "drift")), s"broken batch: ${drift(1)}")

    // admission must be doc-identical to the batch gate path over the
    // same arrivals (gates share one code path — this pins the JOB wiring)
    import spark.implicits._
    val all = (rows ++ broken).toSeq.toDF("doc_id", "source", "text")
    val refs0 = IngestJob.references(spark, dir)
    val expected = IngestFilters.domainGate(
        IngestFilters.classifierGate(all), refs0.decisions)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val admitted = spark.read.parquet(s"$out/admitted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == expected,
      s"job admitted ${admitted.size}, batch path ${expected.size}")
    assert(admitted.nonEmpty && admitted.size < rows.length + broken.size,
      "gates must admit some and drop some for this to prove anything")

    // at-least-once replay safety: re-processing a batch (the crash-
    // between-write-and-offset-commit case) must leave the sinks
    // IDENTICAL, not duplicated — the idempotent batch_id-partition
    // overwrite is what earns the restart-safe claim
    val refs = IngestJob.references(spark, dir)

    // the r9 scale defect, pinned: every reference frame must be a
    // MATERIALIZED artifact, not a lazy plan over the base corpus — a
    // lazy frame re-runs base-corpus work inside EVERY micro-batch.
    // (1) plan-shape: no reference frame's optimized plan may contain a
    // file-source relation (localCheckpoint memo → LogicalRDD; store
    // mode would scan only the tiny stored table); (2) runtime: during
    // processBatch no executed plan may scan base-corpus FILES — caught
    // via QueryExecutionListener over the batch's actions (writes
    // included), which a rescan cannot evade.
    // plan-shape assertion only applies in memo mode: under a store root
    // (GRAFT_INDEX_DIR / override) the frames legitimately scan the tiny
    // STORED parquet — a LogicalRelation, but of the artifact, not the
    // base corpus. The runtime FileSourceScanExec check below covers
    // both modes by matching base-corpus paths.
    if (sys.env.get("GRAFT_INDEX_DIR").isEmpty &&
        graft.engine.Tables.indexDirOverride.isEmpty)
      Seq("decisions" -> refs.decisions, "bandIndex" -> refs.bandIndex,
          "winnowPostings" -> refs.winnowPostings).foreach { case (nm, f) =>
        assert(!f.queryExecution.optimizedPlan.collectLeaves().exists(
            _.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]),
          s"$nm must be materialized, not a lazy plan over base files")
      }
    val scanned = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ns: Long): Unit =
        qe.executedPlan.foreach {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            scanned.add(f.relation.location.rootPaths.mkString(","))
          case _ => ()
        }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    try {
      IngestJob.processBatch(
        rows.toSeq.toDF("doc_id", "source", "text"), 0L, out, refs)
      Thread.sleep(500) // listener bus is async
      import scala.jdk.CollectionConverters._
      val baseScans = scanned.asScala.filter(_.contains(dir))
      assert(baseScans.isEmpty,
        s"processBatch re-scanned base corpus files: $baseScans")
    } finally spark.listenerManager.unregister(ql)

    val driftReplay = spark.read.parquet(s"$out/drift").count()
    val admittedReplay = spark.read.parquet(s"$out/admitted").count()
    assert(driftReplay == 2, s"replay duplicated drift rows: $driftReplay")
    assert(admittedReplay == admitted.size,
      s"replay duplicated admitted rows: $admittedReplay vs ${admitted.size}")
  }

  test("atomic partition publish: readers never observe a staged (in-flight) batch partition") {
    val out = Files.createTempDirectory("graft-atomic-out").toString
    import spark.implicits._
    val refs = IngestJob.references(spark, dir)
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    IngestJob.processBatch(rows.toDF("doc_id", "source", "text"), 0L, out, refs)

    // (1) the publish leaves no stage directories behind, and every
    // published partition carries the parquet completeness marker
    val sinks = Seq("drift", "dup_hits", "winnow_hits", "admitted")
    sinks.foreach { s =>
      val children = new java.io.File(s"$out/$s").listFiles().map(_.getName)
      assert(!children.exists(_.endsWith(".staging")),
        s"$s: stage dir left behind: ${children.toSeq}")
      assert(Files.exists(Paths.get(s"$out/$s/batch_id=0/_SUCCESS")),
        s"$s: published partition missing _SUCCESS")
    }
    val n0 = spark.read.parquet(s"$out/admitted").count()
    assert(n0 > 0)

    // (2) a crashed-mid-replay stage — a fully written parquet dir at the
    // hidden stage path, rename never executed — is INVISIBLE to readers:
    // Hadoop input listings skip dot-prefixed paths, so the in-flight
    // batch contributes zero rows and no schema conflicts
    rows.take(5).toDF("doc_id", "source", "text")
      .withColumn("admitted_extra", lit(true))
      .write.parquet(s"$out/admitted/.batch_id=7.staging")
    assert(spark.read.parquet(s"$out/admitted").count() == n0,
      "a reader observed rows from a staged, unpublished partition")

    // (3) replaying the same batch over the leftover stage completes and
    // leaves the sink content identical (idempotent replay through the
    // stage+rename path — the kill/replay shape end to end)
    IngestJob.processBatch(rows.toDF("doc_id", "source", "text"), 0L, out, refs)
    assert(spark.read.parquet(s"$out/admitted").count() == n0,
      "replay through the atomic publish path changed the sink")
    // and a NEW batch id publishes through a pre-existing dirty stage too
    IngestJob.processBatch(rows.take(10).toDF("doc_id", "source", "text"), 7L, out, refs)
    val batch7 = spark.read.parquet(s"$out/admitted")
      .filter(col("batch_id").cast("long") === 7L).count()
    assert(batch7 > 0 && spark.read.parquet(s"$out/admitted").count() == n0 + batch7)
  }

  test("ingest dup-gate: a planted near-dup arrival is flagged by both probes, batch ≡ stream") {
    val in = Files.createTempDirectory("graft-dupgate-in").toString
    val out = Files.createTempDirectory("graft-dupgate-out").toString
    // arrivals: two genuinely novel docs + one near-dup of base doc 0
    // (the nearDupCorpus mutation convention: same text, two appended
    // tokens — passes every per-row gate, only the dedup probes see it)
    val base0 = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 0L).select("text").collect()(0).getString(0)
    val novel = "totally novel arrival text " +
      (0 until 60).map(i => s"nv$i").mkString(" ")
    val lines = Seq(
      jsonLine((500000L, "src_new", s"$base0 zz0 zz1")),
      jsonLine((500001L, "src_new", novel)))
    Files.write(Paths.get(s"$in/batch1.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val q = IngestJob.run(spark, dir, in, out, s"$out/_checkpoint")
    try q.awaitTermination(120000) finally q.stop()

    // whole-doc probe: the planted arrival hits its base original
    val bandHits = spark.read.parquet(s"$out/dup_hits")
      .select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(bandHits.contains((500000L, 0L)),
      s"planted near-dup not flagged by the band probe: ${bandHits.toSeq}")
    // span-level probe: same arrival shares >= MinSharedFps fingerprints
    val winnowHits = spark.read.parquet(s"$out/winnow_hits")
      .select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(winnowHits.contains((500000L, 0L)),
      s"planted near-dup not flagged by the winnowing probe: ${winnowHits.toSeq}")
    // the novel doc triggers neither probe
    assert(!bandHits.exists(_._1 == 500001L) && !winnowHits.exists(_._1 == 500001L),
      "a novel arrival must not be flagged")

    // batch ≡ stream: the job's winnow hits are exactly the shared
    // library function over the same arrival rows and the same stored
    // postings, thresholded by the same MinSharedFps rule — one code
    // path, two execution contexts
    import spark.implicits._
    val arrivals = Seq((500000L, s"$base0 zz0 zz1"), (500001L, novel))
      .toDF("doc_id", "text")
    val refs = IngestJob.references(spark, dir)
    val batchSide = graft.streaming.StreamingDedup
      .winnowHits(arrivals, refs.winnowPostings)
      .groupBy("doc_id", "dup_of").agg(count(lit(1)).as("n"))
      .filter(col("n") >= graft.ops.TextOps.MinSharedFps)
      .select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(winnowHits.toSet == batchSide,
      s"job winnow hits ${winnowHits.toSet} != batch path $batchSide")
  }
}
