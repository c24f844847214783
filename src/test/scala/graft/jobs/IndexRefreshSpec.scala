package graft.jobs

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.{IndexStore, Tables}

/** Drives the staleness-consuming refresh job through the full corpus
  * lifecycle on a mutable copy of the testdata:
  *
  *   cold build → no-op refresh (all fresh, ZERO jobs) → documents
  *   append (exactly the documents-sourced artifacts rebuild) → a
  *   drift-below-threshold embeddings append (per-row artifacts rebuild,
  *   centroid-mean artifacts ADOPTED — the semantic canary gates them) →
  *   a corpus-wide rescale (canary fires; the centroid artifacts rebuild
  *   too).
  *
  * Build-count hooks (IndexStore.buildCounts, per stored path) prove the
  * "exactly the stale artifacts rebuilt, fresh ones at 0 builds"
  * contract the r9 verdict asked for. Measured margins for the two
  * canary scenarios at this SF: one duplicated vector drifts its label
  * centroid by drift6 ≈ 390 (< the 1000 threshold); the ×1.5 rescale
  * drifts every label by ≈ 4000–7700 (all stale). */
class IndexRefreshSpec extends SparkSpec {
  private val src = "/root/testdata/sf0.001"

  private def buildCount(root: String, data: String, key: String): Int =
    IndexStore.buildCounts.getOrElse(Tables.storePath(root, data, key), 0)

  test("refresh rebuilds exactly the stale artifacts across the corpus lifecycle") {
    val data = Files.createTempDirectory("graft-refresh-data").toString
    Seq("documents", "embeddings").foreach { t =>
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$data/$t.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    val root = Files.createTempDirectory("graft-refresh-root").toString
    Tables.indexDirOverride = Some(root)
    try {
      val keys = IndexRefresh.artifacts
      val docKeys = keys.filter(_.source == "documents").map(_.key).toSet
      val embKeys = keys.filter(_.source == "embeddings").map(_.key).toSet
      val gated = keys.filter(_.centroidGated).map(_.key).toSet
      // gated rows whose upstream is per-row rebuild WITH it (the
      // derived-artifact promotion): knn_cluster_centarr. Scoped to the
      // embeddings source — the documents-sourced derived rows
      // (winnow_pair_dfs, decontam_bloom since r19) ride phase 3's
      // ordinary docKeys assertions and get their own promotion phase 7.
      val derived = keys.filter(a =>
        a.derivedFrom.nonEmpty && a.source == "embeddings").map(_.key).toSet
      val adoptable = gated -- derived

      // replace a table file with a mutated parquet DIRECTORY of the same
      // name (spark reads both shapes; the fingerprint walks both). The
      // mutation frames read from the immutable ORIGINAL testdata, never
      // from `data`, so the overwrite cannot race its own input.
      def rewrite(table: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
        val df = f(spark.read.parquet(s"$src/$table.parquet"))
        val p = Paths.get(s"$data/$table.parquet")
        if (Files.isRegularFile(p)) Files.delete(p)
        df.coalesce(1).write.mode("overwrite").parquet(p.toString)
      }

      // ---- phase 1: cold store — every artifact built ----
      val r1 = IndexRefresh.refresh(spark.newSession(), data).toMap
      assert(r1.keySet == keys.map(_.key).toSet)
      assert(r1.values.forall(_ == "built"), s"cold pass must build all: $r1")
      keys.foreach(a => assert(buildCount(root, data, a.key) == 1,
        s"${a.key}: expected one cold build"))

      // ---- phase 2: nothing changed — all fresh, ZERO Spark jobs ----
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      val r2 = try {
        val r = IndexRefresh.refresh(spark.newSession(), data).toMap
        Thread.sleep(500) // listener bus is async
        r
      } finally spark.sparkContext.removeSparkListener(listener)
      assert(r2.values.forall(_ == "fresh"), s"no-op pass must serve all: $r2")
      assert(jobs.get() == 0,
        s"a fully-fresh refresh decides on file metadata alone, saw ${jobs.get()} jobs")

      // ---- phase 3: a document arrives — only documents-sourced rebuild ----
      rewrite("documents")(d =>
        d.unionAll(d.limit(1).withColumn("doc_id", lit(99999L))))
      val r3 = IndexRefresh.refresh(spark.newSession(), data).toMap
      docKeys.foreach(k => assert(r3(k) == "rebuilt", s"$k: ${r3(k)}"))
      embKeys.foreach(k => assert(r3(k) == "fresh", s"$k: ${r3(k)}"))
      docKeys.foreach(k => assert(buildCount(root, data, k) == 2, s"$k not rebuilt"))
      embKeys.foreach(k => assert(buildCount(root, data, k) == 1, s"$k rebuilt needlessly"))

      // ---- phase 4: one duplicated vector — input changed, but the
      // centroid canary stays below threshold: per-row embedding
      // artifacts rebuild, the centroid-mean ones are ADOPTED (served,
      // fingerprint re-recorded) — EXCEPT knn_cluster_centarr, whose
      // upstream labels just rebuilt: centroids of a replaced
      // clustering must rebuild with it; documents-side untouched ----
      rewrite("embeddings")(e =>
        e.unionAll(e.limit(1).withColumn("vec_id", lit(999999L))))
      val r4 = IndexRefresh.refresh(spark.newSession(), data).toMap
      docKeys.foreach(k => assert(r4(k) == "fresh", s"$k: ${r4(k)}"))
      adoptable.foreach(k => assert(r4(k) == "adopted", s"$k: ${r4(k)}"))
      derived.foreach(k => assert(r4(k) == "rebuilt",
        s"$k: ${r4(k)} — must rebuild with its rebuilt upstream"))
      // knn_pagerank is the warm-refreshable artifact: the stored ranks
      // cover all but the one appended node, so it re-seeds instead of
      // cold-building (its build counter must stay flat)
      assert(r4("knn_pagerank") == "warm", s"knn_pagerank: ${r4("knn_pagerank")}")
      (embKeys -- gated - "knn_pagerank").foreach(k =>
        assert(r4(k) == "rebuilt", s"$k: ${r4(k)}"))
      adoptable.foreach(k => assert(buildCount(root, data, k) == 1,
        s"$k rebuilt despite a below-threshold canary"))
      derived.foreach(k => assert(buildCount(root, data, k) == 2, s"$k not promoted"))
      (embKeys -- gated - "knn_pagerank").foreach(k =>
        assert(buildCount(root, data, k) == 2,
          s"$k must rebuild on any input change"))
      assert(buildCount(root, data, "knn_pagerank") == 1,
        "warm refresh must not run the cold pagerank builder")
      // the warm refresh REPLACED the artifact (it iterates over the
      // rebuilt edges): the stored ranks must cover the appended node
      val s4b = spark.newSession()
      val warmRanks = graft.engine.IndexStore.load(s4b,
        graft.engine.Tables.storePath(root, data, "knn_pagerank"))
      assert(warmRanks.filter(col("node") === 999999L).count() == 1,
        "warm-refreshed ranks must include the appended node")

      // ---- phase 5: corpus-wide rescale — the canary fires and the
      // centroid artifacts rebuild too; node ids persist, so pagerank
      // still warm-refreshes (ranks are a relative ordering; scheduled
      // cold builds are the convergence anchor) ----
      rewrite("embeddings")(e =>
        e.withColumn("embedding",
          expr("transform(embedding, x -> CAST(x AS FLOAT) * CAST(1.5 AS FLOAT))")))
      val r5 = IndexRefresh.refresh(spark.newSession(), data).toMap
      docKeys.foreach(k => assert(r5(k) == "fresh", s"$k: ${r5(k)}"))
      assert(r5("knn_pagerank") == "warm", s"knn_pagerank: ${r5("knn_pagerank")}")
      (embKeys - "knn_pagerank").foreach(k => assert(r5(k) == "rebuilt", s"$k: ${r5(k)}"))
      adoptable.foreach(k => assert(buildCount(root, data, k) == 2,
        s"$k must rebuild once the canary fires"))
      derived.foreach(k => assert(buildCount(root, data, k) == 3, s"$k"))

      // ---- phase 6: a MISSING fingerprint sidecar with UNCHANGED input
      // — provenance unprovable. Per-row artifacts must rebuild (adopting
      // would stamp the current fingerprint over possibly-stale rows and
      // report 'fresh' forever); gated artifacts fall back to the canary,
      // which reads fresh here (phase 5 rebuilt them from this corpus) ----
      Files.delete(Paths.get(Tables.storePath(root, data, "bm25_postings") + ".fp"))
      Files.delete(Paths.get(Tables.storePath(root, data, "ivf_label_centarr") + ".fp"))
      val bmBefore = buildCount(root, data, "bm25_postings")
      val r6 = IndexRefresh.refresh(spark.newSession(), data).toMap
      assert(r6("bm25_postings") == "rebuilt",
        s"missing-fp per-row artifact must rebuild: ${r6("bm25_postings")}")
      assert(buildCount(root, data, "bm25_postings") == bmBefore + 1)
      assert(r6("ivf_label_centarr") == "adopted",
        s"missing-fp gated artifact with a fresh canary: ${r6("ivf_label_centarr")}")
      (keys.map(_.key).toSet - "bm25_postings" - "ivf_label_centarr").foreach(k =>
        assert(r6(k) == "fresh", s"$k: ${r6(k)}"))

      // ---- phase 7 (ADVICE r18): a missing UPSTREAM metadata artifact
      // forces its derived artifact to rebuild with it — the bloom (and
      // the df-capped pair query) must never serve rows keyed by a bench
      // gid set / posting index that was rebuilt out from under them ----
      def deleteArtifact(k: String): Unit = {
        val p = new org.apache.hadoop.fs.Path(Tables.storePath(root, data, k))
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
      deleteArtifact("decontam_bench_gids")
      deleteArtifact("winnow_pair_index")
      val bloomBefore = buildCount(root, data, "decontam_bloom")
      val dfsBefore = buildCount(root, data, "winnow_pair_dfs")
      val r7 = IndexRefresh.refresh(spark.newSession(), data).toMap
      assert(r7("decontam_bench_gids") == "built" && r7("winnow_pair_index") == "built")
      assert(r7("decontam_bloom") == "rebuilt",
        s"bloom must rebuild with its gid set: ${r7("decontam_bloom")}")
      assert(r7("winnow_pair_dfs") == "rebuilt",
        s"dfs must rebuild with its posting index: ${r7("winnow_pair_dfs")}")
      assert(buildCount(root, data, "decontam_bloom") == bloomBefore + 1)
      assert(buildCount(root, data, "winnow_pair_dfs") == dfsBefore + 1)
    } finally Tables.indexDirOverride = None
  }

  test("IndexBuild's builder list fills the ENTIRE refresh registry — no artifact left cold") {
    // found by a CLI smoke: a refresh over a store IndexBuild had just
    // "completed" reported one cold build (ngram_posting_index — the one
    // artifact no other builder reaches transitively). This runs the
    // build job's exact builder list against a cold store and asserts
    // every refresh-tracked artifact was published — the executable form
    // of IndexBuild's "every durable artifact" claim.
    val root = Files.createTempDirectory("graft-buildcover-root").toString
    Tables.indexDirOverride = Some(root)
    try {
      val s = spark.newSession()
      IndexBuild.builders.foreach(b => graft.SparkEntry.queries(b)(s, src).count())
      IndexRefresh.artifacts.foreach { a =>
        assert(IndexStore.exists(s, Tables.storePath(root, src, a.key)),
          s"${a.key}: not built by IndexBuild's builder list")
      }
    } finally Tables.indexDirOverride = None
  }

  test("warm pagerank refresh costs fewer Spark jobs than the cold build") {
    // the r10 verdict's acceptance bar for task #6: the warm re-seed
    // (PrWarmIters iterations from stored ranks) must be measurably
    // cheaper than the 5-iteration cold build over the SAME stored edge
    // substrate — counted in Spark jobs, the unit the refresh pays in
    val root = Files.createTempDirectory("graft-warmpr-root").toString
    Tables.indexDirOverride = Some(root)
    try {
      def countJobs(body: => Unit): Int = {
        val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
        val l = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
        }
        spark.sparkContext.addSparkListener(l)
        try { body; Thread.sleep(500) } finally spark.sparkContext.removeSparkListener(l)
        jobs.get()
      }
      // substrate: buckets + edges built and stored first, so both
      // measurements start from a warm edge artifact
      graft.SparkEntry.queries("sim_seed_expand")(spark.newSession(), src).count()
      val coldJobs = countJobs {
        graft.SparkEntry.queries("sim_graph_pagerank")(spark.newSession(), src).count()
      }
      val s = spark.newSession()
      val nodes = Tables(s, src, "embeddings").select(col("vec_id").as("node"))
      val edges = IndexStore.load(s, Tables.storePath(root, src, "knn_edges_deg"))
      val stored = IndexStore.load(s, Tables.storePath(root, src, "knn_pagerank"))
      val n = nodes.count()
      val warmJobs = countJobs {
        graft.ops.Similarity.pagerankWarmRefresh(nodes, edges, stored, n).count()
      }
      assert(warmJobs > 0 && coldJobs > 0)
      assert(warmJobs < coldJobs,
        s"warm refresh ($warmJobs jobs) must cost less than the cold build ($coldJobs jobs)")
    } finally Tables.indexDirOverride = None
  }

  test("IndexRefresh's registry names real queries and covers the durable store") {
    IndexRefresh.artifacts.foreach { a =>
      assert(graft.SparkEntry.queries.contains(a.builder),
        s"refresh builder '${a.builder}' is not a registered query")
      assert(Seq("documents", "embeddings").contains(a.source))
    }
    // every builder IndexBuild runs is refresh-tracked (artifact keys the
    // build job creates must not silently fall outside refresh coverage)
    val tracked = IndexRefresh.artifacts.map(_.builder).toSet
    IndexBuild.builders.foreach { b =>
      assert(tracked.contains(b),
        s"IndexBuild builder '$b' has no refresh-tracked artifact")
    }
  }
}
