package graft.engine

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.SparkSpec

/** Pins the durable-index mode end-to-end: with a store root configured
  * (GRAFT_INDEX_DIR in production, the injected override here), the FIRST
  * session builds and persists each index exactly once, and a SECOND
  * session serves the index-backed queries straight from the stored
  * parquet — the build thunks never evaluate, index resolution launches
  * zero Spark jobs, and the query results are identical. This is the
  * deployment lifecycle: a dedicated index-build job writes the table,
  * every later probing job only reads it. */
class DurableIndexSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def q = graft.SparkEntry.queries
  // the durable indexes behind dedup_incremental, sim_ivf_ann,
  // sim_q8_rerank, plus the round-7 artifacts: the SemDeDup quantizer +
  // assignment, the decontamination bloom, and the trained BPE merge
  // table (semdedup_comp is durable=false by design — a build
  // intermediate, not an index)
  // round-9: the kNN bucket frame + CC cluster labels, the winnowing
  // fingerprint posting index, and the BM25 index trio (postings + df +
  // corpus stats — index METADATA stored alongside the postings) joined
  // the store
  // round-9 continuation 2: the media aHash signature index and the
  // mergeable per-lang base card joined the store
  // round-10: the ingest admission table (domain_decisions) joined the
  // store — the r9 verdict's IngestJob fix makes it a real artifact —
  // and ngram_posting_index (durable since round 6 but never round-
  // tripped here; IndexRefresh's registry audit surfaced the gap)
  // round-11: the mergeable CMS bigram profile (cms_bigram_base)
  // round-19 (ADVICE r18): the r18 metadata artifacts — the winnowing
  // pair-index dfs and the decontamination benchmark gid set — round-trip
  // too, now that IndexRefresh registers them
  private val keys =
    Seq("dedup_sid_index", "dedup_band_index", "ivf_label_centarr", "q8_index",
      "semdedup_centarr", "semdedup_blocks", "decontam_bloom", "bpe_merges",
      "knn_capped_buckets", "knn_cluster_labels", "winnow_pair_index",
      "bm25_postings", "bm25_dfs", "bm25_stats",
      "winnow_base_index", "winnow_base_dfs", "knn_cluster_centarr",
      "knn_pagerank", "knn_edges_deg", "phash_sig_index", "card_by_lang",
      "domain_decisions", "ngram_posting_index", "cms_bigram_base",
      "winnow_pair_dfs", "decontam_bench_gids", "winnow_base_capped",
      "winnow_pair_capped")

  test("second session serves index-backed queries from the store with zero rebuilds") {
    val root = Files.createTempDirectory("graft-idx-root").toString
    Tables.indexDirOverride = Some(root)
    try {
      val paths = keys.map(k => k -> Tables.storePath(root, dir, k)).toMap

      // session A: cold store — builds and persists each index exactly once
      val sA = spark.newSession()
      val incA = q("dedup_incremental")(sA, dir).collect().toSeq
      val ivfA = q("sim_ivf_ann")(sA, dir).collect().toSeq
      val q8A = q("sim_q8_rerank")(sA, dir).collect().toSeq
      val semA = q("dedup_semantic")(sA, dir).collect().toSeq
      val bloomA = q("text_decontaminate_bloom")(sA, dir).collect().toSeq
      val bpeA = q("text_bpe_tokens_fused")(sA, dir).collect().toSeq
      val ccA = q("sim_cluster_knn")(sA, dir).collect().toSeq
      val cbA = q("curate_cluster_balanced")(sA, dir).collect().toSeq
      val wpA = q("dedup_winnowing_pairs")(sA, dir).collect().toSeq
      val wiA = q("dedup_winnowing_incr")(sA, dir).collect().toSeq
      val bmA = q("text_bm25_multi")(sA, dir).collect().toSeq
      val caA = q("sim_cluster_assign")(sA, dir).collect().toSeq
      val prA = q("sim_graph_pagerank")(sA, dir).collect().toSeq
      val phA = q("mm_dedup_phash_incr")(sA, dir).collect().toSeq
      val cdA = q("curate_card_incremental")(sA, dir).collect().toSeq
      val ddA = q("curate_domain_decisions")(sA, dir).collect().toSeq
      val liA = q("sim_cluster_labels_incr")(sA, dir).collect().toSeq
      val eiA = q("sim_graph_edges_incr")(sA, dir).collect().toSeq
      val njA = q("dedup_ngram_jaccard")(sA, dir).collect().toSeq
      val hhA = q("text_heavy_hitters_incr")(sA, dir).collect().toSeq
      assert(incA.nonEmpty && ivfA.nonEmpty && q8A.nonEmpty &&
        semA.nonEmpty && bloomA.nonEmpty && bpeA.nonEmpty &&
        ccA.nonEmpty && cbA.nonEmpty && wpA.nonEmpty && bmA.nonEmpty)
      // the newer artifacts' session-A results must be non-empty too, or
      // their session-B equality assertions below pass vacuously on an
      // empty report (ADVICE r11)
      assert(wiA.nonEmpty && caA.nonEmpty && prA.nonEmpty && phA.nonEmpty &&
        cdA.nonEmpty && ddA.nonEmpty && liA.nonEmpty && eiA.nonEmpty &&
        njA.nonEmpty && hhA.nonEmpty)
      keys.foreach { k =>
        assert(IndexStore.buildCounts.get(paths(k)).contains(1),
          s"$k: expected exactly one cold build")
        assert(IndexStore.exists(sA, paths(k)), s"$k: not published to the store")
      }

      // session B: fresh session state (the local-mode analog of a separate
      // probing job). Resolving each index must read the store — the build
      // thunk never evaluates and no Spark job launches.
      val sB = spark.newSession()
      val jobs = new AtomicInteger(0)
      val tasks = new AtomicInteger(0)
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        keys.foreach { k =>
          Tables.cachedFrame(sB, dir, k)(
            sys.error(s"$k: rebuilt in the probing session"))
        }
        Thread.sleep(500) // listener bus is async
        // zero REBUILD jobs is proven hard by the sys.error thunks above;
        // the only jobs a warm-store resolution may launch are parquet
        // schema-inference footer reads — one single-task job per index,
        // nothing corpus-sized
        assert(jobs.get() <= keys.size && tasks.get() <= keys.size,
          s"warm-store resolution must cost at most one footer-read task per " +
            s"index, saw ${jobs.get()} jobs / ${tasks.get()} tasks")
      } finally spark.sparkContext.removeSparkListener(listener)

      // full queries in the probing session: identical results, no rebuild
      assert(q("dedup_incremental")(sB, dir).collect().toSeq == incA)
      assert(q("sim_ivf_ann")(sB, dir).collect().toSeq == ivfA)
      assert(q("sim_q8_rerank")(sB, dir).collect().toSeq == q8A)
      assert(q("dedup_semantic")(sB, dir).collect().toSeq == semA)
      assert(q("text_decontaminate_bloom")(sB, dir).collect().toSeq == bloomA)
      assert(q("text_bpe_tokens_fused")(sB, dir).collect().toSeq == bpeA)
      assert(q("sim_cluster_knn")(sB, dir).collect().toSeq == ccA)
      assert(q("curate_cluster_balanced")(sB, dir).collect().toSeq == cbA)
      assert(q("dedup_winnowing_pairs")(sB, dir).collect().toSeq == wpA)
      assert(q("dedup_winnowing_incr")(sB, dir).collect().toSeq == wiA)
      assert(q("text_bm25_multi")(sB, dir).collect().toSeq == bmA)
      assert(q("sim_cluster_assign")(sB, dir).collect().toSeq == caA)
      assert(q("sim_graph_pagerank")(sB, dir).collect().toSeq == prA)
      assert(q("mm_dedup_phash_incr")(sB, dir).collect().toSeq == phA)
      assert(q("curate_card_incremental")(sB, dir).collect().toSeq == cdA)
      assert(q("curate_domain_decisions")(sB, dir).collect().toSeq == ddA)
      // label maintenance in the probing session: appends against the
      // STORED labels + centroids — identical merge, zero CC rounds
      // (covered by the labelBuildCounts assertion below)
      assert(q("sim_cluster_labels_incr")(sB, dir).collect().toSeq == liA)
      assert(q("sim_graph_edges_incr")(sB, dir).collect().toSeq == eiA)
      assert(q("dedup_ngram_jaccard")(sB, dir).collect().toSeq == njA)
      assert(q("text_heavy_hitters_incr")(sB, dir).collect().toSeq == hhA)
      keys.foreach { k =>
        assert(IndexStore.buildCounts.get(paths(k)).contains(1),
          s"$k: probing session must not rebuild")
      }
      // the probing session never ran a CC round: the label-build thunk
      // (the only place the edge build + star loop lives) never evaluated
      assert(!graft.ops.Similarity.labelBuildCounts.contains((sB, dir)),
        "warm-store session re-ran the cluster-label CC build")
    } finally Tables.indexDirOverride = None
  }

  test("IndexBuild's builder list names real queries (the CLI can't drift from the registry)") {
    graft.jobs.IndexBuild.builders.foreach { b =>
      assert(graft.SparkEntry.queries.contains(b), s"IndexBuild builder '$b' is not a registered query")
    }
  }

  test("a crashed partial write (no _SUCCESS marker) is rebuilt, not served") {
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("graft-idx-part").toString + "/idx"
    // simulate a crash AFTER some data files landed but BEFORE commit:
    // a parquet file exists at the path, the _SUCCESS marker does not
    spark.range(3).select(col("id")).write.parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), false)
    assert(!IndexStore.exists(spark, path))
    val rebuilt = IndexStore.loadOrBuild(spark, path)(
      spark.range(5).select(col("id")))
    assert(rebuilt.count() == 5, "partial index must be replaced by a fresh build")
    assert(IndexStore.exists(spark, path), "rebuild must publish a complete index")
  }
}
