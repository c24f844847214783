package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe for the 100 TB question: replicate the sf0.1
  * corpus tables N× and measure how the hot pipeline queries' runtimes
  * grow. The replicas are made CONTENT-DISJOINT (per-copy word suffix for
  * documents, per-copy deterministic sign flips for embeddings) so the
  * planted-duplicate density stays constant — otherwise every row would be
  * a near-dup of its N−1 clones and the OUTPUT (all dup pairs) would
  * necessarily grow quadratically, measuring the workload, not the engine.
  *
  * A query whose time grows ~N× here has no super-linear shuffle or pair
  * space hiding in it; one that grows faster is flagged (for LSH ANN at a
  * fixed 4 planes the per-bucket population grows linearly, so its pair
  * space is expected to grow ~N² — the documented fix is adding planes as
  * the corpus grows).
  *
  * Usage: runMain graft.ScaleProbe [mult]   (default 10; writes replicas
  * to /tmp/graft_scale_x<mult>)
  */
object ScaleProbe {
  private val probed = Seq(
    "dedup_minhash_fast", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_containment",
    "dedup_embedding_lsh", "sim_topk_bruteforce", "text_pipeline_e2e",
    "pack_sequences")

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val base = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_x$mult"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // documents: suffix every word with the copy tag → vocabularies are
    // disjoint across copies, so cross-copy shingle/minhash matches vanish
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until mult).map { i =>
      docs
        .withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1c$i"))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: deterministic per-(copy, dim) sign flips → cross-copy
    // cosines are ~random, originals' geometry within a copy is preserved
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until mult).map { i =>
      emb
        .withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
        .withColumn("embedding", expr(
          s"""transform(sequence(0, size(embedding) - 1),
                d -> CAST(embedding[d] *
                     (CASE WHEN pmod(d * 131 + $i * 17, 2) = 0
                           THEN 1.0 ELSE -1.0 END) AS FLOAT))"""))
    }.reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // remaining tables: copy via a parquet read/write round-trip so the
    // probe stays layout-agnostic (a raw Files.copy assumes each table is
    // a single file; driver-generated data could become directory-layout
    // parquet without notice)
    // (events.ts is INT64 TIMESTAMP(NANOS): readable only as a long; the
    // round-trip writes it back as a plain BIGINT of nanos, which
    // Tables.load converts identically)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (n <- engine.Tables.all if n != "documents" && n != "embeddings") {
      spark.read.parquet(s"$base/$n.parquet")
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
    }

    // one untimed invocation first: JIT/codegen for a query's operators
    // compiles on its first run, which would otherwise inflate t_1x (it
    // always runs first) and understate the scaling ratio
    def best(name: String, dir: String): Double =
      (0 to 2).map { rep =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.drop(1).min

    SparkEntry.entry(spark).count() // warm session machinery
    println(f"${"query"}%-24s ${"t_1x"}%8s t_${mult}%dx${""}%4s ${"ratio"}%7s")
    probed.foreach { name =>
      val t1 = best(name, base)
      val tn = best(name, out)
      println(f"$name%-24s $t1%8.2f $tn%9.2f ${tn / t1}%7.2f")
    }
    spark.stop()
  }
}
