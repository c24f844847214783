package graft.jobs

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the training-set export discipline: shard-partitioned layout,
  * in-file pos order (the property that lets a loader stream a shard
  * with no training-time sort), and lossless round-trip vs the pipeline
  * query that produced the rows. */
class ExportShardsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("export writes one ordered file per shard and round-trips the pipeline output") {
    val out = Files.createTempDirectory("graft-shards").toString
    val src = graft.SparkEntry.queries("curate_pipeline_v2")(spark, dir)
    ExportShards.export(src, out)

    val expected = src.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // partition-column type inference reads shard back as INT — cast for
    // the comparison (the VALUES are what must round-trip)
    val back = spark.read.parquet(out)
      .select(col("doc_id"), col("shard").cast("long"),
        col("pos"), col("n_tokens")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(back == expected, "round-trip lost or changed rows")

    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty, "no shard partition directories written")
    assert(shardDirs.map(_.getName).toSet ==
      expected.map(t => s"shard=${t._2}").toSet,
      "partition dirs must match the shards in the data")
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      // repartition(col(shard)) co-locates each shard into ONE task →
      // one data file per shard directory
      assert(files.length == 1, s"${sd.getName}: expected one file, got ${files.length}")
      // in-file pos order: a small single file reads back as one
      // partition, preserving row order — pos must be strictly increasing
      val pos = spark.read.parquet(files.head.getPath)
        .select("pos").collect().map(_.getLong(0)).toSeq
      assert(pos == pos.sorted && pos.distinct.length == pos.length,
        s"${sd.getName}: rows not in pos order")
    }
  }
}
