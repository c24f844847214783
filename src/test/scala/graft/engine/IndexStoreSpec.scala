package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the durable index lifecycle: an ANN index persisted to parquet and
  * reloaded must serve IDENTICAL probe results to the freshly built frame
  * (array columns and quantized ids round-trip bit-exactly). */
class IndexStoreSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q8 index round-trips through parquet; probe results are identical") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, dir, "embeddings")
    def maxAbs = "greatest(array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-12)"
    val built = e.filter(col("vec_id") >= 8).select(
      col("vec_id").as("nid"),
      expr(s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127.0D / $maxAbs) AS INT))")
        .as("c8"))
    val path = java.nio.file.Files.createTempDirectory("graft-idx").toString + "/q8"
    val loaded = IndexStore.loadOrBuild(spark, path)(built)
    // second loadOrBuild must read the stored table, not rebuild
    val again = IndexStore.loadOrBuild(spark, path)(
      sys.error("must not rebuild when the index exists"))
    def probe(index: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
      val q = e.filter(col("vec_id") < 8).select(
        col("vec_id").as("qid"),
        expr(s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127.0D / $maxAbs) AS INT))")
          .as("q8"))
      index.crossJoin(broadcast(q))
        .select(col("qid"), col("nid"), expr("vec_dot(q8, c8)").as("qdot"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    val fromBuilt = probe(built)
    val fromLoaded = probe(loaded)
    assert(fromLoaded == fromBuilt, "loaded index must probe identically")
    assert(probe(again) == fromBuilt)
  }
}
