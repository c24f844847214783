package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus a decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so `decodeFeatures` is a
  * clearly-marked DETERMINISTIC STUB (chunked byte statistics standing in
  * for pixel/sample decoding). What is real and tested is the Spark-side
  * plumbing a 100 TB media pipeline needs: binary column + metadata struct
  * schema, a typed Dataset[MediaRecord] boundary, partition-local batch
  * processing via mapPartitions (the Scala analog of `mapInPandas` — one
  * iterator per partition, no per-row overhead, no driver involvement),
  * and metadata-only pruning (the scan never materializes bytes for
  * queries that touch only metadata — column pruning does that for free).
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long, format: String, width: Int, height: Int, media: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Int, chunk_means: Array[Double])
  final case class FrameSample(doc_id: Long, frame: Int, fmean: Double)

  private val formats = Seq("png", "jpg", "wav", "mp4")

  /** documents → media table: payload = utf8 bytes of `text` (a stand-in
    * for real image/audio bytes), metadata derived deterministically. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      element_at(array(formats.map(lit): _*), (col("doc_id") % 4 + 1).cast("int")).as("format"),
      (lit(16) + col("doc_id") % 64).cast("int").as("width"),
      (lit(16) + col("doc_id") % 48).cast("int").as("height"),
      col("text").cast("binary").as("media"))

  /** STUB decode: in production this calls the codec inside mapPartitions
    * (one codec init per partition, streaming batches). Here: 4 chunked
    * mean-byte-values as the "features", deterministic and testable. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec" init would go here
      it.map { r =>
        val bytes = r.media
        val n = bytes.length
        // byte i belongs to chunk floor(4i/n) — replayable in plain SQL
        val sums = Array.fill(4)(0L); val cnts = Array.fill(4)(0L)
        var i = 0
        while (i < n) {
          val c = ((i.toLong * 4) / n).toInt
          sums(c) += bytes(i) & 0xff; cnts(c) += 1; i += 1
        }
        val chunks = Array.tabulate(4) { c =>
          if (cnts(c) == 0) 0.0
          else math.round(sums(c).toDouble / cnts(c) * 1000) / 1000.0
        }
        MediaFeatures(r.doc_id, r.format, n, chunks)
      }
    }
  }

  /** STUB frame sampler: treats the payload as a "video" of `width`-byte
    * frames and keeps every 4th frame with its mean byte value. In
    * production the codec seeks to sampled frame offsets inside
    * mapPartitions (no full decode of skipped frames); the Spark-side
    * shape — typed boundary, per-partition iteration, one output row per
    * sampled frame — is exactly that pipeline's. */
  def frameSample(media: Dataset[MediaRecord], every: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val w = r.width; val n = r.media.length
      (0 until n / w).iterator.filter(_ % every == 0).map { f =>
        var sum = 0L; var i = f * w
        while (i < f * w + w) { sum += r.media(i) & 0xff; i += 1 }
        FrameSample(r.doc_id, f, math.round(sum.toDouble / w * 1000) / 1000.0)
      }
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata-only query: the planner prunes every unused document column
    // out of the scan (verified in PlanSpec via the physical plan).
    "mm_meta" -> ((s, dir) => {
      mediaTable(s, dir)
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          length(col("media")).as("n_bytes"))
        .orderBy("doc_id")
    }),

    // Decode path through the typed Dataset + mapPartitions boundary.
    // Oracle-checked: the stub's chunk means are pure integer/decimal
    // arithmetic DuckDB replays over the same utf8 payload.
    "mm_decode_features" -> ((s, dir) => {
      import s.implicits._
      val ds = mediaTable(s, dir).as[MediaRecord]
      decodeFeatures(ds)
        .select(col("doc_id"), col("format"), col("n_bytes"),
          round(element_at(col("chunk_means"), 1), 3).as("c0"),
          round(element_at(col("chunk_means"), 4), 3).as("c3"))
        .orderBy("doc_id")
    }),

    // Frame sampling through the same typed boundary: every 4th
    // width-byte "frame", per-frame mean — oracle-replayable arithmetic.
    "mm_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val ds = mediaTable(s, dir).as[MediaRecord]
      frameSample(ds, 4)
        .select(col("doc_id"), col("frame"), round(col("fmean"), 3).as("fmean"))
        .orderBy("doc_id", "frame")
    })
  )

  val oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
                list_extract(['png', 'jpg', 'wav', 'mp4'],
                             CAST(doc_id % 4 AS BIGINT) + 1) AS format,
                CAST(16 + doc_id % 64 AS INT) AS width,
                CAST(16 + doc_id % 48 AS INT) AS height,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes
         FROM documents ORDER BY doc_id""",

    // chunk c over n bytes: mean of byte values in [c*n/4, (c+1)*n/4),
    // rounded to 3 decimals — text is ascii so bytes == char codes.
    "mm_decode_features" ->
      """WITH b AS (
           SELECT doc_id, length(text) AS n, text,
                  unnest(range(0, length(text))) AS i
           FROM documents),
         chunks AS (
           SELECT doc_id, i * 4 // n AS c,
                  ascii(substring(text, CAST(i AS INT) + 1, 1)) AS v
           FROM b),
         means AS (
           SELECT doc_id, c, round(round(avg(v) * 1000) / 1000.0, 3) AS m
           FROM chunks GROUP BY doc_id, c)
         SELECT d.doc_id,
                list_extract(['png', 'jpg', 'wav', 'mp4'],
                             CAST(d.doc_id % 4 AS BIGINT) + 1) AS format,
                CAST(octet_length(encode(d.text)) AS INT) AS n_bytes,
                m0.m AS c0, m3.m AS c3
         FROM documents d
         JOIN means m0 ON d.doc_id = m0.doc_id AND m0.c = 0
         JOIN means m3 ON d.doc_id = m3.doc_id AND m3.c = 3
         ORDER BY d.doc_id""",

    // frame f over width w: bytes [f*w, (f+1)*w), sampled every 4th frame
    "mm_frame_sample" ->
      """WITH m AS (
           SELECT doc_id, CAST(16 + doc_id % 64 AS INT) AS w,
                  text, length(text) AS n
           FROM documents),
         f AS (
           SELECT doc_id, w, text, unnest(range(0, n // w)) AS fr
           FROM m),
         sf AS (SELECT * FROM f WHERE fr % 4 = 0),
         b AS (
           SELECT doc_id, fr,
                  ascii(substring(text, CAST(fr * w + i AS INT) + 1, 1)) AS v
           FROM (SELECT doc_id, fr, w, text, unnest(range(0, w)) AS i FROM sf))
         SELECT doc_id, CAST(fr AS INT) AS frame,
                round(round(avg(v) * 1000) / 1000.0, 3) AS fmean
         FROM b GROUP BY doc_id, fr ORDER BY doc_id, frame"""
  )
}
