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
  final case class MediaSig(doc_id: Long, lo: Long, hi: Long)

  private val formats = Seq("png", "jpg", "wav", "mp4")

  /** Band-bucket population cap for the perceptual-hash pair search. A
    * 16-bit band value shared by more than this many assets is a STOP
    * BAND — byte-profile boilerplate (the all-white thumbnail / silence
    * clip problem): listing its internal pairs is both quadratic and
    * useless, exactly the winnowing MaxFpDf / ngram stop-gram rationale.
    * Measured before the cap at the 100× probe: replicated prose is
    * byte-similar across copies, so band buckets went mega and the pair
    * OUTPUT exploded 720 → 26.8M rows (8.1× time marginal — workload
    * density, not engine shape). With the cap, pair space is
    * ≤ 4·n·MaxBandPop for any corpus. */
  private[ops] val MaxBandPop = 64

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

  /** Average-hash (aHash) perceptual signature, computed INSIDE the typed
    * mapPartitions decode boundary — the real multimodal-dedup shape: the
    * signature falls out of the single decode pass over the payload bytes
    * (on real images this is exactly aHash on the 8×8 grayscale
    * downsample; here the stub "pixels" are the payload bytes). Bit b of
    * 64 = 1 iff mean(block b) > mean(payload), decided by the INTEGER
    * cross-multiplication sum_b·cnt_total > sum_total·cnt_b (no float
    * division anywhere, so the oracle replays it exactly). Byte i of an
    * n-byte payload belongs to block (i·64) div n — the decodeFeatures
    * chunk convention at 64 blocks.
    *
    * Exactness bound: the cross-multiply peaks at sum_b·n ≤ 255·n², so
    * 64-bit arithmetic is exact for payloads up to ~190 MB
    * (sqrt(2⁶³/255)); larger assets would need a 128-bit compare in BOTH
    * engines (Math.multiplyHigh / HUGEINT) — flagged here rather than
    * silently wrong, since real image/audio assets sit well under it and
    * video would be frame-sampled before hashing anyway. */
  def aHash64(media: Dataset[MediaRecord]): Dataset[MediaSig] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val bytes = r.media
        val n = bytes.length
        val sums = Array.fill(64)(0L); val cnts = Array.fill(64)(0L)
        var st = 0L
        var i = 0
        while (i < n) {
          val b = ((i.toLong * 64) / n).toInt
          val v = bytes(i) & 0xff
          sums(b) += v; cnts(b) += 1; st += v
          i += 1
        }
        var lo = 0L; var hi = 0L
        var b = 0
        while (b < 64) {
          // empty blocks (n < 64) stay bit 0
          if (cnts(b) > 0 && sums(b) * n > st * cnts(b)) {
            if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
          }
          b += 1
        }
        MediaSig(r.doc_id, lo, hi)
      }
    }
  }

  /** Spec hook proving repeat incremental invocations probe the stored
    * signature index instead of re-hashing the base corpus. */
  private[graft] val phashBuildCounts =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Int]

  /** The base corpus's aHash signatures as a DURABLE index artifact —
    * 8 bytes per asset, the media analog of the winnowing/minhash base
    * indexes: built once by the index job, probed by the full pair
    * search AND by every arriving batch. */
  private[ops] def baseSigIndex(s: SparkSession, dir: String): DataFrame =
    Tables.cachedFrame(s, dir, "phash_sig_index") {
      import s.implicits._
      phashBuildCounts.updateWith((s, dir))(c => Some(c.getOrElse(0) + 1))
      aHash64(mediaTable(s, dir).as[MediaRecord]).toDF()
    }

  /** The arriving batch of the incremental scenario: minor-edit copies
    * (payload byte 0 replaced) of every 7th asset, ids +100000. */
  private def mediaBatch(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("media",
        concat(lit("Z").cast("binary"), expr("substring(media, 2, 2147483647)")))

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
    }),

    // Perceptual-hash near-dup over the media payloads — the image-dedup
    // stage of a multimodal pipeline (re-encoded / slightly-edited copies
    // of the same picture): aHash signatures from the decode pass, then
    // the dedup_simhash64 banded pair search (4×16-bit chunks — Hamming
    // ≤ 3 guarantees one chunk matches exactly, so candidates come from
    // an EQUI-join, never a signature cross-join). Planted near-dups:
    // payload byte 0 replaced (the minor-edit copy). At 100 TB the
    // signature build rides the one decode pass (64-bit sig per asset —
    // index bytes are 8/asset), and the pair space is HARD-bounded at
    // ≤ 4·n·MaxBandPop by the stop-band drop (see MaxBandPop — the 100×
    // probe exposed mega-buckets on byte-similar corpora).
    "mm_dedup_phash" -> ((s, dir) => {
      import s.implicits._
      // base signatures resolve through the stored index; only the
      // planted batch hashes fresh
      phashPairs(baseSigIndex(s, dir)
        .unionByName(aHash64(mediaBatch(s, dir).as[MediaRecord]).toDF())
        .localCheckpoint())
    }),

    // INCREMENTAL media dedup — the ingest shape: an arriving batch is
    // hashed (batch-sized work), banded, and probed against the STORED
    // signature index's bands; only batch×index cross pairs are
    // checked. The base corpus is never re-hashed (the
    // dedup_incremental / winnowing_incr discipline applied to media).
    // Stop bands come from the INDEX side's bucket populations — at
    // deployment that is precomputed index metadata, and an arriving
    // batch must not change which bands are considered boilerplate
    // mid-stream (the DriftMonitor reference-artifact argument).
    "mm_dedup_phash_incr" -> ((s, dir) => {
      import s.implicits._
      val idx = baseSigIndex(s, dir)
      val batch = aHash64(mediaBatch(s, dir).as[MediaRecord]).toDF()
      val idxChunks = phashChunks(idx)
      val pops = idxChunks.groupBy("ci", "cv").agg(count(lit(1)).as("pop"))
      val keptIdx = idxChunks.join(pops.filter(col("pop") <= MaxBandPop), Seq("ci", "cv"))
      phashChunks(batch).as("b").join(keptIdx.as("x"),
          col("b.ci") === col("x.ci") && col("b.cv") === col("x.cv"))
        .select(col("b.doc_id").as("doc_id"), col("x.doc_id").as("dup_of"),
          expr("CAST(bit_count(b.lo ^ x.lo) + bit_count(b.hi ^ x.hi) AS BIGINT)").as("ham"))
        .distinct()
        .filter(col("ham") <= 3)
        .orderBy("doc_id", "dup_of")
    })
  )

  /** The 4×16-bit band explode of a (doc_id, lo, hi) signature frame —
    * the ONE chunk/band layout shared by the full pair search, the
    * incremental batch probe, and (implicitly) the stored
    * phash_sig_index convention: a layout change must reach every
    * consumer or arriving batches silently probe mismatched bands. */
  private def phashChunks(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("lo"), col("hi"),
      explode(array(
        struct(lit(0).as("ci"), expr("lo % 65536").as("cv")),
        struct(lit(1).as("ci"), expr("lo div 65536").as("cv")),
        struct(lit(2).as("ci"), expr("hi % 65536").as("cv")),
        struct(lit(3).as("ci"), expr("hi div 65536").as("cv")))).as("c"))
      .select(col("doc_id"), col("lo"), col("hi"),
        col("c.ci").as("ci"), col("c.cv").as("cv"))

  /** Banded Hamming-≤3 pair search over (doc_id, lo, hi) signatures with
    * the MaxBandPop stop-band drop. Factored so the cap's firing is
    * negative-control-testable on a synthetic signature frame. */
  private[ops] def phashPairs(sigs: DataFrame): DataFrame = {
    val allChunks = phashChunks(sigs)
    // stop-band drop (MaxBandPop): the pops agg and the filter join
    // reuse the (ci, cv) key the self-join shuffles on
    val pops = allChunks.groupBy("ci", "cv").agg(count(lit(1)).as("pop"))
    val chunks = allChunks.join(pops.filter(col("pop") <= MaxBandPop), Seq("ci", "cv"))
    chunks.as("x").join(chunks.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
        expr("CAST(bit_count(x.lo ^ y.lo) + bit_count(x.hi ^ y.hi) AS BIGINT)").as("ham"))
      .distinct()
      .filter(col("ham") <= 3)
      .orderBy("da", "db")
  }

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
         FROM b GROUP BY doc_id, fr ORDER BY doc_id, frame""",

    // full aHash replay: byte i → block (i·64)//n, bit = integer
    // cross-multiplied mean comparison, 2×32-bit signature halves, the
    // simhash64 4×16-bit band join, Hamming ≤ 3 (text is ascii, so
    // payload bytes == char codes)
    "mm_dedup_phash" ->
      s"""WITH $phashSigSql,
         allchunks AS (
           SELECT doc_id, lo, hi, 0 AS ci, lo % 65536 AS cv FROM sig
           UNION ALL SELECT doc_id, lo, hi, 1, lo // 65536 FROM sig
           UNION ALL SELECT doc_id, lo, hi, 2, hi % 65536 FROM sig
           UNION ALL SELECT doc_id, lo, hi, 3, hi // 65536 FROM sig),
         pops AS (SELECT ci, cv, count(*) AS pop FROM allchunks GROUP BY ci, cv),
         chunks AS (SELECT a.* FROM allchunks a JOIN pops p
                    ON a.ci = p.ci AND a.cv = p.cv AND p.pop <= 64)
         SELECT DISTINCT x.doc_id AS da, y.doc_id AS db,
                CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) AS BIGINT) AS ham
         FROM chunks x JOIN chunks y
           ON x.ci = y.ci AND x.cv = y.cv AND x.doc_id < y.doc_id
         WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) <= 3
         ORDER BY da, db""",

    // same signature chain; the index side is ids < 100000 (the stored
    // artifact), the batch ids >= 100000; stop bands from INDEX pops
    "mm_dedup_phash_incr" ->
      s"""WITH $phashSigSql,
         idx AS (SELECT * FROM sig WHERE doc_id < 100000),
         bat AS (SELECT * FROM sig WHERE doc_id >= 100000),
         ichunks AS (
           SELECT doc_id, lo, hi, 0 AS ci, lo % 65536 AS cv FROM idx
           UNION ALL SELECT doc_id, lo, hi, 1, lo // 65536 FROM idx
           UNION ALL SELECT doc_id, lo, hi, 2, hi % 65536 FROM idx
           UNION ALL SELECT doc_id, lo, hi, 3, hi // 65536 FROM idx),
         pops AS (SELECT ci, cv, count(*) AS pop FROM ichunks GROUP BY ci, cv),
         kept AS (SELECT a.* FROM ichunks a JOIN pops p
                  ON a.ci = p.ci AND a.cv = p.cv AND p.pop <= 64),
         bchunks AS (
           SELECT doc_id, lo, hi, 0 AS ci, lo % 65536 AS cv FROM bat
           UNION ALL SELECT doc_id, lo, hi, 1, lo // 65536 FROM bat
           UNION ALL SELECT doc_id, lo, hi, 2, hi % 65536 FROM bat
           UNION ALL SELECT doc_id, lo, hi, 3, hi // 65536 FROM bat)
         SELECT DISTINCT b.doc_id AS doc_id, x.doc_id AS dup_of,
                CAST(bit_count(xor(b.lo, x.lo)) + bit_count(xor(b.hi, x.hi)) AS BIGINT) AS ham
         FROM bchunks b JOIN kept x ON b.ci = x.ci AND b.cv = x.cv
         WHERE bit_count(xor(b.lo, x.lo)) + bit_count(xor(b.hi, x.hi)) <= 3
         ORDER BY doc_id, dup_of"""
  )

  /** Oracle CTE chain: planted corpus (base + byte-0-edited copies) →
    * aHash signatures `sig` (doc_id, lo, hi) — shared by the full pair
    * search and the incremental probe. */
  private def phashSigSql: String =
    """corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000 AS doc_id, 'Z' || substr(text, 2) AS text
           FROM documents WHERE doc_id % 7 = 0),
         b AS (SELECT doc_id, length(text) AS n, text,
                      unnest(range(0, length(text))) AS i
               FROM corpus),
         bytes AS (SELECT doc_id, n, i * 64 // n AS blk,
                          ascii(substring(text, CAST(i AS INT) + 1, 1)) AS v
                   FROM b),
         blocks AS (SELECT doc_id, n, blk, sum(v) AS sb, count(*) AS cb
                    FROM bytes GROUP BY doc_id, n, blk),
         tot AS (SELECT doc_id, sum(sb) AS st FROM blocks GROUP BY doc_id),
         bits AS (SELECT blocks.doc_id AS doc_id, blk,
                         CASE WHEN sb * n > st * cb THEN 1 ELSE 0 END AS bit
                  FROM blocks JOIN tot ON blocks.doc_id = tot.doc_id),
         sig AS (SELECT doc_id,
                        CAST(sum(CASE WHEN blk < 32 AND bit = 1
                                 THEN CAST(pow(2, blk) AS BIGINT) ELSE 0 END) AS BIGINT) AS lo,
                        CAST(sum(CASE WHEN blk >= 32 AND bit = 1
                                 THEN CAST(pow(2, blk - 32) AS BIGINT) ELSE 0 END) AS BIGINT) AS hi
                 FROM bits GROUP BY doc_id)"""
}
