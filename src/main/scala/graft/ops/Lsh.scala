package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Random-hyperplane LSH sizing + bucketing, shared by the embedding
  * near-dup dedup (Dedup.scala) and the ANN search (Similarity.scala).
  *
  * The plane count is NOT fixed: a fixed count means a fixed number of
  * buckets, so per-bucket population — and the candidate-pair space of any
  * bucket equi-join — grows linearly with the corpus, i.e. the join is
  * O(n²/buckets). ScaleProbe measured exactly that before round 5: 10×
  * data → 10× time at the old hard-coded 4 planes. Deriving the count
  * from the corpus size caps expected bucket population at
  * `TargetBucketPop`, making the pair space O(n · targetPop) — linear.
  *
  * `planesFor` is the smallest p ≥ 4 with 2^p · targetPop ≥ n, computed
  * with integer shifts (no log2/ceil floating point) so the DuckDB oracle
  * can compute the IDENTICAL count in SQL — `paramsSql` emits that
  * replay. The corpus count feeding it is memoized per session
  * (Tables.cachedStat) — it is the same scan-level statistic AQE reads,
  * and at 100 TB it comes from table metadata; re-running a sizing job on
  * every invocation was half of the round-5 sim_lsh_ann regression.
  *
  * Plane weights are the deterministic integer grid
  * w(p, d) = ((p·131 + d·137) mod 97) − 48 — replayable in SQL, dense
  * (no zero planes), and sign-balanced. Weights repeat every 97 (p, d)
  * steps, which is harmless: planes stay pairwise distinct for p < 97.
  */
object Lsh {
  val MinPlanes = 4
  val MaxPlanes = 30 // 2^30 buckets ≫ any corpus we'd bucket single-key
  val TargetBucketPop = 64L

  /** Smallest p in [MinPlanes, MaxPlanes] with 2^p · targetPop ≥ n. */
  def planesFor(n: Long, targetPop: Long = TargetBucketPop): Int = {
    var p = MinPlanes
    while (p < MaxPlanes && (1L << p) * targetPop < n) p += 1
    p
  }

  /** (plane count, vector dim) for `corpus`, both backed by once-per-session
    * memoized statistics (Tables.cachedStat under `key`) — the jobs that
    * compute them run on the FIRST invocation only. `corpus` must be the
    * frame the caller buckets (same (session, dir) immutability contract as
    * Tables.dfCache). */
  def sizing(spark: SparkSession, dir: String, key: String, corpus: DataFrame,
             vecCol: String = "embedding"): (Int, Int) = {
    val n = Tables.cachedStat(spark, dir, s"count:$key")(corpus.count())
    // head(1) not head(): an EMPTY corpus must fail with a message naming
    // the real problem, not a bare NoSuchElementException from deep inside
    // the sizing job (and must not poison the memo — cachedStat only
    // stores after a successful compute)
    val dim = Tables.cachedStat(spark, dir, s"dim:$key")(
      corpus.select(size(col(vecCol))).head(1) match {
        case Array(r) => r.getInt(0).toLong
        case _ => throw new IllegalArgumentException(
          s"Lsh.sizing: corpus '$key' under $dir is empty — cannot infer " +
            s"the $vecCol dimension (nothing to bucket)")
      })
    (planesFor(n), dim.toInt)
  }

  /** Projection of `vecCol` (array<float/double>, `dim` elements) onto
    * plane p — a single codegen'd vec_dot against a LITERAL weight array.
    * The weights are baked in as double literals at plan-build time:
    * constant folding collapses the `array(...)` to one array Literal, so
    * the whole projection is a vec_dot loop inside whole-stage codegen.
    * (The previous `transform(sequence(0, size(v)-1), d -> ...)` spelling
    * is a higher-order function — CodegenFallback — so every row
    * materialized the weight vector and ran INTERPRETED, per plane, on
    * both sides of the bucket self-join: the other half of the round-5
    * sim_lsh_ann regression.) vec_dot nulls on length mismatch, so `dim`
    * must be the actual vector width — callers read it once per session
    * via Tables.cachedStat. */
  def planeDot(p: Int, vecCol: String, dim: Int): Column = {
    val ws = (0 until dim)
      .map(d => s"${(((p * 131 + d * 137) % 97) - 48).toDouble}D")
      .mkString(",")
    expr(s"vec_dot($vecCol, array($ws))")
  }

  /** Bucket id = sign bits of all `planes` projections packed into a long. */
  def bucket(planes: Int, vecCol: String, dim: Int): Column =
    (0 until planes)
      .map(p => when(planeDot(p, vecCol, dim) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)

  // ---- Balanced-split (median-thresholded) variant ----------------------
  //
  // Sign-at-zero bucketing assumes each plane's projection distribution
  // straddles 0. On this corpus it does NOT: measured at the 100× probe
  // scale, only 1 200 of 4 096 buckets were occupied with an effective
  // bucket population of 898 against the 64 target — a 5.8× pair-space
  // blow-up between the 30× and 100× points that made the all-nodes kNN
  // queries super-linear. The classic fix is balanced hyperplane LSH:
  // threshold each plane at its corpus MEDIAN projection, so every bit
  // splits the corpus 50/50 by construction.
  //
  // Cross-engine discipline: per-vector projections are scaled to exact
  // integers d6 = round(dot·1e6) (the same rounding both engines already
  // share for cosines); the stored threshold is t2 = 2·median(d6) — an
  // INTEGER for both odd and even corpus sizes, since the even-n
  // interpolated median (a+b)/2 doubles back to a+b — and the bit test is
  // the all-integer comparison 2·d6 ≥ t2. No float-summation or division
  // channel anywhere. The thresholds are one corpus aggregation per
  // session (memoized below; index METADATA at deployment — built with
  // the index, read by probes; swap exact percentile for approx at
  // 100 TB corpus sizes and persist it like any other index artifact).
  private val thrCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), Seq[Long]]

  /** 2×median of round(planeDot·1e6) per plane, one job, memoized per
    * (session, dir, key). */
  def medianThr2(spark: SparkSession, dir: String, key: String,
                 corpus: DataFrame, planes: Int, dim: Int,
                 vecCol: String = "embedding"): Seq[Long] = {
    thrCache.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    // locked fill, same rationale as Tables.cachedStat: a bare TrieMap
    // getOrElseUpdate may evaluate racing thunks twice, and this thunk
    // runs a per-plane percentile Spark job (idempotent result, so the
    // race only wastes a corpus aggregation — but parallel suites share
    // the session and would pay it)
    thrCache.synchronized {
      thrCache.getOrElseUpdate((spark, dir, key), {
        val withD = corpus.select((0 until planes).map(p =>
          round(planeDot(p, vecCol, dim) * lit(1e6)).cast("long").as(s"d$p")): _*)
        val aggs = (0 until planes).map(p =>
          expr(s"CAST(round(2 * percentile(d$p, 0.5D)) AS BIGINT)").as(s"t$p"))
        val row = withD.agg(aggs.head, aggs.tail: _*).head()
        (0 until planes).map(row.getLong)
      })
    }
  }

  /** Bucket id from median-thresholded plane bits (balanced splits). */
  def centeredBucket(planes: Int, vecCol: String, dim: Int,
                     thr2: Seq[Long]): Column =
    (0 until planes)
      .map(p => when(
        round(planeDot(p, vecCol, dim) * lit(1e6)).cast("long") * 2L >= lit(thr2(p)),
        lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** DuckDB CTEs `pd` + `d6` + `thr` + `buckets` replaying the
    * median-thresholded bucketing over `comp` for `params.np` planes. */
  val centeredBucketsSql: String =
    s"""pd AS (
          SELECT vec_id, p, sum(CAST(x AS DOUBLE) * ((p * 131 + d * 137) % 97 - 48)) AS dot
          FROM comp
          CROSS JOIN (SELECT CAST(i AS INT) AS p FROM range($MaxPlanes) t(i))
          CROSS JOIN params
          WHERE p < params.np
          GROUP BY vec_id, p),
        d6 AS (SELECT vec_id, p, CAST(round(dot * 1e6) AS BIGINT) AS d6 FROM pd),
        thr AS (SELECT p, CAST(round(2 * quantile_cont(d6, 0.5)) AS BIGINT) AS t2
                FROM d6 GROUP BY p),
        buckets AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN 2 * d6 >= t2 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)
                      AS BIGINT) AS bucket
          FROM d6 JOIN thr USING (p) GROUP BY vec_id)"""

  /** DuckDB CTE computing the same plane count from the same corpus count:
    * `params(np)` — smallest p ≥ 4 with (1::BIGINT << p) · targetPop ≥ n.
    * `corpusRel` must be a relation already defined in the WITH chain. */
  def paramsSql(corpusRel: String, targetPop: Long = TargetBucketPop): String =
    // coalesce: when no p in [MinPlanes, MaxPlanes] satisfies the bound
    // (extreme corpus), min() over the empty set is NULL — planesFor caps
    // at MaxPlanes, so the replay must too, or the buckets CTE silently
    // empties and the oracle returns zero pairs.
    s"""params AS (
          SELECT coalesce(min(p), $MaxPlanes) AS np
          FROM range($MinPlanes, ${MaxPlanes + 1}) t(p)
          CROSS JOIN (SELECT count(*) AS n FROM $corpusRel) c
          WHERE (CAST(1 AS BIGINT) << p) * $targetPop >= c.n)"""

  /** DuckDB CTEs `pd` + `buckets` replaying planeDot/bucket over `comp`
    * (vec_id, x, d — the unnested components) for `params.np` planes. */
  val bucketsSql: String =
    s"""pd AS (
          SELECT vec_id, p, sum(CAST(x AS DOUBLE) * ((p * 131 + d * 137) % 97 - 48)) AS dot
          FROM comp
          CROSS JOIN (SELECT CAST(i AS INT) AS p FROM range($MaxPlanes) t(i))
          CROSS JOIN params
          WHERE p < params.np
          GROUP BY vec_id, p),
        buckets AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN dot >= 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)
                      AS BIGINT) AS bucket
          FROM pd GROUP BY vec_id)"""
}
