package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  * replay. One `count()` job sizes the index per invocation; that is the
  * same scan-level statistic AQE reads, and at 100 TB it comes from table
  * metadata instead.
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

  /** Projection of `vecCol` (array<float/double>) onto plane p — a single
    * codegen'd vec_dot against the inline weight vector; fully narrow. */
  def planeDot(p: Int, vecCol: String): Column = expr(
    s"""vec_dot($vecCol, transform(sequence(0, size($vecCol) - 1),
          d -> CAST((($p * 131 + d * 137) % 97) - 48 AS DOUBLE)))""")

  /** Bucket id = sign bits of all `planes` projections packed into a long. */
  def bucket(planes: Int, vecCol: String): Column =
    (0 until planes)
      .map(p => when(planeDot(p, vecCol) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** DuckDB CTE computing the same plane count from the same corpus count:
    * `params(np)` — smallest p ≥ 4 with (1::BIGINT << p) · targetPop ≥ n.
    * `corpusRel` must be a relation already defined in the WITH chain. */
  def paramsSql(corpusRel: String, targetPop: Long = TargetBucketPop): String =
    s"""params AS (
          SELECT min(p) AS np
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
