package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Quality gates at INGEST — the classifier and domain filters as one
  * code path shared by the batch curation pipeline (curate_pipeline_v2)
  * and the streaming ingest job, the TimeframeRules discipline: a gate
  * whose batch and streaming spellings could drift would make "what got
  * into the corpus" depend on which path admitted it.
  *
  * Both gates are deliberately STATELESS on the stream:
  *  - the classifier is the fused quality_score_md5 kernel — pure per-row
  *    algebra, no state, no watermark interaction, so it rides a
  *    streaming micro-batch identically to a batch scan;
  *  - the domain decision is applied from a PRECOMPUTED decision table
  *    broadcast onto the stream. A stream cannot compute global
  *    per-domain statistics without unbounded state, and production does
  *    not want it to: domain keep/drop decisions should be stable,
  *    versioned artifacts (recomputed by the batch stats job, swapped in
  *    on redeploy), not values that drift mid-stream as counts accumulate
  *    — two ingest workers seeing different prefixes must not disagree
  *    about a domain.
  */
object IngestFilters {
  /** Classifier gate over (.., text) rows: adds integer n_tokens + score
    * (exact sums — the keep bit is order-independent) and keeps rows with
    * score > 0. Narrow; works on a batch frame and a streaming frame. */
  def classifierGate(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_tokens", size(col("w")).cast("long"))
      .withColumn("score", expr("quality_score_md5(w)"))
      .drop("w")
      .filter(col("score") > 0)
  }

  /** The per-domain keep decision table (source, keep) from a BATCH frame
    * with (source, n_tokens): keep when sum(tokens) ≥ 54·docs — an
    * integer comparison, so a knife-edge domain decides identically on
    * every engine and every run. Batch-only by design (global stats);
    * the output is the artifact domainGate broadcasts. */
  def domainDecisions(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(count(lit(1)).as("docs"), sum("n_tokens").as("toks"))
      .select(col("source"), (col("toks") >= col("docs") * MinTokensPerDoc).as("keep"))

  /** The domain keep threshold: a domain survives when its total tokens
    * clear `MinTokensPerDoc · docs` (the integer spelling of "mean ≥ 54
    * tokens/doc"). ONE definition site — curate_domain_quality and the
    * ingest gate both read it, so batch analytics and the ingest
    * admission rule cannot drift. */
  val MinTokensPerDoc = 54L

  /** The domain-decision table as a DURABLE VERSIONED ARTIFACT
    * (`domain_decisions`): classifier-gated base corpus → per-domain
    * keep bits, resolved through Tables.cachedFrame so it is computed at
    * most once per session (localCheckpoint memo) and, with
    * GRAFT_INDEX_DIR set, once per STORE — IndexBuild builds it, the
    * ingest job and any probing session read the stored table. This is
    * what makes the decision a stable artifact rather than a lazy plan:
    * without materialization every broadcast of the frame re-executes
    * the full base scan + classifier kernel + per-source aggregate —
    * at 100 TB, a corpus pass per micro-batch. */
  def domainDecisionsArtifact(s: SparkSession, dir: String): DataFrame =
    Tables.cachedFrame(s, dir, "domain_decisions")(
      domainDecisions(classifierGate(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("text")))))

  /** Domain gate: admit rows whose source the decision table keeps. The
    * tiny decision frame broadcasts; on a stream this is the standard
    * stream-static broadcast join — zero streaming state. */
  def domainGate(docs: DataFrame, decisions: DataFrame): DataFrame =
    docs.join(broadcast(decisions), "source")
      .filter(col("keep"))
      .drop("keep")

  /** Cluster routing at ingest: assign each arriving embedding to the
    * nearest STORED cluster centroid (the knn_cluster_centarr artifact,
    * derived from the durable labels — read driver-side as k rows of
    * (cluster, centroid) and baked into the plan). The argmin is a
    * codegen'd least() over k (dist, cluster) structs — identical
    * tie-break to the batch query's min(struct) — so routing is pure
    * per-row algebra: no join, no aggregation, no streaming state, and
    * a stream and a batch frame take the exact same path. At very large
    * k the artifact goes hierarchical (coarse level first), the IVF
    * swap. Adds `cluster` and `dist_r` columns. */
  def clusterAssign(docs: DataFrame, centroids: Seq[(Long, Seq[Double])]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    require(centroids.nonEmpty, "clusterAssign: empty centroid artifact")
    val cands = centroids.map { case (lbl, carr) =>
      struct(
        round(expr(s"vec_sqdist(embedding, array(${carr.map(v => s"${v}D").mkString(",")}))"), 6)
          .as("dist"),
        lit(lbl).as("cluster"))
    }
    val m = if (cands.size == 1) cands.head else least(cands: _*)
    docs.withColumn("m", m)
      .withColumn("cluster", col("m.cluster"))
      .withColumn("dist_r", col("m.dist"))
      .drop("m")
  }
}
