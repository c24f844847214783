package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the driver's `documents` table: token counting, quality scoring,
  * language-ID heuristic, and document fingerprinting.
  *
  * Everything is narrow, stateless, codegen-friendly column algebra — no
  * UDFs, no shuffles except the explicit per-doc aggregation in the
  * fingerprint (hash-partitioned by doc_id, map-side combined). Each op has
  * a DuckDB oracle computing the identical formula, so results hash-match.
  *
  * Scale: all ops are embarrassingly parallel per document; at 100 TB the
  * only shuffle is fingerprint's groupBy(doc_id), which pre-aggregates
  * map-side. Nothing collects to the driver.
  */
object TextOps {
  private val stopList = Seq("the", "a", "of", "and", "to", "is")
  private def stopSql = stopList.map(w => s"'$w'").mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens, regex (BPE-ish pre-tokenizer)
    // tokens, chars, and a chars/4 BPE estimate.
    "text_tokens" -> ((s, dir) => {
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)")).as("re_tokens"),
        length(col("text")).as("chars"),
        ceil(length(col("text")) / lit(4.0)).cast("long").as("est_bpe"))
        .orderBy("doc_id")
    }),

    // Quality scoring: word count, stopword ratio, mean word length, and a
    // composite score — the usual cheap pre-filters before LLM training.
    "text_quality" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("n_words", size(split(col("text"), " ")))
        .withColumn("n_stop",
          expr(s"size(filter(split(text, ' '), w -> w IN ($stopSql)))"))
        .select(
          col("doc_id"), col("n_words"),
          round(col("n_stop") / (col("n_words") * lit(1.0)), 4).as("stop_ratio"),
          round(length(regexp_replace(col("text"), " ", "")) / (col("n_words") * lit(1.0)), 3)
            .as("mean_wlen"),
          round(least(col("n_words"), lit(400)) / lit(400.0)
            * (lit(1.0) - col("n_stop") / (col("n_words") * lit(1.0))), 4).as("score"))
        .orderBy("doc_id")
    }),

    // Language-ID heuristic: score function-word markers per language and
    // argmax. (The synthetic corpus shares one vocabulary, so the guess is
    // the heuristic's honest output, oracle-checked for determinism.)
    "text_langid" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("en_hits",
          expr(s"size(filter(split(text, ' '), w -> w IN ($stopSql)))"))
        .withColumn("fr_hits",
          expr("size(filter(split(text, ' '), w -> w IN ('le', 'la', 'et', 'un', 'une')))"))
        .select(
          col("doc_id"), col("en_hits"), col("fr_hits"),
          when(col("en_hits") >= 5 && col("en_hits") > col("fr_hits"), "en")
            .when(col("fr_hits") >= 5, "fr")
            .otherwise("und").as("guess"))
        .orderBy("doc_id")
    }),

    // End-to-end training-data pipeline composition: quality-filter →
    // exact-dedup (md5 canonical) → per-language corpus stats. The shape a
    // real data-curation job takes: all stages fuse into scan → narrow
    // filters → two hash shuffles (dedup group, stats group).
    "text_pipeline_e2e" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .withColumn("n_words", size(split(col("text"), " ")))
        .withColumn("n_stop",
          expr(s"size(filter(split(text, ' '), w -> w IN ($stopSql)))"))
        .filter(col("n_words") >= 20 &&
          col("n_stop") / (col("n_words") * lit(1.0)) <= 0.5)
      val canonical = docs
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
      docs.join(canonical, "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("docs"),
          sum(col("n_words")).as("tokens"),
          round(avg(col("n_words")), 2).as("avg_tokens"))
        .orderBy("lang")
    }),

    // Document fingerprint: positional polynomial hash over words — the
    // rolling-hash shape used for content-defined dedup keys.
    "text_fingerprint" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .groupBy("doc_id")
        .agg((sum((ascii(col("word")) * 31 + length(col("word"))) * (col("pos") + 1))
          % 1000000007L).as("fp"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
                len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)) AS re_tokens,
                length(text) AS chars,
                CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe
         FROM documents ORDER BY doc_id""",

    "text_quality" ->
      s"""SELECT doc_id, n_words,
            round(n_stop / (n_words * 1.0), 4) AS stop_ratio,
            round(length(replace(text, ' ', '')) / (n_words * 1.0), 3) AS mean_wlen,
            round(least(n_words, 400) / 400.0 * (1.0 - n_stop / (n_words * 1.0)), 4) AS score
          FROM (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_words,
                   len(list_filter(string_split(text, ' '), w -> w IN ($stopSql))) AS n_stop
            FROM documents) ORDER BY doc_id""",

    "text_langid" ->
      s"""SELECT doc_id, en_hits, fr_hits,
            CASE WHEN en_hits >= 5 AND en_hits > fr_hits THEN 'en'
                 WHEN fr_hits >= 5 THEN 'fr' ELSE 'und' END AS guess
          FROM (
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), w -> w IN ($stopSql))) AS en_hits,
                   len(list_filter(string_split(text, ' '),
                       w -> w IN ('le', 'la', 'et', 'un', 'une'))) AS fr_hits
            FROM documents) ORDER BY doc_id""",

    "text_pipeline_e2e" ->
      s"""WITH docs AS (
            SELECT doc_id, lang, text,
                   len(string_split(text, ' ')) AS n_words,
                   len(list_filter(string_split(text, ' '), w -> w IN ($stopSql))) AS n_stop
            FROM documents),
          kept AS (
            SELECT * FROM docs
            WHERE n_words >= 20 AND n_stop / (n_words * 1.0) <= 0.5),
          canonical AS (
            SELECT md5(text) AS h, min(doc_id) AS doc_id FROM kept GROUP BY 1)
          SELECT lang, count(*) AS docs, CAST(sum(n_words) AS BIGINT) AS tokens,
                 round(avg(n_words), 2) AS avg_tokens
          FROM kept JOIN canonical USING (doc_id)
          GROUP BY lang ORDER BY lang""",

    "text_fingerprint" ->
      """SELECT doc_id,
                CAST(sum((ascii(word) * 31 + length(word)) * pos) % 1000000007 AS BIGINT) AS fp
         FROM (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                  generate_subscripts(string_split(text, ' '), 1) AS pos
           FROM documents)
         GROUP BY doc_id ORDER BY doc_id"""
  )
}
