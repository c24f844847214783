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
  private[ops] def stopSql = stopList.map(w => s"'$w'").mkString(", ")

  /** Blocklist gates (the C4 badwords discipline, corpus-appropriate
    * stand-ins): exact-token words and substring phrases. Config in a
    * deployment; literal here so both engines share one list. */
  private val blockWords = Seq("dup", "deadlock")
  private def blockWordsSql = blockWords.map(w => s"'$w'").mkString(", ")
  private[ops] val blockPhrases = Seq("slow query", "lorem ipsum")

  /** Integer-scaled inverse document frequency — ONE formula string shared
    * verbatim by the Spark plan and the DuckDB oracle (the engine-parity
    * convention): ln evaluates per WORD (vocab-sized), scaled ×1e6 and
    * floored into an exact integer before any per-document arithmetic. */
  private val idf6Sql =
    "CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 1e6) AS BIGINT)"
  private val P = 2147483647L // 2^31-1, same id space as Dedup's shingle ids

  private val emailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** (doc_id, gid) word-8-gram ids via md5 → long (bit-identical in DuckDB).
    * Built narrowly in one fused kernel pass (`shingle_sids_md5(w, 8)` —
    * graft.functions.ShingleIdsExpr, byte-identical to the previous
    * transform/array_distinct/concat_ws/md5 HOF chain) — zero shuffles,
    * same shape as Dedup.sidArrays. */
  private def gram8(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 8)
      .select(col("doc_id"), explode(expr("shingle_sids_md5(w, 8)")).as("gid"))
  }

  /** (gram, h) bigram posting stream for the heavy-hitter family:
    * per-doc distinct grams from the fused ngrams_ws kernel, each with
    * its md5-52-bit id — the CMS and report key (grams never shuffle as
    * strings on the sketch path; the text_ngram_novelty 100× lesson). */
  private def hhPosts(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(expr("ngrams_ws(w, 2)")).as("gram"))
      .withColumn("h",
        expr("CAST(conv(substr(md5(gram), 1, 13), 16, 10) AS BIGINT)"))
  }

  /** The 4 CMS row-buckets of `h`: the 4 disjoint 12-bit slices at bit
    * offsets 0/12/24/36 of the 52-bit id — deterministic
    * pairwise-independent-enough row hashes with no seeded RNG,
    * replayable bit-for-bit by the oracle. Note the top 4 bits (48..52)
    * go UNUSED, and slices of one md5 value are weaker than 4
    * independent hashes — acceptable because CMS error stays one-sided
    * (over-estimates only) and the exact-df arm measures the realized
    * precision; if more independence is ever needed, fold bits 36..52
    * into the 4th slice with an xor. */
  private def hhBuckets = posexplode(array((0 until 4).map(j =>
    expr(s"shiftright(h, ${12 * j}) % 4096")): _*))

  /** 4×4096-cell Count-Min sketch of a posting stream. Per-cell counts
    * are commutative partials: the sketch is merge-order-free, and two
    * sketches over disjoint streams merge by elementwise ADDITION —
    * the property text_heavy_hitters_incr's maintenance rides on. */
  private def hhCms(posts: DataFrame): DataFrame =
    posts.select(hhBuckets.as(Seq("j", "bucket")))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))

  /** Oracle replay of the heavy-hitter report over an arbitrary corpus
    * relation: identical 52-bit md5 gram ids, 12-bit-slice row hashes
    * (dv = 2^(12j) divisors), per-cell counts, min-of-4 estimate, and
    * the sketch-side ≥ T emission with the exact-df truth flag. */
  private def hhCmsSqlFor(corpusSql: String) =
    s"""WITH corpus AS ($corpusSql),
        d AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus
              WHERE len(string_split(text, ' ')) >= 2),
        g AS (SELECT DISTINCT doc_id, array_to_string(w[i : i + 1], ' ') AS gram
              FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM d)),
        ph AS (SELECT doc_id, gram,
                 CAST(concat('0x', substr(md5(gram), 1, 13)) AS BIGINT) AS h
               FROM g),
        js AS (SELECT * FROM (VALUES (0, 1), (1, 4096), (2, 16777216),
                                     (3, 68719476736)) t(j, dv)),
        cms AS (SELECT j, (h // dv) % 4096 AS bucket, count(*) AS cnt
                FROM ph CROSS JOIN js GROUP BY 1, 2),
        exact AS (SELECT h, count(*) AS df, min(gram) AS gram
                  FROM ph GROUP BY h),
        est AS (SELECT e.h, min(c.cnt) AS est
                FROM exact e CROSS JOIN js
                JOIN cms c ON c.j = js.j AND c.bucket = (e.h // js.dv) % 4096
                GROUP BY e.h),
        t AS (SELECT GREATEST(2, (count(*) * 8) // 100) AS t FROM corpus)
        SELECT e.gram, e.df, s.est,
               CAST(CASE WHEN e.df >= t.t THEN 1 ELSE 0 END AS BIGINT) AS true_hh
        FROM exact e JOIN est s ON e.h = s.h CROSS JOIN t
        WHERE s.est >= t.t
        ORDER BY gram"""

  /** Heavy-hitter report: sketch-side ≥ T emission with the exact-df
    * truth arm attached (rationale at text_heavy_hitters_cms). `posts`
    * must be the FULL posting stream the sketch summarizes (or a subset
    * of it); `t` a 1-row threshold frame.
    *
    * Stale-sketch guard: CMS estimates are one-sided (est ≥ true df for
    * every gram in the summarized stream), so an estimate that is NULL
    * (no matching cell — possible only against a sketch built over a
    * DIFFERENT stream) or BELOW the exact df convicts the durable base
    * artifact of being out of sync with the corpus — e.g. data changed
    * under cms_bigram_base. That used to underestimate or silently drop
    * rows; it now raises, the same loud-failure discipline every other
    * durable artifact gets from its canary. */
  private def hhReport(posts: DataFrame, cms: DataFrame, t: DataFrame): DataFrame = {
    val exact = posts.groupBy("h")
      .agg(count(lit(1)).as("df"), min("gram").as("gram"))
      .localCheckpoint() // 2 consumers: estimate probe + report join
    val est = exact.select(col("h"), hhBuckets.as(Seq("j", "bucket")))
      .join(broadcast(cms), Seq("j", "bucket"), "left")
      // a bucket with no sketch cell means the sketch counted 0 there —
      // coalesce to 0 BEFORE the min, or a gram missing from some-but-not-
      // all of its 4 buckets takes its min over only the matched cells and
      // can dodge the est>=df conviction (advisor finding: partial
      // staleness slipped the guard; est=0 < df now always raises)
      .groupBy("h").agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    exact.join(est, Seq("h"), "left").crossJoin(broadcast(t))
      .withColumn("est",
        when(col("est").isNull || col("est") < col("df"),
          raise_error(format_string(
            "stale CMS sketch: gram '%s' has df=%s but sketch estimate %s " +
              "— the sketch does not summarize this posting stream",
            col("gram"), col("df"), col("est"))))
          .otherwise(col("est")))
      .filter(col("est") >= col("t"))
      .select(col("gram"), col("df"), col("est"),
        when(col("df") >= col("t"), 1L).otherwise(0L).as("true_hh"))
      .orderBy("gram")
  }

  /** The BPE training replay as DuckDB CTEs (vocab0, m1..mN, vocab1..):
    * shared by the text_bpe_train oracle (reads the mN rows) and the
    * text_bpe_tokens oracle (applies them to the corpus). */
  private def bpeTrainCtes: String = {
    def mSql(v: String, m: String) =
      s"""$m AS (
            SELECT pair, replace(pair, ' ', '') AS merged,
                   CAST(sum(freq) AS BIGINT) AS cnt
            FROM (SELECT freq,
                    unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS pair
                  FROM (SELECT freq, string_split(trim(sp), '  ') AS t FROM $v)
                  WHERE len(t) >= 2)
            GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1)"""
    def vSql(prev: String, m: String, v: String) =
      s"""$v AS (SELECT freq,
                   replace(sp,
                     ' ' || replace((SELECT pair FROM $m), ' ', '  ') || ' ',
                     ' ' || (SELECT merged FROM $m) || ' ') AS sp
                 FROM $prev)"""
    val ctes = new StringBuilder(
      """WITH vocab0 AS (
           SELECT word, count(*) AS freq,
                  ' ' || trim(regexp_replace(word, '(.)', '\1  ', 'g')) || ' ' AS sp
           FROM (SELECT unnest(string_split(text, ' ')) AS word
                 FROM documents)
           GROUP BY word)""")
    for (r <- 1 to bpeRounds) {
      ctes ++= ",\n" + mSql(s"vocab${r - 1}", s"m$r")
      if (r < bpeRounds) ctes ++= ",\n" + vSql(s"vocab${r - 1}", s"m$r", s"vocab$r")
    }
    ctes.toString
  }

  /** The BPE tokenization contract as DuckDB SQL — shared verbatim by
    * text_bpe_tokens (chained replaces) and text_bpe_tokens_fused (the
    * kernel): training replay, then the apply chain. */
  private def bpeTokensSql: String = {
    val spCtes = (1 to bpeRounds).map { r =>
      s"""sp$r AS (SELECT doc_id, n_words,
               replace(sp,
                 ' ' || replace((SELECT pair FROM m$r), ' ', '  ') || ' ',
                 ' ' || (SELECT merged FROM m$r) || ' ') AS sp
             FROM sp${r - 1})"""
    }.mkString(",\n          ")
    s"""$bpeTrainCtes,
        sp0 AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_words,
                 ' ' || trim(regexp_replace(regexp_replace(text, ' ', '|', 'g'),
                      '(.)', '\\1  ', 'g')) || ' ' AS sp
          FROM documents),
        $spCtes
        SELECT doc_id,
               CAST(len(string_split(trim(sp), '  ')) - (n_words - 1) AS BIGINT)
                 AS n_tokens,
               md5(sp) AS tok_md5
        FROM sp$bpeRounds ORDER BY doc_id"""
  }

  /** The decontamination contract as DuckDB SQL — shared verbatim by
    * text_decontaminate and text_decontaminate_bloom (the bloom prefilter
    * changes the plan, not the output). */
  private def decontaminateSql: String =
    s"""WITH g AS (
          SELECT DISTINCT doc_id,
            CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % $P AS gid
          FROM (
            SELECT doc_id, unnest(list_transform(range(1, len(w) - 6),
                     i -> array_to_string(w[i:i+7], ' '))) AS gram
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents WHERE len(string_split(text, ' ')) >= 8))),
        bench AS (
          SELECT DISTINCT
            CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % $P AS gid
          FROM (
            SELECT unnest(list_transform(range(1, len(w) - 6),
                     i -> array_to_string(w[i:i+7], ' '))) AS gram
            FROM (SELECT string_split(text, ' ')[3:] AS w
                  FROM documents
                  WHERE doc_id % 10 = 0
                    AND len(string_split(text, ' ')[3:]) >= 8)))
        SELECT doc_id, count(*) AS shared_grams
        FROM g JOIN bench USING (gid)
        GROUP BY doc_id ORDER BY doc_id"""

  /** BPE merge rounds — shared by the Spark training loop and the
    * unrolled oracle replay. */
  private val bpeRounds = 6

  /** Sliding-chunk window/stride (tokens) — shared with the oracle. */
  private val chunkWindow = 50
  private val chunkStride = 40

  /** The trained BPE merge table (r, pair, merged, cnt) as an index frame:
    * built once per session (durable under GRAFT_INDEX_DIR — the stored
    * tokenizer), probed by text_bpe_train (returns it) and
    * text_bpe_tokens (applies it). See the text_bpe_train query comment
    * for the training discipline.
    *
    * Token-sequence ENCODING: one-space pad, two-space gaps
    * (" c1  c2  c3 "). With the pad/gap encoding, the literal-replace
    * rewrite of pattern " a  b " → " ab " is EXACTLY token-aligned greedy
    * BPE: a match must be delimited by spaces on both sides, so a pair
    * can never match a token SUFFIX (with a plain single-space join,
    * pair "a b" also matches inside "xa b" and corrupts the token
    * structure — both engines consistently, which is why only analysis,
    * not the oracle, could catch it). Adjacent occurrences still chain:
    * each match consumes one space of the following gap and leaves the
    * next occurrence its leading space (" a  b  a  b " → " ab  ab "),
    * preserving the greedy left-to-right semantics BPE specifies. */
  /** Per-doc fused BPE tokenization (doc_id, n_words, sp, n_tokens) —
    * the merges fetch + fused bpe_apply pass + the pad/gap token-count
    * formula, shared by text_bpe_tokens_fused and text_bpe_fertility so
    * the count spelling lives in ONE place (the declarative
    * text_bpe_tokens keeps its own spelling deliberately — it IS the
    * equivalence pin for the fused kernel). */
  private def bpeApplied(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val ms = bpeMergesFrame(s, dir).orderBy("r").head(bpeRounds)
      .map(_.getString(1))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        call_function("bpe_apply", col("text"), lit(ms)).as("sp"))
      .withColumn("n_tokens",
        (size(split(trim(col("sp")), "  ")) - (col("n_words") - 1)).cast("long"))
  }

  private def bpeMergesFrame(s: SparkSession, dir: String): DataFrame =
    Tables.cachedFrame(s, dir, "bpe_merges") {
      import s.implicits._
      var vocab = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .select(col("word"), col("freq"),
          concat(lit(" "),
            trim(regexp_replace(col("word"), "(.)", "$1  ")), lit(" ")).as("sp"))
        .localCheckpoint()
      val merges = collection.mutable.Buffer[(Int, String, String, Long)]()
      for (r <- 1 to bpeRounds) {
        val top = vocab
          .select(col("freq"), split(trim(col("sp")), "  ").as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i + 1]))"))
            .as("pair"))
          .groupBy("pair").agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(1).head()
        val (pair, cnt) = (top.getString(0), top.getLong(1))
        val merged = pair.replace(" ", "")
        merges += ((r, pair, merged, cnt))
        vocab = vocab
          .withColumn("sp",
            replace(col("sp"), lit(" " + pair.replace(" ", "  ") + " "),
              lit(" " + merged + " ")))
          .localCheckpoint()
      }
      merges.toSeq.toDF("r", "pair", "merged", "cnt")
    }

  /** BM25 query terms (fixed, so both engines sum contributions in the
    * same syntactic order — cross-row float aggregation never feeds the
    * output: N/df/tf/dl are integers, avgdl = exact-integer-sum / count). */
  private val bm25Terms = Seq("hash", "join", "vector", "stream")

  /** The per-doc BM25 score as ONE formula string shared verbatim by the
    * Spark expr and the DuckDB oracle — identical text, identical
    * left-associative evaluation order, and `e0`-suffixed literals so both
    * engines parse DOUBLE (a bare `1.2` types as DECIMAL in both, with
    * engine-specific promotion rules). k1=1.2, b=0.75; idf is the
    * Robertson/Sparck-Jones form with the +1 floor (always positive). */
  private def bm25ScoreSql: String = bm25Terms.indices.map { i =>
    s"""ln((n - df$i + 0.5e0) / (df$i + 0.5e0) + 1.0e0)
        * (tf$i * (1.2e0 + 1.0e0))
        / (tf$i + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))"""
  }.mkString(" + ")

  /** Multi-query BM25 workload: (q_id, terms). Declared once and rendered
    * into BOTH engines (Spark rows / SQL VALUES) so the workloads can't
    * drift. Terms are real corpus vocabulary. */
  private val bm25Queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("hash", "join", "vector", "stream"), // the single-query terms
    1L -> Seq("window", "scan", "batch"),
    2L -> Seq("filter", "sort", "merge", "query", "key"))

  /** Decontamination benchmark-set workload: (set name, doc-id modulus,
    * words dropped from the head) — each eval suite is a deterministic
    * slice of `documents` with offset quoting. Declared ONCE and
    * rendered into BOTH engines (the bm25Queries discipline) so the
    * workloads cannot drift; a deployment swaps this table for its real
    * eval suites without touching the operator. */
  private val decontamSets: Seq[(String, Long, Int)] = Seq(
    ("evalA", 10L, 2), // the text_decontaminate_spans suite
    ("evalB", 7L, 4))

  /** The per-set benchmark gram ids as DuckDB SQL (bench_set, gid) —
    * rendered from decontamSets, one arm per suite. */
  private def decontamBenchSql: String = decontamSets.map { case (nm, mod, drop) =>
    s"""SELECT '$nm' AS bench_set, gid FROM (
          SELECT DISTINCT
            CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % $P AS gid
          FROM (
            SELECT unnest(list_transform(range(1, len(w) - 6),
                     i -> array_to_string(w[i:i+7], ' '))) AS gram
            FROM (SELECT string_split(text, ' ')[${drop + 1}:] AS w
                  FROM documents
                  WHERE doc_id % $mod = 0
                    AND len(string_split(text, ' ')[${drop + 1}:]) >= 8)))"""
  }.mkString("\nUNION ALL\n")

  /** The multi-suite span oracle (positional replay, windows partitioned
    * by (bench_set, doc_id)) — shared verbatim by the spans query and
    * the per-suite report rollup. */
  private def decontamSpansMultiSql: String =
    s"""WITH bench AS ($decontamBenchSql),
        d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
              WHERE len(string_split(text, ' ')) >= 8),
        posg AS (
          SELECT doc_id, i,
            CAST(concat('0x', substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))
                 AS BIGINT) % $P AS gid
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM d)),
        starts AS (
          SELECT bench_set, doc_id, CAST(i - 1 AS BIGINT) AS i
          FROM posg JOIN bench USING (gid)),
        m AS (SELECT bench_set, doc_id, i,
                max(i + 8) OVER (PARTITION BY bench_set, doc_id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
              FROM starts),
        isl AS (SELECT bench_set, doc_id, i,
                  sum(CASE WHEN prev_max_end IS NULL OR i > prev_max_end
                      THEN 1 ELSE 0 END)
                    OVER (PARTITION BY bench_set, doc_id ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                FROM m)
        SELECT bench_set, doc_id, CAST(min(i) AS BIGINT) AS span_start,
               CAST(max(i) + 8 AS BIGINT) AS span_end
        FROM isl GROUP BY bench_set, doc_id, island
        ORDER BY bench_set, doc_id, span_start"""

  /** Winnowing (Schleimer/Wilkerson/Aiken, MOSS) fingerprint relation
    * (doc_id, fp) over a (doc_id, text) corpus: hash every positional
    * word 4-gram, slide a w=5 window over the hash sequence, select each
    * window's minimum (ties → rightmost), keep the distinct selections.
    * Guarantee: any shared word-run of length ≥ w+k−1 between two docs
    * shares ≥1 fingerprint, at ~2/(w+1) of the full gram count. Docs
    * with fewer grams than the window (4–7 tokens) take the min of ALL
    * their grams (classic boundary rule); docs under 4 tokens are
    * un-fingerprintable and emit nothing.
    *
    * Shape: the whole selection is the fused `winnow_fps` codegen
    * kernel (graft.functions.WinnowFpsExpr) — ZERO shuffle, pure
    * per-row algebra + one narrow explode. History, because this is the
    * third formulation: the transform+posexplode draft tripped
    * PlanAudit's interpreted-HOF detector; the r8 lead()+sliding-min
    * window spelling was declarative but paid a doc_id partition+sort
    * shuffle for per-row work — and a non-time window cannot run on a
    * STREAMING frame at all, which the ingest path needs. The kernel
    * serves batch and streaming identically (StreamingDedup's
    * bandedSignatures discipline); the DuckDB oracles keep the
    * declarative window spelling (winnowFpSqlFor) and the hash match
    * pins the two equivalent. */
  private def winnowFps(corpus: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    corpus
      .select(col("doc_id"), expr("winnow_fps(split(text, ' '))").as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
  }

  /** Stop-fingerprint cap for the winnowing pair search: a fingerprint in
    * more than this many docs is boilerplate and generates no pairs. */
  private val MaxFpDf = 16

  /** Minimum shared fingerprints before a (batch doc, indexed doc) pair
    * counts as a span-level near-dup hit — accidental singleton
    * collisions out. ONE definition site for the batch incremental
    * query and the ingest job's gate. */
  private[graft] val MinSharedFps = 2

  /** The base corpus's DF-CAPPED winnowing postings (fp, doc_id) — the
    * probe side shared by dedup_winnowing_incr and the ingest job's
    * span-level dup-gate: posting index + df metadata are the two
    * durable artifacts, stop fingerprints (df > MaxFpDf) dropped before
    * any join so no boilerplate phrase can blow up a probe. */
  private[graft] def winnowCappedPostings(s: SparkSession, dir: String): DataFrame = {
    val idx = Tables.cachedFrame(s, dir, "winnow_base_index")(
      winnowFps(Tables(s, dir, "documents").select(col("doc_id"), col("text"))))
    val dfs = Tables.cachedFrame(s, dir, "winnow_base_dfs")(
      idx.groupBy("fp").agg(count(lit(1)).as("df")))
    // the CAPPED posting table is itself index metadata (round 19): the
    // df-cap join was re-run on every probe — a full index scan + join
    // per batch arrival — although its inputs are both already-durable
    // artifacts and the result is exactly the probe-side table a
    // deployment stores (stop fingerprints never serve anything). Same
    // convention as winnow_pair_dfs/bm25_dfs; registered in IndexRefresh
    // (derivedFrom winnow_base_index) and round-tripped in
    // DurableIndexSpec. IngestJob's per-job checkpoint now resolves this
    // directly instead of re-joining.
    Tables.cachedFrame(s, dir, "winnow_base_capped")(
      idx.join(dfs.filter(col("df") <= MaxFpDf), "fp")
        .select(col("fp"), col("doc_id")))
  }

  /** Generalized BM25 (q_id, rank, doc_id) top-8 per bm25Queries row via
    * the inverted-index/posting-join formulation a retrieval deployment
    * runs — shared by text_bm25_multi and the multi-query hybrid fusion.
    * Shape: the (term, doc_id, dl, tf) inverted index is ONE map-side-
    * combined shuffle of the token stream, memoized per session and
    * durable under GRAFT_INDEX_DIR; probing filters the posting scan to
    * the query-term set (pushed to the scan), broadcasts the tiny
    * query/df/stats sides, and the per-(q_id, doc) score is an exact-
    * integer sum. Top-8 per query is the bounded topk8_ids aggregate —
    * map-side partials keep ≤8 rows per query, no data-bearing single-
    * partition exchange. At 100 TB: the index is a bucketed table keyed
    * by term; a query batch touches only its terms' postings. */
  private def bm25MultiTopk(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    val qdf = bm25Queries
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }.toDF("q_id", "term")
    val postings = Tables.cachedFrame(s, dir, "bm25_postings")(
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
          explode(col("toks")).as("term"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf")))
    val allTerms = bm25Queries.flatMap(_._2).distinct
    // postings touched at all: query terms only (filter pushed to the
    // memoized/stored index scan)
    val hit = postings.filter(col("term").isin(allTerms: _*))
    // per-term document frequency and corpus stats (N, avgdl) are index
    // METADATA — built once with the index, durable alongside it, so a
    // probe never re-aggregates the posting list
    val dfs = Tables.cachedFrame(s, dir, "bm25_dfs")(
      postings.groupBy("term").agg(count(lit(1)).as("df")))
      .filter(col("term").isin(allTerms: _*))
    val stats = Tables.cachedFrame(s, dir, "bm25_stats")(
      Tables(s, dir, "documents")
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")))
    val scored = hit
      .join(broadcast(qdf), "term")
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("doc_id"),
        expr(s"CAST(round(($bm25ContribSql) * 1e9) AS BIGINT)").as("c9"))
      .groupBy("q_id", "doc_id").agg(sum(col("c9")).as("s9"))
    // s9 ≤ ~1e11 ≪ 2^53: the double cast for the top-k agg is exact
    scored.groupBy("q_id")
      .agg(expr("topk8_ids(CAST(s9 AS DOUBLE), doc_id)").as("top"))
      .select(col("q_id"), posexplode(col("top.ids")).as(Seq("pos", "doc_id")))
      .select(col("q_id"), (col("pos") + 1).as("rank"), col("doc_id"))
  }

  /** Oracle CTEs replaying winnowFps over the `rel` relation: yields
    * `fp$tag` (doc_id, fp) — identical grams, encoded-tie min, boundary
    * rule. `tag` disambiguates when one oracle fingerprints two corpora
    * (the incremental index × batch query). */
  private def winnowFpSqlFor(rel: String, tag: String = ""): String =
    s"""wd$tag AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM $rel
          WHERE len(string_split(text, ' ')) >= 4),
        wg$tag AS (
          SELECT doc_id, i - 1 AS i, len(w) - 3 AS ng,
                 md5(array_to_string(w[i : i + 3], ' ')) AS g
          FROM (SELECT doc_id, w, unnest(range(1, len(w) - 2)) AS i FROM wd$tag)),
        wsel$tag AS (
          SELECT doc_id, i, ng,
                 min(g || lpad(CAST(9999999999 - i AS VARCHAR), 10, '0'))
                   OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS s
          FROM wg$tag),
        fp$tag AS (
          SELECT DISTINCT doc_id, substr(s, 1, 32) AS fp
          FROM wsel$tag WHERE i <= ng - 5 OR (ng < 5 AND i = 0))"""

  private val winnowFpSql = winnowFpSqlFor("corpus")

  /** Per-term BM25 contribution over posting columns (tf, df, dl, n,
    * avgdl) — ONE formula string shared verbatim by the Spark expr and the
    * DuckDB oracle (same engine-parity rationale as bm25ScoreSql). Unlike
    * the single-query path, the multi-query score is a SUM OVER POSTING
    * ROWS, whose order neither engine guarantees — so each contribution is
    * scaled to an exact integer (×1e9, round, BIGINT) before aggregation:
    * integer sums are order-independent, making the ranking bit-replayable
    * with no cross-engine float channel. */
  private val bm25ContribSql =
    """ln((n - df + 0.5e0) / (df + 0.5e0) + 1.0e0)
       * (tf * (1.2e0 + 1.0e0))
       / (tf + 1.2e0 * (1.0e0 - 0.75e0 + 0.75e0 * dl / avgdl))"""

  /** Oracle CTEs replaying bm25MultiTopk's scoring through `scored`
    * (q_id, doc_id, s9) — shared by the text_bm25_multi and
    * text_hybrid_rrf_multi oracles. */
  private def bm25MultiScoredSql: String = {
    val valuesSql = bm25Queries
      .flatMap { case (q, ts) => ts.map(t => s"(CAST($q AS BIGINT), '$t')") }
      .mkString(", ")
    val termsIn = bm25Queries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
        postings AS (
          SELECT term, doc_id, count(*) AS tf FROM (
            SELECT doc_id, unnest(toks) AS term FROM d)
          GROUP BY 1, 2),
        q(q_id, term) AS (VALUES $valuesSql),
        dfs AS (SELECT term, count(*) AS df FROM postings
                WHERE term IN ($termsIn) GROUP BY 1),
        scored AS (
          SELECT q.q_id, p.doc_id,
                 sum(CAST(round(($bm25ContribSql) * 1e9) AS BIGINT)) AS s9
          FROM q JOIN postings p USING (term)
               JOIN dfs f ON p.term = f.term
               JOIN lens l ON p.doc_id = l.doc_id
               CROSS JOIN stats
          GROUP BY 1, 2)"""
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): hashed-bigram bucket
    * counts for a target corpus vs the raw corpus, per-bucket log-ratio
    * weights with add-1 smoothing, per-doc score = Σ weight[bucket(gram)].
    * ONE formula string shared verbatim by both engines (same parity
    * rationale as bm25ContribSql); the per-doc sum is over gram rows whose
    * order neither engine guarantees, so each weight is integer-scaled
    * (×1e9, round, BIGINT) — integer sums are order-independent. */
  private val dsirBuckets = 1024
  private val dsirTargetSrcs = Seq("src0", "src1", "src2", "src3")
  private val dsirWeightSql =
    s"ln((t + 1.0e0) / (tt + $dsirBuckets.0e0)) - ln((r + 1.0e0) / (rt + $dsirBuckets.0e0))"

  /** Planted boilerplate lines for the cross-doc line-dedup fixture — whole
    * repeated "lines" (the header on every 3rd doc, the footer on every
    * 4th), so line-frequency dedup has deterministic targets, same planting
    * style as text_pii_redact / text_decontaminate. */
  private val boilerHeader = "subscribe to our newsletter for updates"
  private val boilerFooter = "all rights reserved contact us today"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-document line-level dedup (the C4 / CCNet boilerplate-removal
    // step): split each doc into lines, count each line's corpus frequency,
    // drop every line that appears more than once corpus-wide, and
    // reassemble the cleaned doc. The synthetic corpus has no newlines, so
    // "lines" are deterministic 10-word chunks plus the planted
    // header/footer lines (whole-line repeats across docs — exactly what
    // the real op removes). Scale shape: the line-frequency count is ONE
    // map-side-combined hash shuffle on the 128-bit line hash; the
    // boilerplate set (only lines with count ≥ 2) is tiny relative to the
    // corpus and broadcasts (a bloom filter at extreme scale); reassembly
    // is one shuffle on doc_id with per-doc state bounded by the doc's own
    // line count. At 100 TB nothing pairs docs against docs — frequency is
    // a global aggregate, membership is a broadcast probe.
    "text_line_dedup" -> ((s, dir) => {
      val empty = expr("CAST(array() AS ARRAY<STRING>)")
      val lined = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          concat(
            when(col("doc_id") % 3 === 0, array(lit(boilerHeader))).otherwise(empty),
            expr("""transform(sequence(0, CAST(ceil(size(w) / 10.0e0) AS INT) - 1),
                      i -> concat_ws(' ', slice(w, i * 10 + 1, 10)))"""),
            when(col("doc_id") % 4 === 0, array(lit(boilerFooter))).otherwise(empty)
          ).as("lines"))
        .select(col("doc_id"), posexplode(col("lines")).as(Seq("pos", "line")))
        // the 16-byte line hash rides the checkpoint so both consumers
        // read it instead of each re-hashing every line (the probe join
        // used to recompute md5(line) a second time over the full line
        // stream); binary, not hex — half the bytes (guide §2.3)
        .select(col("doc_id"), col("pos"), col("line"),
          unhex(md5(col("line"))).as("lh"))
        .localCheckpoint() // 2 consumers: frequency count + reassembly
      val boiler = lined.groupBy(col("lh").as("h"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 2).select(col("h"))
      // NO broadcast hint (round 19, VERDICT r18 #4): the repeated-line
      // set GROWS WITH THE CORPUS — the one forced-broadcast build side
      // in the query fleet that wasn't bounded (every other broadcast is
      // single-row stats, query vectors, fixed pools, or capped
      // sketches). AQE decides from the aggregate's ACTUAL size: at
      // bench SF it broadcasts (same plan as the old hint); past the
      // threshold it degrades to a shuffle join instead of OOMing the
      // driver. Left-join NULL semantics (h null = keep the line) are
      // strategy-independent.
      lined.join(boiler, col("lh") === col("h"), "left")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_lines"),
          count(col("h")).as("n_removed"),
          md5(concat_ws(" ", expr(
            "transform(sort_array(collect_list(CASE WHEN h IS NULL THEN struct(pos, line) END)), x -> x.line)")))
            .as("clean_md5"))
        .orderBy("doc_id")
    }),

    // DSIR importance scoring — the data-selection step that upweights raw
    // docs resembling a curated target corpus (here: sources src0..src3).
    // Features are the fused shingle kernel's distinct word-bigram ids
    // hashed into 1024 buckets. Scale shape: the gram stream is narrow
    // (zero-shuffle kernel + explode); the two bucket-count aggregations
    // collapse onto ≤1024 keys (map-side combined, effectively free); the
    // 1024-row weight table broadcasts — at 100 TB it is index METADATA,
    // built once with the corpus stats and durable, so scoring any batch is
    // a single narrow pass + broadcast join + one map-side-combined doc
    // aggregation. Nothing pairs docs, nothing collects to the driver.
    "text_dsir_importance" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val grams = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          // target-membership boolean instead of the source string —
          // the checkpoint's only use of source was this predicate
          // (same narrowing as text_ngram_perplexity, guide §2.3)
          col("source").isin(dsirTargetSrcs: _*).as("tgt"),
          explode(expr("shingle_sids_md5(w, 2)")).as("gid"))
        .select(col("doc_id"), col("tgt"), (col("gid") % dsirBuckets).as("b"))
        .localCheckpoint() // 3 consumers: raw counts, target counts, scoring
      val raw = grams.groupBy("b").agg(count(lit(1)).as("r"))
      val tgt = grams.filter(col("tgt"))
        .groupBy("b").agg(count(lit(1)).as("t"))
      val rt = raw.agg(sum(col("r")).as("rt"))
      val tt = tgt.agg(coalesce(sum(col("t")), lit(0L)).as("tt"))
      val weights = raw.join(tgt, Seq("b"), "left")
        .select(col("b"), coalesce(col("t"), lit(0L)).as("t"), col("r"))
        .crossJoin(broadcast(rt)).crossJoin(broadcast(tt))
        .select(col("b"),
          expr(s"CAST(round(($dsirWeightSql) * 1e9) AS BIGINT)").as("w9"))
      grams.join(broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), sum(col("w9")).as("s9"))
        .orderBy("doc_id")
    }),

    // Model-based quality filtering (the CCNet/GPT-3 "fastText classifier"
    // step): a TRAINED linear model scored at corpus scale. The model here
    // is a deterministic stand-in — hashed unigram features (1024 buckets,
    // the word_ids_md5 p31 hash space) with per-bucket integer weights
    // w(b) = (b·2654435761) mod 2001 − 1000 — but the inference topology
    // is the real one: the model rides INSIDE the expression (a fixed
    // arithmetic map; a real weight vector would be a reference object on
    // the kernel), and since the per-doc score is pure per-row algebra,
    // inference is ONE NARROW codegen'd pass — quality_score_md5 fuses
    // hash→bucket→weight→sum per row, so there is NO shuffle at all (the
    // r8 explode+groupBy spelling paid a doc-keyed exchange just to
    // re-assemble rows the map side already had together). Scores are
    // exact integer sums (|w| ≤ 1000, ≪ 2⁵³), so the keep/drop decision
    // is order-independent and replays bit-for-bit — a classifier whose
    // accept bit flips on summation order would make curation
    // non-reproducible across runs. The same kernel drops into streaming
    // ingest and the composed curation pipeline unchanged.
    "text_quality_classifier" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          expr("quality_score_md5(w)").as("score"))
        .withColumn("label",
          when(col("score") > 0, lit("keep")).otherwise(lit("drop")))
        .orderBy("doc_id")
    }),

    // Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    // "Winnowing: Local Algorithms for Document Fingerprinting" — the
    // MOSS algorithm): hash every positional word 4-gram, slide a w=5
    // window over the hash sequence, select each window's minimum (ties →
    // rightmost), keep the distinct selections as the doc's fingerprint
    // set. The guarantee: any shared word-run of length ≥ w+k−1 between
    // two docs shares ≥1 fingerprint, at ~2/(w+1) of the full gram count
    // — the span-level near-dup index at a fraction of the postings.
    // Shape: explode the words (narrow), then ONE doc_id shuffle whose
    // partition+sort serves EVERYTHING — gram construction via lead()
    // (each position concatenates itself with its next 3 tokens: no
    // array HOF anywhere, so nothing interpreted touches the corpus
    // scan — the first transform+posexplode draft tripped PlanAudit's
    // HOF detector and was rewritten to this), the full-gram filter,
    // and the sliding min. The rightmost-tie rule rides INSIDE the min:
    // the compared string is g || lpad(999999 − i), so a plain string
    // min picks the smallest hash and, among equals, the largest
    // position — no argmin/min_by, which keeps the window a built-in
    // MIN both engines order identically (binary collation on hex).
    // fully NARROW with the fused kernel: per-doc count and min read off
    // the fingerprint array itself — no shuffle anywhere but the display
    // sort (the r8 window spelling shuffled the gram stream on doc_id)
    "text_winnowing" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "documents")
        .select(col("doc_id"), expr("winnow_fps(split(text, ' '))").as("fps"))
        .filter(size(col("fps")) > 0)
        .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
          array_min(col("fps")).as("fp_min"))
        .orderBy("doc_id")
    }),

    // INCREMENTAL winnowing — the production ingest shape for span-level
    // near-dup (the dedup_incremental discipline applied to the MOSS
    // index): a NEW batch is fingerprinted and joined against the STORED
    // base index only — index × batch, never a full-corpus re-pair per
    // arrival. The index side is two durable artifacts (the posting
    // table + its df metadata, built once, GRAFT_INDEX_DIR-backed like
    // every other index; a deployment appends each admitted batch's
    // postings via IndexStore.append). Stop fingerprints are a property
    // of the INDEXED corpus — df metadata rides with the index and the
    // probe skips them, so batch arrivals can't be blown up by
    // boilerplate either. Output: per batch doc, the indexed docs it
    // shares ≥2 fingerprints with, ranked by shared count, plus the
    // CONTAINMENT ratio vs the batch doc's own fingerprint set (the
    // admit/reject signal: a new doc mostly contained in the index is a
    // near-dup arrival).
    "dedup_winnowing_incr" -> ((s, dir) => {
      val base = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val batch = base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz0 zz1")).as("text"))
      val keep = winnowCappedPostings(s, dir)
      val bfps = winnowFps(batch).localCheckpoint() // 2 consumers: join + counts
      val cnt = bfps.groupBy("doc_id").agg(count(lit(1)).as("n"))
      keep.as("a").join(bfps.as("b"), col("a.fp") === col("b.fp"))
        .groupBy(col("a.doc_id").as("dup_of"), col("b.doc_id").as("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= MinSharedFps)
        .join(cnt, "doc_id")
        .select(col("doc_id"), col("dup_of"), col("n_shared"),
          round(col("n_shared") / col("n"), 3).as("contain_r"))
        .orderBy("doc_id", "dup_of")
    }),

    // Winnowing PAIR search — the MOSS use of the fingerprints above:
    // surface doc pairs sharing fingerprints (≥1 shared fp ⇒ a shared
    // word-run of length ≥ w+k−1 = 8), ranked by shared count, with an
    // overlap ratio vs the smaller doc's fingerprint set (containment —
    // robust when a short doc is embedded in a long one). The index is
    // the (doc_id, fp) posting table, built once over the planted
    // near-dup corpus and durable under GRAFT_INDEX_DIR like every other
    // dedup index. Scale shape: the pair space is bounded by a DF CAP —
    // a fingerprint appearing in more than MaxFpDf docs is boilerplate
    // (license headers, common phrases: the standard MOSS "stop
    // fingerprint" rule) and is dropped BEFORE the self-join, so per-fp
    // pair counts are ≤ MaxFpDf²/2 and the total join output is
    // O(#fps · MaxFpDf) — no phrase distribution can blow it up (the
    // same distribution-proof discipline as the kNN bucket cap). All
    // counts are integers; the only rounding is the final display ratio.
    "dedup_winnowing_pairs" -> ((s, dir) => {
      val postings = Tables.cachedFrame(s, dir, "winnow_pair_index")(
        winnowFps(Dedup.nearDupCorpus(s, dir)))
      // per-fp document frequency is index METADATA, built once with the
      // posting index and durable alongside it — the exact
      // winnowCappedPostings / bm25_dfs convention; re-aggregating it on
      // every probe was the one piece of this query's index this file
      // still recomputed per invocation
      val dfs = Tables.cachedFrame(s, dir, "winnow_pair_dfs")(
        postings.groupBy("fp").agg(count(lit(1)).as("df")))
      // df-capped postings as the stored probe-side table (round 19 —
      // the winnow_base_capped convention): the cap join was re-derived
      // THREE times per invocation (the count aggregate + both self-join
      // sides each carried their own postings⋈dfs subtree); now all
      // three read one artifact derived once from the two stored inputs
      val keep = Tables.cachedFrame(s, dir, "winnow_pair_capped")(
        postings.join(dfs.filter(col("df") <= MaxFpDf), "fp")
          .select(col("fp"), col("doc_id")))
      val cnt = keep.groupBy("doc_id").agg(count(lit(1)).as("n"))
      keep.as("a").join(keep.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= MinSharedFps) // accidental singletons out
        .join(cnt.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(cnt.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .select(col("da"), col("db"), col("n_shared"),
          round(col("n_shared") / least(col("na"), col("nb")), 3).as("overlap_r"))
        .orderBy("da", "db")
    }),

    // BPE merge-rule training (Sennrich et al., "Neural Machine
    // Translation of Rare Words with Subword Units") — the tokenizer-
    // training pass every LLM data pipeline runs. Shape: ONE corpus pass
    // builds the word-frequency table; the merge rounds then run on the
    // VOCAB-BOUNDED table only (|V| rows, never the corpus), each round =
    // one pair-count aggregation + a TakeOrderedAndProject argmax whose
    // single row comes to the driver (the starCC one-scalar-per-round
    // discipline) + a narrow literal-replace rewrite, localCheckpointed
    // so plan size stays O(1) across rounds. Cross-engine determinism
    // hangs on two shared primitives: the pad/gap token encoding (see
    // bpeMergesFrame — one-space pad, two-space gaps, which makes
    // literal `replace` EXACTLY token-aligned greedy BPE), and the
    // built-in literal `replace` itself, whose greedy left-to-right
    // non-overlapping semantics are identical in Spark and DuckDB — the
    // oracle replays all 6 rounds with scalar-subquery argmaxes. Ties
    // break lexicographically
    // on the pair string in both engines. (No end-of-word marker — a
    // deployment appends one before char-spelling; the training topology
    // is unchanged.)
    "text_bpe_train" -> ((s, dir) => bpeMergesFrame(s, dir).orderBy("r")),

    // Tokenize the corpus under the learned merges — the at-scale side
    // of BPE: training is a once-per-corpus job whose 6-row merge table
    // is index metadata (session-memoized, durable under
    // GRAFT_INDEX_DIR); APPLYING it to 100 TB is this query's shape — a
    // chain of 6 literal `replace`s over the char-spelled doc string,
    // pure narrow whole-stage-codegen work, no lambdas, no shuffles
    // except the output sort. Word boundaries are protected by a '|'
    // marker char-spelled like any other char: merges never contain '|',
    // so no merge can cross a word boundary. n_tokens = spelled tokens
    // minus the n_words−1 separators.
    "text_bpe_tokens" -> ((s, dir) => {
      val ms = bpeMergesFrame(s, dir).orderBy("r").head(bpeRounds)
        .map(r => (r.getString(1), r.getString(2)))
      val spelled = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_words"),
          concat(lit(" "),
            trim(regexp_replace(regexp_replace(col("text"), " ", "|"),
              "(.)", "$1  ")), lit(" ")).as("sp"))
      val applied = ms.foldLeft(spelled) { case (df, (pair, merged)) =>
        df.withColumn("sp",
          replace(col("sp"), lit(" " + pair.replace(" ", "  ") + " "),
            lit(" " + merged + " ")))
      }
      applied.select(col("doc_id"),
        (size(split(trim(col("sp")), "  ")) - (col("n_words") - 1)).cast("long")
          .as("n_tokens"),
        md5(col("sp")).as("tok_md5"))
        .orderBy("doc_id")
    }),

    // The chained-replace GC swap as code: one fused kernel
    // (functions.BpeApplyExpr) char-spells and applies all 6 merges in
    // token-array passes per row — no k+1 intermediate string copies
    // (the chained path's 100× probe was allocation-bound, reps swinging
    // 9–20 s on identical work). Output is BIT-IDENTICAL to
    // text_bpe_tokens (the pad/gap encoding contract pins the
    // equivalence; OpsSpec pins row identity), so the oracle is shared —
    // one contract, two plans, like text_decontaminate_bloom.
    "text_bpe_tokens_fused" -> ((s, dir) =>
      bpeApplied(s, dir)
        .select(col("doc_id"), col("n_tokens"), md5(col("sp")).as("tok_md5"))
        .orderBy("doc_id")),

    // Tokenizer FERTILITY under the trained BPE — corpus tokens-per-word,
    // the standard metric for judging a tokenizer against a corpus (and
    // for sizing compute: token budget = word count × fertility). Pure
    // aggregation over the fused apply (one narrow kernel pass, one
    // single-row agg of per-task partials); integer basis points
    // ((toks·10000) div words), no float channel. A per-source breakdown
    // is the same plan with `source` in the groupBy.
    "text_bpe_fertility" -> ((s, dir) =>
      bpeApplied(s, dir)
        .agg(sum("n_words").as("words"), sum("n_tokens").as("toks"))
        .select(col("words"), col("toks"),
          expr("(toks * 10000) div words").as("fertility_bp"))),

    // CCNet-style LM perplexity scoring — the curation stage that ranks
    // raw docs by how "natural" they look under a language model trained
    // on a clean target corpus (CCNet/RefinedWeb filter on KenLM 5-gram
    // perplexity; DSIR above answers "which docs RESEMBLE the target
    // distribution", this answers "which docs the target LM finds
    // probable" — ratio vs likelihood, different selectors). The LM here
    // is an add-1-smoothed model over hashed word-bigram features
    // (B=4096 buckets) trained on the same target sources DSIR uses — a
    // documented simplification of KenLM (a real deployment scores with
    // the trained model behind a mapInPandas boundary, like the
    // multimodal codecs; the Spark-side topology is identical). Scale
    // shape: per-word ids from the fused codegen kernel; the positional
    // pair-bucketing transform is per-doc-bounded array algebra
    // (PlanAudit-allowlisted like text_line_dedup); training counts
    // collapse onto ≤4096 keys map-side; the LM table broadcasts as index
    // metadata; per-doc scores are ×1e9 integer-scaled order-independent
    // sums. Nothing pairs docs, nothing collects to the driver.
    "text_ngram_perplexity" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val B = 4096L
      val grams = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), col("source"),
          expr("word_ids_md5(w, 'p31')").as("ids"))
        .select(col("doc_id"),
          // the checkpoint only needs "is this a target-corpus gram", not
          // the source string itself — a boolean instead of a per-row
          // string shrinks the materialized gram stream (guide §2.3)
          col("source").isin(dsirTargetSrcs: _*).as("tgt"),
          explode(expr(
            s"transform(sequence(1, size(ids) - 1), i -> (ids[i - 1] * 31 + ids[i]) % $B)"))
            .as("b"))
        .localCheckpoint() // 3 consumers: LM counts, LM total, scoring
      val tgt = grams.filter(col("tgt"))
      val total = tgt.agg(count(lit(1)).as("t"))
      // DENSE 4096-row LM table (unseen buckets carry the smoothed floor
      // ln(1/(t+B))): the scoring join is then a guaranteed-hit broadcast
      // hash join — no per-occurrence default path, and crucially no
      // 1-row crossJoin on the BIG gram stream (PlanAudit caught the
      // first version's BroadcastNestedLoopJoin + single-partition
      // exchange on the hot path; the tiny crossJoin lives here on the
      // 4096-row build side, the DSIR weights shape)
      val lm = s.range(B).select(col("id").as("b"))
        .join(tgt.groupBy("b").agg(count(lit(1)).as("c")), Seq("b"), "left")
        .select(col("b"), coalesce(col("c"), lit(0L)).as("c"))
        .crossJoin(broadcast(total))
        .select(col("b"),
          expr(s"CAST(round(ln((c + 1.0e0) / (t + $B.0e0)) * 1e9) AS BIGINT)")
            .as("lp9"))
      grams.join(broadcast(lm), Seq("b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp9")).as("s9"))
        .select(col("doc_id"), col("n_bigrams"),
          round(exp(-col("s9") / 1e9 / col("n_bigrams")), 4).as("ppl_r"))
        .orderBy("doc_id")
    }),

    // Generalized BM25 retrieval: N queries scored in ONE pass (the
    // single-query variant generates one column per compile-time term —
    // it cannot express "score these N queries from a table"). The whole
    // shape lives in bm25MultiTopk, shared with the hybrid fusion below.
    "text_bm25_multi" -> ((s, dir) =>
      bm25MultiTopk(s, dir).orderBy("q_id", "rank")),

    // Multi-query hybrid retrieval with reciprocal-rank fusion — the RAG
    // serving stack's batch shape: N queries fused in ONE pass, lexical
    // side from the bm25 posting-join top-8 (the text_bm25_multi
    // formulation — index probes, not per-term compile-time columns),
    // dense side from per-query cosine top-8 via the bounded topk8
    // aggregate (map-side partials keep ≤8 rows per query — never a
    // window over the full scored corpus). Fusion is a full-outer join
    // of two ≤8-row-per-query rank lists on (q_id, doc_id) with exact
    // integer RRF contributions round(1e9/(60+rank)) — no float channel.
    // Scale shape: postings/stats are durable index artifacts; the dense
    // scan is one corpus pass with the tiny query set broadcast; both
    // rank lists and the fusion are query-count-sized. The single-query
    // text_hybrid_rrf is this with N=1 and TakeOrdered lists.
    "text_hybrid_rrf_multi" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val t8 = bm25MultiTopk(s, dir)
        .select(col("q_id"), col("doc_id"), col("rank").cast("long").as("rt"))
      val e = Tables(s, dir, "embeddings")
      // query vectors keyed by q_id = vec_id (the bm25Queries ids); the
      // corpus is the ANN convention's vec_id >= 8 split
      val qv = e.filter(col("vec_id") < lit(bm25Queries.size))
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          expr("sqrt(vec_dot(embedding, embedding))").as("qn"))
      val v8 = e.filter(col("vec_id") >= 8)
        .select(col("vec_id").as("nid"), col("embedding").as("ce"),
          expr("sqrt(vec_dot(embedding, embedding))").as("cn"))
        .crossJoin(broadcast(qv))
        .select(col("q_id"), col("nid"),
          round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos_r"))
        .groupBy("q_id").agg(expr("topk8_ids(cos_r, nid)").as("top"))
        .select(col("q_id"), posexplode(col("top.ids")).as(Seq("pos", "nid")))
        .select(col("q_id"), col("nid").as("doc_id"),
          (col("pos") + 1).cast("long").as("rv"))
      t8.join(v8, Seq("q_id", "doc_id"), "full_outer")
        .select(col("q_id"), col("doc_id"),
          (coalesce(round(lit(1e9) / (lit(60) + col("rt"))).cast("long"), lit(0L)) +
            coalesce(round(lit(1e9) / (lit(60) + col("rv"))).cast("long"), lit(0L)))
            .as("rrf9"),
          col("rt"), col("rv"))
        .orderBy(col("q_id"), col("rrf9").desc, col("doc_id"))
    }),

    // BM25 relevance search (Robertson/Sparck-Jones idf with +1 floor,
    // k1=1.2, b=0.75): the lexical retrieval baseline a training-data
    // pipeline uses for corpus search / targeted decontamination. Scale
    // shape: corpus stats (N, avgdl, per-term df) are ONE global
    // aggregation reduced to a single broadcast row; scoring is a narrow
    // codegen'd pass (per-term tf via array filter — no explode, no
    // shuffle); top-10 is TakeOrderedAndProject (bounded per-partition
    // top-k, no data-bearing single-partition exchange). At 100 TB the
    // stats row comes from one pass (or index metadata) and everything
    // else stays embarrassingly parallel.
    "text_bm25_topk" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        // tf via size - size(array_remove(...)): same count as
        // filter(toks, x -> x = term) but array_remove is a codegen'd
        // collection function — the lambda spelling ran interpreted per
        // row (caught by PlanAudit's HOF detector)
        .select(
          col("doc_id") +: size(col("toks")).as("dl") +:
            bm25Terms.zipWithIndex.map { case (t, i) =>
              (size(col("toks")) - size(array_remove(col("toks"), t))).as(s"tf$i")
            }: _*)
        .localCheckpoint() // 2 consumers (stats agg + scoring): one split +
        // per-term tf pass over the corpus instead of two — the narrow
        // (doc_id, dl, tf0..tfN) int frame is far cheaper to materialize
        // than the token split is to recompute
      val stats = docs.agg(
        count(lit(1)).as("n"),
        avg(col("dl")).as("avgdl") +:
          bm25Terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
      docs.crossJoin(broadcast(stats))
        .select(col("doc_id"), round(expr(bm25ScoreSql), 6).as("bm25_r"), col("dl"))
        .orderBy(col("bm25_r").desc, col("doc_id")).limit(10)
    }),

    // Hybrid retrieval with reciprocal-rank fusion (the RAG serving
    // query: lexical BM25 + dense cosine fused as Σ 1/(60+rank), the
    // Cormack/Clarke RRF constant): text ranks from the BM25 top-10,
    // vector ranks from the query vector's cosine top-10 (vec_id keys
    // the same corpus as doc_id — the driver's embeddings are
    // per-document; docs without embeddings join via the text list
    // only, the standard full-outer RRF semantics). Contributions are
    // integer-scaled (round(1e9/(60+r)) — exact in both engines since
    // the operands are identical), so the fused ordering has no float
    // channel. Scale shape: both lists are TakeOrderedAndProject top-10s
    // off one corpus pass each; the rank windows and the fusion join
    // touch ≤10-row frames — everything data-sized is map-side bounded.
    "text_hybrid_rrf" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id") +: size(col("toks")).as("dl") +:
            bm25Terms.zipWithIndex.map { case (t, i) =>
              (size(col("toks")) - size(array_remove(col("toks"), t))).as(s"tf$i")
            }: _*)
        .localCheckpoint() // 2 consumers, same rationale as text_bm25_topk
      val stats = docs.agg(
        count(lit(1)).as("n"),
        avg(col("dl")).as("avgdl") +:
          bm25Terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i")): _*)
      // the rank windows run over ≤10-row TakeOrdered outputs, so the
      // single-partition WindowExec is benign — but an EMPTY partition
      // spec logs a scary "No Partition Defined" warning per run. A
      // constant-valued key silences it; it must be NON-FOLDABLE (k % 1,
      // not lit(1)) or the optimizer prunes it back to the empty spec.
      def one(k: org.apache.spark.sql.Column) = Window.partitionBy(k % 1)
      val t10 = docs.crossJoin(broadcast(stats))
        .select(col("doc_id"), round(expr(bm25ScoreSql), 6).as("bm25_r"))
        .orderBy(col("bm25_r").desc, col("doc_id")).limit(10)
        .withColumn("rt", row_number()
          .over(one(col("doc_id")).orderBy(col("bm25_r").desc, col("doc_id"))).cast("long"))
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"),
          expr("sqrt(vec_dot(embedding, embedding))").as("qn"))
      val v10 = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("nid"), col("embedding").as("ce"),
          expr("sqrt(vec_dot(embedding, embedding))").as("cn"))
        .crossJoin(broadcast(q))
        .select(col("nid"),
          round(expr("vec_dot(qe, ce)") / (col("qn") * col("cn")), 6).as("cos_r"))
        .orderBy(col("cos_r").desc, col("nid")).limit(10)
        .withColumn("rv", row_number()
          .over(one(col("nid")).orderBy(col("cos_r").desc, col("nid"))).cast("long"))
      t10.select(col("doc_id"), col("rt"))
        .join(v10.select(col("nid").as("doc_id"), col("rv")), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(round(lit(1e9) / (lit(60) + col("rt"))).cast("long"), lit(0L)) +
            coalesce(round(lit(1e9) / (lit(60) + col("rv"))).cast("long"), lit(0L)))
            .as("rrf9"),
          col("rt"), col("rv"))
        .orderBy(col("rrf9").desc, col("doc_id")).limit(10)
    }),

    // Vocabulary building — the tokenizer-training precursor: top-50 words
    // by corpus frequency with each word's token-mass fraction (the number
    // vocab-size decisions read). ONE hash-aggregation shuffle over the
    // token stream (map-side combined); the total re-derives from the
    // already-aggregated vocab side (checkpointed, one row broadcast back)
    // so the corpus is scanned once; top-50 is TakeOrderedAndProject.
    // At 100 TB: the token agg is the only heavy stage and it partial-
    // aggregates; the vocab table itself is tiny.
    "text_vocab_topk" -> ((s, dir) => {
      val counts = Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .localCheckpoint() // 2 consumers: total + ranking
      val tot = counts.agg(sum("n").as("total"))
      counts.crossJoin(broadcast(tot))
        .select(col("word"), col("n"), round(col("n") / col("total"), 6).as("frac"))
        .orderBy(col("n").desc, col("word")).limit(50)
    }),

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

    // SPAN-LEVEL decontamination — the redaction-grade upgrade of
    // text_decontaminate: instead of a per-doc shared-gram count (drop
    // the doc), report the exact WORD RANGES that overlap the benchmark
    // so the pipeline can excise the quoted span and keep the rest.
    // Two-phase, the production shape: phase 1 detects contaminated
    // docs corpus-wide with the FUSED dedup kernel (cheap, position-
    // free); phase 2 re-derives positional gram ids ONLY on that small
    // subset (the declarative md5 chain is fine off the hot path — the
    // subset is benchmark-overlap-sized, not corpus-sized), marks the
    // matching 8-gram start positions, and merges overlapping [i, i+8)
    // hits into maximal spans with a per-doc gaps-and-islands window.
    // All integer; the kernel's (hi>>>4)%P ids and the declarative
    // conv(substr(md5,1,15)) ids are the SAME 60-bit value by
    // construction, so the two phases agree on what matched.
    "text_decontaminate_spans" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = gram8(docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 3, size(split(text, ' '))))")
            .as("text")))
        .select(col("gid")).distinct()
      val contaminated = gram8(docs).join(broadcast(bench), "gid")
        .select(col("doc_id")).distinct()
      val starts = docs.join(contaminated, "doc_id")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"),
          explode(expr("sequence(0, size(w) - 8)")).as("i"), col("w"))
        .select(col("doc_id"), col("i"),
          // % $P interpolated, not a literal: the whole two-phase design
          // hinges on this matching the fused kernel's id space
          expr(s"""CAST(conv(substring(md5(concat_ws(' ',
                    slice(w, i + 1, 8))), 1, 15), 16, 10) AS BIGINT)
                  % $P""").as("gid"))
        .join(broadcast(bench), "gid")
        .select(col("doc_id"), col("i").cast("long").as("i"))
      val w1 = Window.partitionBy("doc_id").orderBy("i")
      starts
        .withColumn("prev_max_end",
          max(col("i") + 8).over(w1.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("island",
          sum(when(col("prev_max_end").isNull || col("i") > col("prev_max_end"), 1L)
            .otherwise(0L)).over(w1))
        .groupBy("doc_id", "island")
        .agg(min("i").as("span_start"), (max("i") + 8).as("span_end"))
        .select(col("doc_id"), col("span_start"), col("span_end"))
        .orderBy("doc_id", "span_start")
    }),

    // QUERY-TABLE span decontamination — text_decontaminate_spans
    // generalized over a PARAMETER TABLE of eval suites (decontamSets,
    // the bm25Queries discipline): a deployment decontaminating against
    // MMLU + GSM8K + its private held-out set must not recompile per
    // suite or re-scan the corpus per suite. Both phases run ONCE for
    // all suites: phase 1 detects contaminated docs with one corpus-wide
    // fused-kernel pass against the unioned (bench_set, gid) table;
    // phase 2 re-derives positional grams over the UNION of contaminated
    // docs and attributes matches per suite at the join, so spans come
    // out labeled (a doc quoting two benchmarks gets spans under each).
    // Cost vs the single-set operator: the bench table grows by the
    // suites' gram mass; the corpus-sized work is unchanged.
    "text_decontam_spans_multi" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = decontamSets.map { case (nm, mod, drop) =>
        gram8(docs.filter(col("doc_id") % mod === 0)
          .select(col("doc_id"),
            expr(s"concat_ws(' ', slice(split(text, ' '), ${drop + 1}, size(split(text, ' '))))")
              .as("text")))
          .select(lit(nm).as("bench_set"), col("gid")).distinct()
      }.reduce(_ unionAll _)
        .localCheckpoint() // 2 consumers: corpus-wide detect + positional join
      val contaminated = gram8(docs).join(broadcast(bench.select("gid").distinct()), "gid")
        .select(col("doc_id")).distinct()
      val starts = docs.join(contaminated, "doc_id")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"),
          explode(expr("sequence(0, size(w) - 8)")).as("i"), col("w"))
        .select(col("doc_id"), col("i"),
          expr(s"""CAST(conv(substring(md5(concat_ws(' ',
                    slice(w, i + 1, 8))), 1, 15), 16, 10) AS BIGINT)
                  % $P""").as("gid"))
        .join(broadcast(bench), "gid")
        .select(col("bench_set"), col("doc_id"), col("i").cast("long").as("i"))
      val w1 = Window.partitionBy("bench_set", "doc_id").orderBy("i")
      starts
        .withColumn("prev_max_end",
          max(col("i") + 8).over(w1.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("island",
          sum(when(col("prev_max_end").isNull || col("i") > col("prev_max_end"), 1L)
            .otherwise(0L)).over(w1))
        .groupBy("bench_set", "doc_id", "island")
        .agg(min("i").as("span_start"), (max("i") + 8).as("span_end"))
        .select(col("bench_set"), col("doc_id"), col("span_start"), col("span_end"))
        .orderBy("bench_set", "doc_id", "span_start")
    }),

    // Per-suite decontamination REPORT — the dashboard rollup of the
    // span table above: per benchmark suite, how many documents are
    // contaminated, how many maximal spans, and the total token mass a
    // span-level redaction would remove. This is the number a release
    // review reads ("suite X overlaps N docs / M tokens of the corpus")
    // before anyone looks at individual spans; it also quantifies the
    // doc-level-vs-span-level trade (redacted_tokens ≪ the contaminated
    // docs' full token mass = span redaction saves data a whole-doc
    // drop would burn). Pure rollup of the multi-suite operator — the
    // two corpus-sized phases are shared, the report adds one ≤|suites|-
    // key aggregation.
    "text_decontam_report" -> ((s, dir) => {
      queries("text_decontam_spans_multi")(s, dir)
        .groupBy("bench_set")
        .agg(countDistinct(col("doc_id")).as("docs_hit"),
          count(lit(1)).as("spans"),
          sum(col("span_end") - col("span_start")).as("redacted_tokens"))
        .orderBy("bench_set")
    }),

    // C4-style HARD-GATE filter — the blocklist stage every web-corpus
    // recipe runs before any scoring: a document containing ANY
    // blocklisted WORD (exact token match) or any blocklisted PHRASE
    // (substring match — boilerplate markers like "lorem ipsum" that
    // word-tokenization misses) is dropped outright, no score, no
    // threshold. Distinct from text_quality's soft scoring: gates
    // compose by AND and their decisions must be explainable, so the
    // output carries the per-gate hit counts, not just the bit. Fully
    // narrow per-row algebra — at 100 TB this fuses into the ingest
    // scan with zero shuffles (the IngestFilters discipline).
    "text_blocklist_filter" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("word_hits",
          expr(s"size(filter(split(text, ' '), w -> w IN ($blockWordsSql)))").cast("long"))
        .withColumn("phrase_hits",
          blockPhrases.map(p => when(col("text").contains(p), 1L).otherwise(0L))
            .reduce(_ + _))
        .select(col("doc_id"), col("word_hits"), col("phrase_hits"),
          when(col("word_hits") === 0 && col("phrase_hits") === 0, "keep")
            .otherwise("drop").as("verdict"))
        .orderBy("doc_id")
    }),

    // GOPHER-STYLE quality rule battery (Rae et al. 2021, "Scaling
    // Language Models: ... Gopher", the public web-corpus filter
    // recipe): a document survives only if it passes EVERY structural
    // rule — word count in [50, 100k], mean word length in [3, 10],
    // ≥80% of words containing an alphabetic character, ≤10%
    // symbol-only words, ≥2 distinct stopwords (the repo's shared stop
    // list — the corpus-appropriate stand-in for Gopher's English
    // list, one definition site with text_quality). Rules compose by
    // AND and must be explainable, so the output carries each rule's
    // bit, not just the verdict (the text_blocklist_filter discipline).
    // Every test is an INTEGER comparison on exact counts (3·n ≤
    // sum_wlen, 5·alpha ≥ 4·n, 10·sym ≤ n): no ratio can flip on
    // float noise between engines or runs. Fully narrow per-row
    // algebra — fuses into the ingest scan with zero shuffles.
    "text_gopher_rules" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_words"),
          length(expr("concat_ws('', w)")).cast("long").as("sum_wlen"),
          expr("size(filter(w, x -> x rlike '[a-zA-Z]'))").cast("long")
            .as("alpha_words"),
          expr(s"size(array_distinct(filter(w, x -> x IN ($stopSql))))")
            .cast("long").as("stop_distinct"))
        .select(col("doc_id"), col("n_words"),
          when(col("n_words") >= 50 && col("n_words") <= 100000, 1L)
            .otherwise(0L).as("r_len"),
          when(col("sum_wlen") >= col("n_words") * 3 &&
            col("sum_wlen") <= col("n_words") * 10, 1L).otherwise(0L).as("r_wlen"),
          when(col("alpha_words") * 5 >= col("n_words") * 4, 1L)
            .otherwise(0L).as("r_alpha"),
          when((col("n_words") - col("alpha_words")) * 10 <= col("n_words"), 1L)
            .otherwise(0L).as("r_symbol"),
          when(col("stop_distinct") >= 2, 1L).otherwise(0L).as("r_stop"))
        .withColumn("verdict",
          when(col("r_len") + col("r_wlen") + col("r_alpha") +
            col("r_symbol") + col("r_stop") === 5, "keep").otherwise("drop"))
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

    // Benchmark decontamination: flag training docs sharing any word-8-gram
    // with an eval/benchmark set (here: every 10th doc quoted with its first
    // two words dropped, so contamination is planted and deterministic).
    // Scale: the benchmark gram set is small and broadcast — the train-side
    // scan never shuffles; at extreme scale the broadcast becomes a bloom
    // filter built from the same gid column. Grams are md5-derived longs,
    // not strings, so the probe key is 8 bytes.
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = gram8(docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 3, size(split(text, ' '))))")
            .as("text")))
        .select(col("gid")).distinct()
      gram8(docs)
        .join(broadcast(bench), "gid")
        // distinct (doc_id, gid) AFTER the probe (equivalent to the
        // oracle's DISTINCT before it, since bench gids are distinct and
        // the join is an equi-probe) — two distinct 8-grams colliding to
        // one gid within a doc must count once, and deduping the tiny
        // contaminated subset is cheaper than deduping the full gram
        // stream.
        .select(col("doc_id"), col("gid")).distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("shared_grams"))
        .orderBy("doc_id")
    }),

    // Contamination SCORING — the reporting counterpart to the boolean
    // decontaminate drop: every eligible doc (≥8 tokens) gets its
    // distinct-8-gram count, the count shared with the benchmark set,
    // and the overlap fraction — including the zero rows, which is what
    // a contamination-rate report needs and the drop query never emits.
    // Same topology as text_decontaminate (zero-shuffle kernel gram
    // stream, broadcast bench probe, one doc_id agg) with one twist:
    // the per-doc totals must count distinct gram IDS on both engines,
    // so the kernel output goes through array_distinct per row — still
    // no shuffle (the kernel already dedups STRINGS; this collapses the
    // rare id collisions the oracle's DISTINCT doc_id, gid collapses).
    "text_contamination_score" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = gram8(docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          expr("concat_ws(' ', slice(split(text, ' '), 3, size(split(text, ' '))))")
            .as("text")))
        .select(col("gid")).distinct()
      docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"),
          explode(expr("array_distinct(shingle_sids_md5(w, 8))")).as("gid"))
        .join(broadcast(bench.withColumn("hit", lit(1L))), Seq("gid"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          coalesce(sum("hit"), lit(0L)).as("shared_grams"))
        .withColumn("contamination",
          round(col("shared_grams") / (col("n_grams") * lit(1.0)), 4))
        .orderBy("doc_id")
    }),

    // Sliding-window document chunking — the RAG / training-sequence
    // preparation stage: W=50-token windows at stride S=40 (10-token
    // overlap), the tail window truncated, every start < n emitted.
    // Shape: per-doc array algebra (slice over a stepped sequence) +
    // one explode — embarrassingly parallel, no shuffle but the output
    // sort; the per-doc lambda is bounded by the doc's own chunk count
    // (PlanAudit-allowlisted like the other per-doc text transforms).
    "text_chunk_sliding" -> ((s, dir) => {
      val (w, st) = (chunkWindow, chunkStride)
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, size(w) - 1, $st), p -> concat_ws(' ', slice(w, p + 1, $w)))"))
          .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          size(split(col("chunk"), " ")).cast("long").as("n_tokens"),
          md5(col("chunk")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    }),

    // The decontamination scale-swap as code: text_decontaminate documents
    // "at extreme scale the broadcast becomes a bloom filter" — this is
    // that shape. The benchmark gram set is summarized into a Bloom filter
    // (built by one distributed pass — df.stat.bloomFilter — and stored as
    // a 1-row binary index frame: session-memoized, durable under
    // GRAFT_INDEX_DIR); the train-side gram stream is prefiltered by the
    // codegen'd bloom_might_contain probe (functions.BloomProbeExpr), and
    // only the survivors — contaminated grams plus ~fpp false positives —
    // reach the exact verification join. Bloom filters never
    // false-negative, so the output is BIT-IDENTICAL to the exact
    // operator (same oracle), while the join's probe-side input shrinks
    // from the full gram stream to ~contamination-rate × stream. The
    // verification join carries no broadcast hint: when the bench set
    // fits, AQE broadcasts it; when it doesn't (the 1e9-gram regime this
    // shape exists for), it must stay a hash join.
    "text_decontaminate_bloom" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      // the benchmark gram-id set is suite metadata like the bloom built
      // from it (which was already a durable index frame) — r18 stores it
      // alongside instead of re-deriving the sample-corpus gram pass on
      // every probe; the exact verification join reads the stored set
      val bench = Tables.cachedFrame(s, dir, "decontam_bench_gids")(
        gram8(docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            expr("concat_ws(' ', slice(split(text, ' '), 3, size(split(text, ' '))))")
              .as("text")))
          .select(col("gid")).distinct())
      val bloomRow = Tables.cachedFrame(s, dir, "decontam_bloom") {
        val b = bench
        val bf = b.stat.bloomFilter("gid", math.max(1L, b.count()), 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        s.createDataFrame(Seq(Tuple1(bos.toByteArray))).toDF("bloom")
      }
      val bytes = bloomRow.head().getAs[Array[Byte]](0) // 1-row index read
      gram8(docs)
        .filter(call_function("bloom_might_contain", col("gid"), lit(bytes)))
        .join(bench, "gid")
        .select(col("doc_id"), col("gid")).distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("shared_grams"))
        .orderBy("doc_id")
    }),

    // PII redaction: plant a deterministic email per doc (+ phone on even
    // ids), then count and redact both via regex. The patterns are chosen to
    // behave identically under Java regex (Spark) and RE2 (DuckDB oracle).
    // Scale: pure per-row regexp_replace — narrow, codegen'd, no shuffle.
    "text_pii_redact" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .withColumn("dirty", concat(
          lit("contact u"), col("doc_id").cast("string"), lit("@example.com "),
          col("text"),
          when(col("doc_id") % 2 === 0,
            concat(lit(" call 555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))))
      d.select(col("doc_id"),
        size(regexp_extract_all(col("dirty"), lit(emailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(col("dirty"), lit(phoneRe), lit(0))).as("n_phone"),
        md5(regexp_replace(regexp_replace(col("dirty"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // Repetition scoring (Gopher-style quality signals): top-word frequency
    // ratio and duplicate-2-gram ratio per doc. The 2-gram stats stay in
    // array-land (no shuffle); the top-word count is one hash-shuffled
    // two-level aggregation, map-side combined.
    "text_repetition" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      // Single-word docs have no 2-grams: guard the sequence() (Spark's
      // sequence(0, -1) is a DESCENDING ramp, not empty) and define the
      // dup ratio as 0 when n_2grams = 0, so a 1-word doc can't produce a
      // NaN/Inf divergence between engines.
      val arrStats = d.select(col("doc_id"),
        size(col("w")).as("n_words"),
        greatest(size(col("w")) - 1, lit(0)).as("n_2grams"),
        when(size(col("w")) >= 2,
          size(expr("""array_distinct(transform(sequence(0, size(w) - 2),
                         i -> concat(w[i], ' ', w[i+1])))"""))).otherwise(lit(0))
          .as("d_2grams"))
      val topWord = d.select(col("doc_id"), explode(col("w")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_c"))
      val dupRatio = when(col("n_2grams") > 0,
        round(lit(1.0) - col("d_2grams") / (col("n_2grams") * lit(1.0)), 4))
        .otherwise(lit(0.0))
      arrStats.join(topWord, "doc_id")
        .select(col("doc_id"),
          round(col("top_c") / (col("n_words") * lit(1.0)), 4).as("top_word_ratio"),
          dupRatio.as("dup_2gram_ratio"),
          (col("top_c") / (col("n_words") * lit(1.0)) > 0.2 || dupRatio > 0.2)
            .as("repetitive"))
        .orderBy("doc_id")
    }),

    // Word-entropy quality signal: Shannon entropy of the per-doc word
    // distribution (H = log2 n − Σ c·log2 c / n) — low-entropy docs are
    // template/boilerplate candidates. Two map-side-combined aggregations
    // on doc_id; everything else is arithmetic.
    "text_entropy" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n"), sum(col("c") * log2(col("c"))).as("sclc"))
        .select(col("doc_id"),
          round(log2(col("n")) - col("sclc") / col("n"), 4).as("entropy"))
        .orderBy("doc_id")
    }),

    // Corpus-level top-k frequent n-grams by DOCUMENT frequency — the
    // memorization/boilerplate profile: the 5-grams that recur across the
    // most documents are exactly the templated spans (headers, footers,
    // licence blocks) line-dedup and decontamination should be pointed
    // at, and the spans most likely to be regurgitated verbatim by a
    // model trained on the corpus. Ranked by doc frequency (not term
    // frequency) so one pathological repetitive document can't dominate.
    // Scale: per-doc dedup happens in array-land inside the fused
    // ngrams_ws kernel (graft.functions.NgramsExpr — the interpreted
    // transform/slice/concat_ws draft made the scan GC-bound at the 100×
    // probe, 4× marginal); the ONE shuffle is the gram groupBy with
    // map-side combine, and the top-20 is a TakeOrdered (no global sort).
    "text_topk_ngrams" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "documents")
        .select(split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(explode(expr("ngrams_ws(w, 5)")).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("gram")).limit(20)
    }),

    // COUNT-MIN-SKETCH heavy hitters: which bigrams appear in >= 8% of
    // documents (boilerplate / template spans), decided by a bounded
    // 4x4096-cell CMS with the exact document-frequency arm attached as
    // the eval (the dedup_method_eval discipline: the sketch's decision
    // column is `est`, truth is `df`/`true_hh`; emitted rows are the
    // SKETCH's flags, so false positives are visible as true_hh=0 —
    // CMS never underestimates, so false NEGATIVES are impossible by
    // construction and need no column). Determinism/replayability: the
    // 4 row-hashes are the 4 disjoint 12-bit slices of the md5-52-bit
    // gram id (the KmvSketchAgg hash convention) — no seeded RNG — and
    // per-cell counts are commutative partials, so the sketch is
    // merge-order-free and DuckDB replays it exactly.
    // Scale shape (the reason a 100 TB profile runs the sketch, not the
    // exact groupBy): the CMS build's shuffle is bounded at tasks x 16384
    // (j,bucket) partials NO MATTER the corpus — the exact arm's shuffle
    // grows with the vocabulary. Grams never shuffle as strings on the
    // sketch path (the text_ngram_novelty 100x lesson): buckets are
    // derived from the 52-bit id in the scan stage. The exact arm keys
    // on the id too (min(gram) carries one vocab-bounded string per key
    // for the report); the estimate probe joins the vocab-sized key set
    // to the BROADCAST 16384-cell sketch. 52-bit id collisions merge both
    // arms identically (the sids convention — DuckDB replays the same
    // ids, and a collision only ever RAISES a df toward heavy-hitter
    // status, mirroring CMS's own one-sided error).
    "text_heavy_hitters_cms" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables(s, dir, "documents")
      val posts = hhPosts(docs)
        .localCheckpoint() // 2 consumers: sketch build + exact arm
      val t = docs.agg(
        greatest(lit(2L), expr("(count(1) * 8) div 100")).as("t"))
      hhReport(posts, hhCms(posts), t)
    }),

    // INCREMENTAL heavy hitters — the CMS maintenance shape: the base
    // corpus's sketch is a DURABLE 16384-cell artifact (cms_bigram_base,
    // full IndexBuild → IndexRefresh lifecycle), and an arriving batch
    // folds in by elementwise ADDITION: CMS cells are commutative
    // counts, so sketch(base) + sketch(batch) == sketch(base ∪ batch)
    // EXACTLY — merging introduces NO approximation, unlike re-banding
    // or re-clustering maintenance (the property that makes CMS the
    // canonical distributed-profile sketch). Sketch-side work per
    // ingest step: O(batch) + one 16384-cell merge, regardless of
    // corpus size. The batch plants ' zz0 zz1' boilerplate on every
    // 4th doc, so a NEW heavy hitter ('zz0 zz1') exists only
    // post-merge — the report must surface it (spec-pinned). The
    // exact-df arm replays the union corpus as the eval (the
    // text_heavy_hitters_cms discipline); at 100 TB it drops and
    // candidates come from per-shard pre-aggregation.
    "text_heavy_hitters_incr" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val baseCms = Tables.cachedFrame(s, dir, "cms_bigram_base")(
        hhCms(hhPosts(docs)))
      val batch = docs.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat(col("text"), lit(" zz0 zz1")).as("text"))
      val batchPosts = hhPosts(batch)
        .localCheckpoint() // 2 consumers: batch sketch + the eval arm
      val merged = baseCms.unionAll(hhCms(batchPosts))
        .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
      // the exact/eval arm over the union corpus (base postings re-read
      // here by design — the eval replays ground truth; the SKETCH path
      // above touched only the stored artifact and the batch)
      val posts = hhPosts(docs).unionAll(batchPosts).localCheckpoint()
      val t = docs.select(lit(1)).unionAll(batch.select(lit(1))).agg(
        greatest(lit(2L), expr("(count(1) * 8) div 100")).as("t"))
      hhReport(posts, merged, t)
    }),

    // Per-document n-gram NOVELTY — the inverse of the memorization
    // profile: the fraction (basis points) of a document's distinct
    // 5-grams that appear NOWHERE else in the corpus. Low-novelty
    // documents are template instantiations of spans the corpus already
    // has (candidates for dedup or down-weighting); high-novelty
    // documents carry unique content worth keeping. Complements
    // text_topk_ngrams (which profiles the corpus's most-shared spans)
    // with the per-document consumer view. Shape: per-doc distinct grams
    // from the fused ngrams_ws kernel (array-land dedup, no HOF on the
    // scan), then — the load-bearing trick — NO gram-keyed join back: a
    // df=1 gram has exactly ONE owner document, so carrying min(doc_id)
    // through the df aggregate yields each doc's unique-gram count from
    // a second small aggregate, and the only join is doc-keyed (one row
    // per doc on both sides). Two measured drafts died at the 100×
    // probe before this shape: joining the gram-vocab df table back
    // onto the gram stream OOM'd (23.5M-entry per-partition hash maps),
    // and shuffling gram STRINGS cost a 4.07× marginal — so grams move
    // as 8-byte md5 shingle ids from the fused shingle_sids_md5 kernel
    // (the dedup-pipeline id convention: per-doc string-level dedup
    // inside the kernel, id collisions kept as separate entries, DuckDB-
    // replayable). df=1 is then "unique gram, no id collision" — sid
    // collisions only ever LOWER novelty, never raise it. Sub-5-word
    // docs have no 5-grams and are deliberately absent.
    "text_ngram_novelty" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val grams = Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"), explode(expr("shingle_sids_md5(w, 5)")).as("gid"))
        .localCheckpoint()
      val dfs = grams.groupBy("gid")
        .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
      val uniq = dfs.filter(col("df") === 1)
        .groupBy(col("owner").as("doc_id")).agg(count(lit(1)).as("uniq"))
      grams.groupBy("doc_id").agg(count(lit(1)).as("ng"))
        .join(uniq, Seq("doc_id"), "left")
        .select(col("doc_id"), col("ng"),
          coalesce(col("uniq"), lit(0L)).as("uniq"),
          expr("(coalesce(uniq, 0L) * 10000) div ng").as("novelty_bp"))
        .orderBy("doc_id")
    }),

    // Per-document top-3 TF-IDF terms — the classic keyword/topic signal
    // (what is this document ABOUT), consumed by topic-balanced sampling
    // and dataset cards. Numeric discipline: the ONLY float is the
    // per-WORD idf, integer-scaled once at the vocab level (idf6 =
    // round(ln(N/df)·1e6)); per-document scores are then the exact
    // integer tf·idf6, so ranking has no float-summation channel and
    // ties break on the word. Scale shape: tf agg on (doc_id, word) and
    // df agg on word are both map-side combined; the idf table is
    // VOCAB-sized (corpus-independent ≪ corpus), so the 1-row doc-count
    // frame cross-joins onto it — never onto the token stream — and the
    // tf×idf join is a plain hash join on word. The per-doc top-3 is a
    // rank window partitioned by doc_id (the tf frame is already keyed
    // by doc_id, so the window rides one hash shuffle).
    "text_tfidf_topk" -> ((s, dir) => {
      val tf = Tables(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        .localCheckpoint() // 2 consumers: the df/idf aggregate + the score
        // probe — without the checkpoint the full explode + (doc, word)
        // aggregation ran TWICE (r18 plan audit: two Generate+HashAggregate
        // chains over documents.parquet in one plan)
      val nd = Tables(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
      val idf = tf.groupBy("word").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nd))
        .select(col("word"), expr(idf6Sql).as("idf6"))
      // the idf side is VOCAB-sized and grows with the corpus — Spark's
      // post-agg size estimate under-guesses it and picked a broadcast at
      // the 30× probe (a multi-million-entry driver broadcast: measured
      // 13.0 s at 30× vs 7.0 s at 100× where the estimate overflowed into
      // sort-merge). shuffle_hash pins the scale-correct shape: hash join
      // on word, vocab side built per partition, corpus side never sorted
      //
      // (r19 A/B, REJECTED on measurement: replacing the rank window
      // with the bounded min_k_collect aggregate over a fixed-width
      // (1e14−1−s6)∥word encoding — exact (s6 DESC, word ASC) order,
      // 3 rows/doc into the doc-keyed exchange instead of the full
      // stream, no sort. Scale-attractive, but the per-(doc,word)
      // encode CONCAT cost more than the window sort saved at sf0.1:
      // scoring job 0.12 → 0.14-0.22 s, rep min 0.67 → 0.82 s under
      // identical profiling. The window shape stays; at a SF where the
      // doc-keyed shuffle dominates the encode, the bounded-agg spelling
      // is the documented swap.)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("s6").desc, col("word"))
      tf.join(idf.hint("shuffle_hash"), "word")
        .select(col("doc_id"), col("word"), (col("tf") * col("idf6")).as("s6"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("word"), col("s6"))
        .orderBy("doc_id", "rank")
    }),

    // Length-outlier filter: drop docs outside the exact [p05, p95]
    // token-length quantiles — the distribution-trimming step before
    // training. The two quantiles are ONE tiny aggregate broadcast back
    // over the scan; at 100 TB swap `percentile` for the t-digest sketch
    // (`percentile_approx`) and nothing else changes.
    "text_length_outliers" -> ((s, dir) => {
      val lens = Tables(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      val bounds = lens.agg(
        expr("percentile(len, 0.05)").as("lo"),
        expr("percentile(len, 0.95)").as("hi"))
      lens.crossJoin(broadcast(bounds))
        .agg(count(lit(1)).as("docs"),
          sum(when(col("len") >= col("lo") && col("len") <= col("hi"), 1L)
            .otherwise(0L)).as("kept"),
          sum(when(col("len") < col("lo"), 1L).otherwise(0L)).as("too_short"),
          sum(when(col("len") > col("hi"), 1L).otherwise(0L)).as("too_long"))
    }),

    // The documented 100 TB swap for text_length_outliers, as CODE — and
    // since round 11 a swap with a FULL hash oracle (one fewer rows-only
    // exception, r10 verdict task #8). percentile_approx — like any true
    // t-digest — can never hash-match a second engine: its centroid
    // state depends on the order partial sketches merge in, which Spark
    // does not fix. The boundaries therefore come from a DETERMINISTIC
    // mergeable quantile sketch instead: an HDR-histogram/DDSketch-style
    // LOG-LINEAR histogram. bucket(len) = 32·floor(log2 len) +
    // floor(32·(len − 2^b)/2^b), computed with pure integer/string
    // algebra (length(bin(len)), shifts, floor division) that both
    // engines evaluate bit-identically — no float channel. Per-bucket
    // counts are commutative partial aggregates, so the sketch is
    // merge-order-FREE by construction (the property t-digest lacks); a
    // quantile answer is the lower bound of the first bucket whose
    // cumulative count reaches ceil(q·n). Guarantee: bucket width ≤
    // lower_bound/32, so each boundary lands within 1/32 ≈ 3.1%
    // value-relative error of the true rank-q value at ANY corpus size,
    // with ≤ 32·63 buckets of state. The cumulative window runs over the
    // sketch-sized histogram (≤ ~2k rows of per-task partials), never
    // the corpus.
    "text_length_outliers_approx" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def lob(c: String) =
        s"shiftleft(CAST(1 AS BIGINT), CAST($c div 32 AS INT)) + " +
          s"(($c % 32) * shiftleft(CAST(1 AS BIGINT), CAST($c div 32 AS INT))) div 32"
      val lens = Tables(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len"))
      val hist = lens
        .select(col("len"), (length(expr("bin(len)")) - 1).cast("long").as("b"))
        .select((col("b") * 32 + expr(
          "((len - shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))) * 32) " +
            "div shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
      val cum = hist.withColumn("cum",
        sum(col("c")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bounds = cum.crossJoin(broadcast(lens.agg(count(lit(1)).as("n"))))
        .agg(
          min(when(col("cum") >= expr("(n + 19) div 20"), col("bucket"))).as("bl"),
          min(when(col("cum") >= expr("(19 * n + 19) div 20"), col("bucket"))).as("bh"))
        .select(expr(lob("bl")).as("lo"), expr(lob("bh")).as("hi"))
      lens.crossJoin(broadcast(bounds))
        .agg(count(lit(1)).as("docs"),
          sum(when(col("len") >= col("lo") && col("len") <= col("hi"), 1L)
            .otherwise(0L)).as("kept"),
          sum(when(col("len") < col("lo"), 1L).otherwise(0L)).as("too_short"),
          sum(when(col("len") > col("hi"), 1L).otherwise(0L)).as("too_long"))
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
    // the deterministic log-linear histogram sketch, replayed exactly:
    // identical integer bucket algebra (bin-string length = floor log2,
    // shifts, floor division), cumulative counts over the sketch-sized
    // histogram, ceil-rank targets, bucket-lower-bound answers
    "text_length_outliers_approx" ->
      """WITH lens AS (
           SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS len
           FROM documents),
         hist AS (
           SELECT (length(bin(len)) - 1) * 32
                  + ((len - (CAST(1 AS BIGINT) << (length(bin(len)) - 1))) * 32)
                    // (CAST(1 AS BIGINT) << (length(bin(len)) - 1)) AS bucket,
                  count(*) AS c
           FROM lens GROUP BY 1),
         cum AS (SELECT bucket, sum(c) OVER (ORDER BY bucket) AS cum FROM hist),
         nn AS (SELECT count(*) AS n FROM lens),
         qb AS (SELECT min(CASE WHEN cum >= (n + 19) // 20 THEN bucket END) AS bl,
                       min(CASE WHEN cum >= (19 * n + 19) // 20 THEN bucket END) AS bh
                FROM cum CROSS JOIN nn),
         bounds AS (SELECT
             (CAST(1 AS BIGINT) << CAST(bl // 32 AS INT))
               + ((bl % 32) * (CAST(1 AS BIGINT) << CAST(bl // 32 AS INT))) // 32 AS lo,
             (CAST(1 AS BIGINT) << CAST(bh // 32 AS INT))
               + ((bh % 32) * (CAST(1 AS BIGINT) << CAST(bh // 32 AS INT))) // 32 AS hi
           FROM qb)
         SELECT count(*) AS docs,
                CAST(sum(CASE WHEN len >= lo AND len <= hi THEN 1 ELSE 0 END) AS BIGINT) AS kept,
                CAST(sum(CASE WHEN len < lo THEN 1 ELSE 0 END) AS BIGINT) AS too_short,
                CAST(sum(CASE WHEN len > hi THEN 1 ELSE 0 END) AS BIGINT) AS too_long
         FROM lens CROSS JOIN bounds""",
    // identical chunking (1-based inclusive slices ≡ Spark's slice), the
    // same planted header/footer lines, and 128-bit md5 line keys; NULLs
    // are skipped by string_agg exactly as collect_list skips them, and
    // ORDER BY pos replays sort_array's struct order
    "text_line_dedup" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          lw AS (SELECT doc_id,
                   (CASE WHEN doc_id % 3 = 0 THEN ['$boilerHeader']
                         ELSE CAST([] AS VARCHAR[]) END)
                   || list_transform(range(0, CAST(ceil(len(w) / 10.0e0) AS INT)),
                        i -> array_to_string(w[i * 10 + 1 : i * 10 + 10], ' '))
                   || (CASE WHEN doc_id % 4 = 0 THEN ['$boilerFooter']
                         ELSE CAST([] AS VARCHAR[]) END) AS lines
                 FROM d),
          lined AS (SELECT doc_id, unnest(lines) AS line,
                           generate_subscripts(lines, 1) AS pos
                    FROM lw),
          boiler AS (SELECT md5(line) AS h FROM lined
                     GROUP BY 1 HAVING count(*) >= 2)
          SELECT doc_id, count(*) AS n_lines, count(b.h) AS n_removed,
                 md5(coalesce(string_agg(CASE WHEN b.h IS NULL THEN line END,
                                         ' ' ORDER BY pos), '')) AS clean_md5
          FROM lined l LEFT JOIN boiler b ON md5(l.line) = b.h
          GROUP BY doc_id ORDER BY doc_id""",

    // kernel-contract bigrams (distinct on the gram STRING per doc, md5 →
    // long ids), the VERBATIM shared dsirWeightSql formula, and
    // exact-integer (×1e9) weight sums — order-independent in both engines
    "text_dsir_importance" -> {
      val tgtIn = dsirTargetSrcs.map(x => s"'$x'").mkString(", ")
      s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
                     FROM documents WHERE len(string_split(text, ' ')) >= 2),
          g0 AS (SELECT DISTINCT doc_id, source, gram FROM (
                   SELECT doc_id, source,
                          unnest(list_transform(range(1, len(w)),
                            i -> w[i] || ' ' || w[i + 1])) AS gram
                   FROM d)),
          g AS (SELECT doc_id, source,
                  (CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % $P)
                    % $dsirBuckets AS b
                FROM g0),
          raw AS (SELECT b, count(*) AS r FROM g GROUP BY 1),
          tgt AS (SELECT b, count(*) AS t FROM g
                  WHERE source IN ($tgtIn) GROUP BY 1),
          rtot AS (SELECT CAST(sum(r) AS BIGINT) AS rt FROM raw),
          ttot AS (SELECT CAST(coalesce(sum(t), 0) AS BIGINT) AS tt FROM tgt),
          wts AS (SELECT b,
                    CAST(round(($dsirWeightSql) * 1e9) AS BIGINT) AS w9
                  FROM (SELECT raw.b, coalesce(t, 0) AS t, r
                        FROM raw LEFT JOIN tgt USING (b))
                       CROSS JOIN rtot CROSS JOIN ttot)
          SELECT doc_id, count(*) AS n_grams, CAST(sum(w9) AS BIGINT) AS s9
          FROM g JOIN wts USING (b)
          GROUP BY doc_id ORDER BY doc_id"""
    },

    // identical positional 4-gram md5 strings, the same encoded-tie min
    // over the same 5-wide frame (winnowFpSql), distinct + per-doc agg
    "text_winnowing" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
          $winnowFpSql
          SELECT doc_id, count(*) AS n_fp, min(fp) AS fp_min
          FROM fp GROUP BY doc_id ORDER BY doc_id""",

    // both corpora fingerprinted by the same parameterized CTEs, the
    // base-df stop cap, the index×batch cross join, integer shared
    // counts — only the display ratio rounds
    "dedup_winnowing_incr" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents),
          $winnowFpSql,
          bc AS (SELECT doc_id + 100000 AS doc_id, text || ' zz0 zz1' AS text
                 FROM documents WHERE doc_id % 3 = 0),
          ${winnowFpSqlFor("bc", "b")},
          wdfs AS (SELECT fp, count(*) AS df FROM fp GROUP BY fp),
          keep AS (SELECT doc_id, f.fp FROM fp f JOIN wdfs USING (fp)
                   WHERE df <= $MaxFpDf),
          cnt AS (SELECT doc_id, count(*) AS n FROM fpb GROUP BY doc_id),
          pairs AS (SELECT a.doc_id AS dup_of, b.doc_id AS doc_id,
                           count(*) AS n_shared
                    FROM keep a JOIN fpb b ON a.fp = b.fp
                    GROUP BY 1, 2)
          SELECT doc_id, dup_of, n_shared,
                 round(n_shared / cnt.n, 3) AS contain_r
          FROM pairs JOIN cnt USING (doc_id)
          WHERE n_shared >= 2
          ORDER BY doc_id, dup_of""",

    // same fingerprint relation over the planted near-dup corpus, the
    // same integer df cap, the same self-join + integer shared counts —
    // only the display ratio rounds
    "dedup_winnowing_pairs" ->
      s"""WITH corpus AS (${Dedup.nearDupSql}),
          $winnowFpSql,
          wdfs AS (SELECT fp, count(*) AS df FROM fp GROUP BY fp),
          keep AS (SELECT doc_id, f.fp FROM fp f JOIN wdfs USING (fp)
                   WHERE df <= $MaxFpDf),
          cnt AS (SELECT doc_id, count(*) AS n FROM keep GROUP BY doc_id),
          pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_shared
                    FROM keep a JOIN keep b
                      ON a.fp = b.fp AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
          SELECT da, db, n_shared,
                 round(n_shared / least(ca.n, cb.n), 3) AS overlap_r
          FROM pairs
          JOIN cnt ca ON pairs.da = ca.doc_id
          JOIN cnt cb ON pairs.db = cb.doc_id
          WHERE n_shared >= 2
          ORDER BY da, db""",

    // kernel-contract word ids (p31 mode), the same integer weight map,
    // exact integer sums — the keep bit cannot diverge cross-engine
    "text_quality_classifier" ->
      s"""WITH t AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
          g AS (
            SELECT doc_id,
                   (CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) % $P)
                     % 1024 AS b
            FROM t)
          SELECT doc_id, count(*) AS n_tokens,
                 CAST(sum(b * 2654435761 % 2001 - 1000) AS BIGINT) AS score,
                 CASE WHEN CAST(sum(b * 2654435761 % 2001 - 1000) AS BIGINT) > 0
                      THEN 'keep' ELSE 'drop' END AS label
          FROM g GROUP BY doc_id ORDER BY doc_id""",

    // identical tokenization, the VERBATIM shared bm25ContribSql formula,
    // and exact-integer (×1e9) contribution sums — ranking replays
    // bit-for-bit regardless of either engine's aggregation order
    "text_bm25_multi" ->
      s"""WITH $bm25MultiScoredSql,
          ranked AS (
            SELECT q_id, doc_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY s9 DESC, doc_id) AS rank
            FROM scored)
          SELECT q_id, rank, doc_id FROM ranked WHERE rank <= 8
          ORDER BY q_id, rank""",

    // the same exact-integer lexical ranking, the same unnest+sum dense
    // cosine as every sim oracle (6dp rounding kills float residue), and
    // exact-integer RRF contributions — the fusion replays bit-for-bit
    "text_hybrid_rrf_multi" ->
      s"""WITH $bm25MultiScoredSql,
          tr0 AS (
            SELECT q_id, doc_id,
                   CAST(row_number() OVER (PARTITION BY q_id
                                           ORDER BY s9 DESC, doc_id)
                        AS BIGINT) AS rt
            FROM scored),
          tr AS (SELECT * FROM tr0 WHERE rt <= 8),
          hqv AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
                  WHERE vec_id < ${bm25Queries.size}),
          vpairs AS (SELECT q_id, vec_id AS nid, qe, embedding AS ce
                     FROM embeddings CROSS JOIN hqv WHERE vec_id >= 8),
          vdots AS (SELECT q_id, nid,
                           sum(CAST(xq AS DOUBLE) * CAST(xc AS DOUBLE)) AS dot,
                           sqrt(sum(CAST(xq AS DOUBLE) * CAST(xq AS DOUBLE))) AS nq,
                           sqrt(sum(CAST(xc AS DOUBLE) * CAST(xc AS DOUBLE))) AS nc
                    FROM (SELECT q_id, nid, unnest(qe) AS xq, unnest(ce) AS xc
                          FROM vpairs)
                    GROUP BY q_id, nid),
          vr0 AS (SELECT q_id, nid AS doc_id,
                         CAST(row_number() OVER (PARTITION BY q_id
                             ORDER BY round(dot / (nq * nc), 6) DESC, nid)
                              AS BIGINT) AS rv
                  FROM vdots),
          vr AS (SELECT * FROM vr0 WHERE rv <= 8)
          SELECT q_id, doc_id,
                 CAST(coalesce(CAST(round(1e9 / (60 + rt)) AS BIGINT), 0)
                      + coalesce(CAST(round(1e9 / (60 + rv)) AS BIGINT), 0)
                      AS BIGINT) AS rrf9,
                 rt, rv
          FROM tr FULL OUTER JOIN vr USING (q_id, doc_id)
          ORDER BY q_id, rrf9 DESC, doc_id""",

    // integer counts; n/total is double division of exact integers in both
    // engines, so the 6dp rounding is deterministic
    "text_vocab_topk" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         c AS (SELECT word, count(*) AS n FROM w GROUP BY word),
         t AS (SELECT sum(n) AS total FROM c)
         SELECT word, n, round(n / total, 6) AS frac
         FROM c CROSS JOIN t
         ORDER BY n DESC, word LIMIT 50""",

    // identical tokenization (space split), integer tf/df/dl/N, exact
    // integer-sum avgdl, and the VERBATIM shared bm25ScoreSql formula
    "text_bm25_topk" -> {
      val tfs = bm25Terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t')) AS tf$i"
      }.mkString(", ")
      val dfs = bm25Terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          f AS (SELECT doc_id, len(toks) AS dl, $tfs FROM d),
          stats AS (SELECT count(*) AS n, avg(dl) AS avgdl, $dfs FROM f)
          SELECT doc_id, round($bm25ScoreSql, 6) AS bm25_r, dl
          FROM f CROSS JOIN stats
          ORDER BY bm25_r DESC, doc_id LIMIT 10"""
    },
    // the bm25 replay + a single-query cosine replay (the dots pattern),
    // ranks from ≤10-row windows, integer-scaled RRF contributions
    "text_hybrid_rrf" -> {
      val tfs = bm25Terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(toks, x -> x = '$t')) AS tf$i"
      }.mkString(", ")
      val dfs = bm25Terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
          f AS (SELECT doc_id, len(toks) AS dl, $tfs FROM d),
          stats AS (SELECT count(*) AS n, avg(dl) AS avgdl, $dfs FROM f),
          t10 AS (SELECT doc_id, round($bm25ScoreSql, 6) AS bm25_r
                  FROM f CROSS JOIN stats
                  ORDER BY bm25_r DESC, doc_id LIMIT 10),
          tr AS (SELECT doc_id,
                        CAST(row_number() OVER (ORDER BY bm25_r DESC, doc_id)
                             AS BIGINT) AS rt
                 FROM t10),
          qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
          vpairs AS (SELECT vec_id AS nid, qe, embedding AS ce
                     FROM embeddings CROSS JOIN qv WHERE vec_id <> 0),
          vdots AS (SELECT nid,
                           sum(CAST(xq AS DOUBLE) * CAST(xc AS DOUBLE)) AS dot,
                           sqrt(sum(CAST(xq AS DOUBLE) * CAST(xq AS DOUBLE))) AS nq,
                           sqrt(sum(CAST(xc AS DOUBLE) * CAST(xc AS DOUBLE))) AS nc
                    FROM (SELECT nid, unnest(qe) AS xq, unnest(ce) AS xc FROM vpairs)
                    GROUP BY nid),
          v10 AS (SELECT nid, round(dot / (nq * nc), 6) AS cos_r FROM vdots
                  ORDER BY cos_r DESC, nid LIMIT 10),
          vr AS (SELECT nid AS doc_id,
                        CAST(row_number() OVER (ORDER BY cos_r DESC, nid)
                             AS BIGINT) AS rv
                 FROM v10)
          SELECT doc_id,
                 CAST(coalesce(CAST(round(1e9 / (60 + rt)) AS BIGINT), 0)
                      + coalesce(CAST(round(1e9 / (60 + rv)) AS BIGINT), 0)
                      AS BIGINT) AS rrf9,
                 rt, rv
          FROM tr FULL OUTER JOIN vr USING (doc_id)
          ORDER BY rrf9 DESC, doc_id LIMIT 10"""
    },

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

    // the same integer rule battery via DuckDB list functions; the
    // counts are exact so the bits cannot disagree
    "text_gopher_rules" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          c AS (SELECT doc_id,
                       CAST(len(w) AS BIGINT) AS n_words,
                       CAST(len(array_to_string(w, '')) AS BIGINT) AS sum_wlen,
                       CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
                            AS BIGINT) AS alpha_words,
                       CAST(len(list_distinct(list_filter(w, x -> x IN ($stopSql))))
                            AS BIGINT) AS stop_distinct
                FROM w),
          r AS (SELECT doc_id, n_words,
                       CASE WHEN n_words BETWEEN 50 AND 100000
                            THEN 1 ELSE 0 END AS r_len,
                       CASE WHEN sum_wlen >= n_words * 3 AND sum_wlen <= n_words * 10
                            THEN 1 ELSE 0 END AS r_wlen,
                       CASE WHEN alpha_words * 5 >= n_words * 4
                            THEN 1 ELSE 0 END AS r_alpha,
                       CASE WHEN (n_words - alpha_words) * 10 <= n_words
                            THEN 1 ELSE 0 END AS r_symbol,
                       CASE WHEN stop_distinct >= 2 THEN 1 ELSE 0 END AS r_stop
                FROM c)
          SELECT doc_id, n_words,
                 CAST(r_len AS BIGINT) AS r_len,
                 CAST(r_wlen AS BIGINT) AS r_wlen,
                 CAST(r_alpha AS BIGINT) AS r_alpha,
                 CAST(r_symbol AS BIGINT) AS r_symbol,
                 CAST(r_stop AS BIGINT) AS r_stop,
                 CASE WHEN r_len + r_wlen + r_alpha + r_symbol + r_stop = 5
                      THEN 'keep' ELSE 'drop' END AS verdict
          FROM r ORDER BY doc_id""",

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

    // replay ALL training rounds: char-spelling via the same regex, pair
    // counts weighted by word frequency, argmax with the same
    // (cnt DESC, pair ASC) tiebreak as a 1-row CTE per round, and the
    // rewrite via scalar-subquery literal `replace` (greedy left-to-right
    // non-overlap in both engines)
    "text_bpe_train" -> {
      val union = (1 to bpeRounds)
        .map(r => s"SELECT $r AS r, pair, merged, cnt FROM m$r")
        .mkString("\n          UNION ALL ")
      s"$bpeTrainCtes\n          $union ORDER BY r"
    },

    // replay the training (shared CTEs), then the apply chain: the same
    // char-spelling with '|' word markers and 6 scalar-subquery literal
    // replaces, token count = spelled tokens minus the n_words−1 markers
    "text_bpe_tokens" -> bpeTokensSql,

    // the full training+apply replay as a derived table, then one
    // corpus-level sum — per-row parity is already pinned by the
    // text_bpe_tokens oracles, so the sums can only agree
    "text_bpe_fertility" ->
      s"""SELECT CAST(sum(w.words) AS BIGINT) AS words,
                 CAST(sum(t.n_tokens) AS BIGINT) AS toks,
                 CAST((sum(t.n_tokens) * 10000) // sum(w.words) AS BIGINT)
                   AS fertility_bp
          FROM ($bpeTokensSql) t
          JOIN (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS words
                FROM documents) w USING (doc_id)""",

    // the fused kernel's contract IS the chained path's output (pad/gap
    // encoding equivalence, OpsSpec-pinned) — one oracle, two plans
    "text_bpe_tokens_fused" -> bpeTokensSql,

    // replay the p31 word ids, the positional pair-bucketing, the add-1
    // LM over the target slice, and the integer-scaled scoring (DuckDB
    // lists are 1-based: range(2, n+1) pairs (1,2)..(n-1,n) ≡ Spark's
    // 0-based (ids[i-1], ids[i]) over sequence(1, n-1))
    "text_ngram_perplexity" ->
      s"""WITH ids AS (
            SELECT doc_id, source,
                   list_transform(string_split(text, ' '),
                     x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)
                          % 2147483647) AS ids
            FROM documents WHERE len(string_split(text, ' ')) >= 2),
          grams AS (
            SELECT doc_id, source,
                   unnest(list_transform(range(2, len(ids) + 1),
                     i -> (ids[i - 1] * 31 + ids[i]) % 4096)) AS b
            FROM ids),
          tgt AS (SELECT b FROM grams
                  WHERE source IN (${dsirTargetSrcs.map(s0 => s"'$s0'").mkString(", ")})),
          total AS (SELECT count(*) AS t FROM tgt),
          lm AS (SELECT b,
                        CAST(round(ln((count(*) + 1.0e0) / (t + 4096.0e0)) * 1e9)
                             AS BIGINT) AS lp9
                 FROM tgt CROSS JOIN total GROUP BY b, t),
          scored AS (
            SELECT g.doc_id,
                   coalesce(lm.lp9,
                     CAST(round(ln(1.0e0 / (t + 4096.0e0)) * 1e9) AS BIGINT)) AS lp9
            FROM grams g LEFT JOIN lm USING (b) CROSS JOIN total)
          SELECT doc_id, count(*) AS n_bigrams,
                 round(exp(-sum(lp9) / 1e9 / count(*)), 4) AS ppl_r
          FROM scored GROUP BY doc_id ORDER BY doc_id""",

    // replay the stepped starts (Spark 0-based sequence(0, n-1, S) ≡
    // DuckDB 1-based range(1, n+1, S)), truncating slices, and the
    // 0-based chunk ids (generate_subscripts − 1 ≡ posexplode's pos)
    "text_chunk_sliding" ->
      s"""WITH chunks AS (
            SELECT doc_id,
                   list_transform(range(1, len(w) + 1, $chunkStride),
                     st -> array_to_string(w[st:st + ${chunkWindow - 1}], ' ')) AS cs
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
          SELECT doc_id, generate_subscripts(cs, 1) - 1 AS chunk_id,
                 CAST(len(string_split(unnest(cs), ' ')) AS BIGINT) AS n_tokens,
                 md5(unnest(cs)) AS chunk_md5
          FROM chunks ORDER BY doc_id, chunk_id""",

    // the same gram/bench CTEs as decontaminateSql, but every eligible
    // doc reports (total, shared, fraction) — zeros included
    "text_contamination_score" ->
      s"""WITH g AS (
            SELECT DISTINCT doc_id,
              CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % $P AS gid
            FROM (
              SELECT doc_id, unnest(list_transform(range(1, len(w) - 6),
                       i -> array_to_string(w[i:i+7], ' '))) AS gram
              FROM (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents WHERE len(string_split(text, ' ')) >= 8))),
          bench AS (
            SELECT DISTINCT
              CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % $P AS gid
            FROM (
              SELECT unnest(list_transform(range(1, len(w) - 6),
                       i -> array_to_string(w[i:i+7], ' '))) AS gram
              FROM (SELECT string_split(text, ' ')[3:] AS w
                    FROM documents
                    WHERE doc_id % 10 = 0
                      AND len(string_split(text, ' ')[3:]) >= 8)))
          SELECT doc_id, count(*) AS n_grams,
                 count(b.gid) AS shared_grams,
                 round(count(b.gid) / (count(*) * 1.0), 4) AS contamination
          FROM g LEFT JOIN bench b ON g.gid = b.gid
          GROUP BY doc_id ORDER BY doc_id""",

    "text_decontaminate" -> decontaminateSql,

    // positional gram ids over the corpus (the oracle needs no
    // two-phase split — docs without matches emit no rows either way),
    // then the same gaps-and-islands merge
    "text_decontaminate_spans" ->
      s"""WITH bench AS (
            SELECT DISTINCT
              CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % $P AS gid
            FROM (
              SELECT unnest(list_transform(range(1, len(w) - 6),
                       i -> array_to_string(w[i:i+7], ' '))) AS gram
              FROM (SELECT string_split(text, ' ')[3:] AS w
                    FROM documents
                    WHERE doc_id % 10 = 0
                      AND len(string_split(text, ' ')[3:]) >= 8))),
          d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                WHERE len(string_split(text, ' ')) >= 8),
          posg AS (
            SELECT doc_id, i,
              CAST(concat('0x', substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))
                   AS BIGINT) % $P AS gid
            FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM d)),
          starts AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS i
            FROM posg JOIN bench USING (gid)),
          m AS (SELECT doc_id, i,
                  max(i + 8) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
                FROM starts),
          isl AS (SELECT doc_id, i,
                    sum(CASE WHEN prev_max_end IS NULL OR i > prev_max_end
                        THEN 1 ELSE 0 END)
                      OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                  FROM m)
          SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
                 CAST(max(i) + 8 AS BIGINT) AS span_end
          FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start""",

    // the same positional replay with the per-suite bench table rendered
    // from decontamSets; windows partition by (bench_set, doc_id)
    "text_decontam_spans_multi" -> decontamSpansMultiSql,

    // the span replay above, rolled up per suite
    "text_decontam_report" ->
      s"""WITH spans AS ($decontamSpansMultiSql)
          SELECT bench_set,
                 CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_hit,
                 CAST(count(*) AS BIGINT) AS spans,
                 CAST(sum(span_end - span_start) AS BIGINT) AS redacted_tokens
          FROM spans GROUP BY bench_set ORDER BY bench_set""",

    // the bloom prefilter never false-negatives and the survivors go
    // through the same exact verification join, so the bloom variant's
    // contract IS the exact operator's output — one oracle, two plans
    "text_decontaminate_bloom" -> decontaminateSql,

    "text_pii_redact" ->
      """WITH dirty AS (
           SELECT doc_id,
                  'contact u' || CAST(doc_id AS VARCHAR) || '@example.com ' || text ||
                  (CASE WHEN doc_id % 2 = 0
                        THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE '' END) AS dirty
           FROM documents)
         SELECT doc_id,
                len(regexp_extract_all(dirty, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}'))
                  AS n_email,
                len(regexp_extract_all(dirty, '\b\d{3}-\d{4}\b')) AS n_phone,
                md5(regexp_replace(
                      regexp_replace(dirty, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}',
                                     '<EMAIL>', 'g'),
                      '\b\d{3}-\d{4}\b', '<PHONE>', 'g')) AS clean_md5
         FROM dirty ORDER BY doc_id""",

    "text_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         arr AS (SELECT doc_id, len(w) AS n_words,
                        greatest(len(w) - 1, 0) AS n_2grams,
                        CASE WHEN len(w) >= 2
                             THEN len(list_distinct(list_transform(range(1, len(w)),
                                    i -> w[i] || ' ' || w[i+1])))
                             ELSE 0 END AS d_2grams
                 FROM w),
         top AS (SELECT doc_id, max(c) AS top_c FROM (
                   SELECT doc_id, word, count(*) AS c
                   FROM (SELECT doc_id, unnest(w) AS word FROM w)
                   GROUP BY 1, 2) GROUP BY 1),
         r AS (SELECT doc_id, n_words,
                      CASE WHEN n_2grams > 0
                           THEN round(1.0 - d_2grams / (n_2grams * 1.0), 4)
                           ELSE 0.0 END AS dup_ratio
               FROM arr)
         SELECT doc_id,
                round(top_c / (n_words * 1.0), 4) AS top_word_ratio,
                dup_ratio AS dup_2gram_ratio,
                (top_c / (n_words * 1.0) > 0.2 OR dup_ratio > 0.2) AS repetitive
         FROM r JOIN top USING (doc_id) ORDER BY doc_id""",

    "text_entropy" ->
      """WITH wc AS (
           SELECT doc_id, word, count(*) AS c
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents)
           GROUP BY 1, 2)
         SELECT doc_id, round(log2(n) - sclc / n, 4) AS entropy
         FROM (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n,
                      sum(c * log2(c)) AS sclc
               FROM wc GROUP BY doc_id)
         ORDER BY doc_id""",

    // per-doc distinct replayed via SELECT DISTINCT (doc_ids are unique
    // per corpus row, so per-array distinct ≡ per-(doc, gram) distinct);
    // the df-desc/gram-asc order makes the top-20 boundary deterministic
    "text_topk_ngrams" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 5),
         g AS (
           SELECT DISTINCT doc_id, array_to_string(w[i : i + 4], ' ') AS gram
           FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM d)),
         dfs AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
         SELECT gram, df FROM dfs ORDER BY df DESC, gram LIMIT 20""",

    // the CMS replay: identical 52-bit md5 gram ids, the same 4 disjoint
    // 12-bit slices as row hashes (dv = 2^(12j) divisors), per-cell
    // counts, min-of-4 estimate, and the sketch-side >= T emission with
    // the exact-df truth flag
    "text_heavy_hitters_cms" ->
      hhCmsSqlFor("SELECT doc_id, text FROM documents"),

    // same replay over the union corpus — CMS(base) + CMS(batch) ==
    // CMS(base ∪ batch) exactly (cells add), so the oracle needs no
    // separate merge step
    "text_heavy_hitters_incr" ->
      hhCmsSqlFor(
        """SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 300000 AS doc_id, text || ' zz0 zz1' AS text
           FROM documents WHERE doc_id % 4 = 0"""),

    // the text_topk_ngrams distinct-gram CTE mapped to md5 shingle ids
    // (the shingle_sids_md5 replay — string-level DISTINCT first, id
    // collisions kept); unique grams route to their single owner
    // through min(doc_id) — no gram-keyed join back
    "text_ngram_novelty" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents
           WHERE len(string_split(text, ' ')) >= 5),
         gs AS (
           SELECT DISTINCT doc_id, array_to_string(w[i : i + 4], ' ') AS gram
           FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM d)),
         g AS (
           SELECT doc_id,
                  CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT)
                    % 2147483647 AS gid
           FROM gs),
         dfs AS (SELECT gid, count(*) AS df, min(doc_id) AS owner
                 FROM g GROUP BY gid),
         us AS (SELECT owner AS doc_id, CAST(count(*) AS BIGINT) AS uniq
                FROM dfs WHERE df = 1 GROUP BY owner),
         ngs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ng
                 FROM g GROUP BY doc_id)
         SELECT doc_id, ng,
                CAST(coalesce(uniq, 0) AS BIGINT) AS uniq,
                CAST((coalesce(uniq, 0) * 10000) // ng AS BIGINT) AS novelty_bp
         FROM ngs LEFT JOIN us USING (doc_id)
         ORDER BY doc_id""",

    // word gate = exact token membership, phrase gate = substring
    // contains — both engines evaluate the same literal lists
    "text_blocklist_filter" ->
      s"""SELECT doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                      w -> w IN (${blockWords.map(w => s"'$w'").mkString(", ")}))) AS BIGINT)
                   AS word_hits,
                 CAST(${blockPhrases.map(p => s"(CASE WHEN contains(text, '$p') THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT)
                   AS phrase_hits,
                 CASE WHEN len(list_filter(string_split(text, ' '),
                        w -> w IN (${blockWords.map(w => s"'$w'").mkString(", ")}))) = 0
                       AND ${blockPhrases.map(p => s"NOT contains(text, '$p')").mkString(" AND ")}
                      THEN 'keep' ELSE 'drop' END AS verdict
          FROM documents ORDER BY doc_id""",

    // idf6Sql shared verbatim; tf·idf6 is exact integer arithmetic so
    // the per-doc ranking has no float channel (ties break on word)
    "text_tfidf_topk" ->
      s"""WITH tf AS (
            SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents)
            GROUP BY doc_id, word),
          nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
          idf AS (SELECT word, $idf6Sql AS idf6
                  FROM (SELECT word, CAST(count(*) AS BIGINT) AS df
                        FROM tf GROUP BY word) CROSS JOIN nd),
          scored AS (SELECT doc_id, tf.word AS word,
                            CAST(tf * idf6 AS BIGINT) AS s6
                     FROM tf JOIN idf ON tf.word = idf.word),
          ranked AS (SELECT doc_id, word, s6,
                            CAST(row_number() OVER (PARTITION BY doc_id
                              ORDER BY s6 DESC, word) AS BIGINT) AS rank
                     FROM scored)
          SELECT doc_id, rank, word, s6 FROM ranked
          WHERE rank <= 3 ORDER BY doc_id, rank""",

    "text_length_outliers" ->
      """WITH lens AS (
           SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
           FROM documents),
         b AS (SELECT quantile_cont(len, 0.05) AS lo,
                      quantile_cont(len, 0.95) AS hi FROM lens)
         SELECT count(*) AS docs,
                count(CASE WHEN len >= lo AND len <= hi THEN 1 END) AS kept,
                count(CASE WHEN len < lo THEN 1 END) AS too_short,
                count(CASE WHEN len > hi THEN 1 END) AS too_long
         FROM lens CROSS JOIN b""",

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
