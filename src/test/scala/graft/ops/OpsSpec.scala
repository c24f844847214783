package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Self-consistency tests for the training-data-pipeline ops on the sf0.001
  * tables (the oracle harness hash-checks them at sf0.01; these assert the
  * semantic properties the hashes alone don't explain). */
class OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("Lsh.planesFor: smallest p>=4 with 2^p*64 >= n (the contract the SQL oracles replay)") {
    assert(Lsh.planesFor(1) == 4)
    assert(Lsh.planesFor(500) == 4)   // sf0.01 embeddings
    assert(Lsh.planesFor(1024) == 4)  // exact boundary: 2^4*64 = 1024
    assert(Lsh.planesFor(1025) == 5)
    assert(Lsh.planesFor(2000) == 5)  // sf0.1 embeddings
    assert(Lsh.planesFor(24000) == 9) // ScaleProbe 10x dedup corpus
    assert(Lsh.planesFor(Long.MaxValue) == Lsh.MaxPlanes)
  }

  test("winrm mutant control: fixed predicate fires on planted rows, the " +
      "shipped quirk predicate on none (falsifies the 0-row fidelity oracle)") {
    import spark.implicits._
    // the full-oracle query: synth + planted rows, mechanically-fixed rule
    val fired = Detection.queries("sig_winrm_mutant")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(fired == Seq(-2L, -1L),
      s"fixed winrm rule must match exactly the planted positives, got $fired")
    // the shipped predicate (untranslated `*` wildcards) must match NOTHING,
    // even the planted positives — that is the corpus quirk being preserved
    val planted = Detection.winrmPlanted.toDF("eid", "ParentImage", "Image")
    assert(planted.filter(
      graft.rules.ReferenceCorpus.winrmShells.where.toColumn(col)).count() == 0)
  }

  test("fixSigmaWildcards: only Sigma's `*` is a wildcard — literal % _ . are inert") {
    import graft.compile.{Eq, In}
    import spark.implicits._
    val rows = Seq(
      ("a", """100% discount"""), // literal % must not wildcard
      ("b", """100x discount"""),
      ("c", """snake_case"""),    // literal _ must not wildcard
      ("d", """snakeXcase"""),
      ("e", """v1.2 build 9"""),  // literal . must not regex-wildcard
      ("f", """v1x2 build 9"""),
      ("g", """pre middle post""")) // real Sigma * wildcard still works
      .toDF("eid", "CommandLine")
    def fired(p: graft.compile.Pred): Set[String] =
      rows.filter(Detection.fixSigmaWildcards(p).toColumn(
        f => col(f))).select("eid").collect().map(_.getString(0)).toSet
    assert(fired(Eq("CommandLine", "100% disc*")) == Set("a"))
    assert(fired(Eq("CommandLine", "snake_case")) == Set("c")) // no * → untouched Eq
    assert(fired(Eq("CommandLine", "v1.2*9")) == Set("e"))
    assert(fired(In("CommandLine", Seq("pre*post", "100% discount"))) == Set("a", "g"))
  }

  test("dedup_exact finds exactly the planted byte-exact copies") {
    val out = Dedup.queries("dedup_exact")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) == 2)) // every group = original + copy
    assert(out.forall(_.getLong(0) % 4 == 0)) // canonical = planted doc ids
  }

  test("minhash LSH and fast variant both recall the planted near-dups") {
    val lsh = Dedup.queries("dedup_minhash_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 === 0).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    assert(planted.subsetOf(lsh), s"missed: ${planted -- lsh}")
    val fast = Dedup.queries("dedup_minhash_fast")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(fast), s"fast variant missed: ${planted -- fast}")
  }

  test("embedding near-dup finds exactly the planted scaled copies") {
    val out = Dedup.queries("dedup_embedding_cosine")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0).select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    assert(out == planted)
  }

  test("semantic dedup catches the planted copies inside learned clusters") {
    val out = Dedup.queries("dedup_semantic")(spark, dir).collect()
    val base = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val planted = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0).count()
    // every vector is assigned to exactly one cluster
    assert(out.map(_.getLong(1)).sum == base + planted)
    // a planted pair (v, 1.01·v) has cosine ≈ 1; it is caught iff k-means
    // put both in the same cluster — the 1% scale gap makes a boundary
    // split possible but rare, so demand ≥ 0.8 recall (the
    // dedup_incremental_maint floor), not exactness
    val removed = out.map(_.getLong(3)).sum
    assert(removed >= (planted * 0.8).toLong,
      s"removed $removed of $planted planted copies")
    // clusters partition the corpus: more than one non-empty cluster,
    // none holding the whole corpus
    assert(out.length > 1)
    assert(out.map(_.getLong(1)).max < base + planted)
  }

  test("brute-force top-k: ranks are 1..3 per query, neighbors distinct") {
    val out = Similarity.queries("sim_topk_bruteforce")(spark, dir).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.forall { case (_, rs) => rs.map(_.getInt(1)).sorted.sameElements(Array(1, 2, 3)) })
    assert(byQ.forall { case (_, rs) => rs.map(_.getLong(2)).distinct.length == 3 })
  }

  test("LSH ANN returns a subset of brute-force candidates per query") {
    // every LSH neighbor must at least be a valid corpus vector != query
    val out = Similarity.queries("sim_lsh_ann")(spark, dir).collect()
    assert(out.forall(r => r.getLong(2) >= 8))
    assert(out.nonEmpty)
  }

  test("multimodal decode stub: chunk means match a direct computation") {
    val row = Multimodal.queries("mm_decode_features")(spark, dir)
      .filter(col("doc_id") === 0).collect()(0)
    val text = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length
    val chunk0 = bytes.zipWithIndex.filter { case (_, i) => i.toLong * 4 / n == 0 }.map(_._1 & 0xff)
    val expect = math.round(chunk0.sum.toDouble / chunk0.length * 1000) / 1000.0
    assert(row.getAs[Double]("c0") == expect)
    assert(row.getAs[Int]("n_bytes") == n)
  }

  test("approx sketches honor their parameterized theoretical error bounds") {
    // agg_approx_sketch (Relational.scala) since round 11 ships the
    // DETERMINISTIC sketches (KMV distinct + log-linear quantile) so the
    // query gets a full DuckDB hash oracle; the bounds asserted here:
    // - approx_users: KMV(k=64). Below k distinct the sketch is EXACT by
    //   construction; above, the estimator's relative standard error is
    //   ~1/sqrt(k-2) ≈ 12.7% — hard bound at 3σ, empirical 1σ pin on this
    //   fixed dataset (deterministic hashes: a violation means the sketch
    //   changed, not bad luck).
    // - approx_p50_cents: lower bound of the log-linear bucket (32
    //   subdivisions per octave) holding the true rank-ceil(n/2) cents
    //   value v: a <= v <= a + (a+1)/32 + 1 (the +1s absorb the c1 = cents
    //   + 1 domain shift and integer bucket-width floors).
    // Spark's NATIVE sketches stay bounds-pinned below so the built-in
    // capability (HLL++, Greenwald–Khanna) keeps its regression guard even
    // though the shipped query no longer uses them.
    val kmvSigma = 1.0 / math.sqrt(64 - 2)
    val approx = Relational.queries("agg_approx_sketch")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.engine.Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("d"),
        sort_array(collect_list(expr("CAST(round(value * 100) AS BIGINT)")))
          .as("cents"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    exact.foreach { case (k, (d, cents)) =>
      val (ad, ap50) = approx(k)
      if (d < 64) assert(ad == d, s"$k: KMV below k must be exact ($ad vs $d)")
      else {
        val err = math.abs(ad - d).toDouble / d
        assert(err <= 3 * kmvSigma, s"$k distinct: $ad vs $d breaks 3σ KMV bound")
        assert(err <= kmvSigma, s"$k distinct: $ad vs $d (1σ empirical pin)")
      }
      val v = cents((cents.size + 1) / 2 - 1) // true rank-ceil(n/2) value
      assert(ap50 <= v && v <= ap50 + (ap50 + 1) / 32 + 1,
        s"$k p50=$ap50 misses exact median cents $v beyond the 1/32 bound")
    }
    // the KMV estimator path + merge-order-freeness, on a corpus larger
    // than k: 5000 distinct keys through the identical md5-52-bit channel,
    // aggregated under two different partitionings — identical sketches
    // (the state is a function of the SET) and a 3σ-bounded estimate
    graft.functions.GraftFunctions.register(spark)
    def est(parts: Int): Long = spark.range(5000).toDF("id")
      .repartition(parts)
      .select(expr(
        "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 13), 16, 10) AS BIGINT)")
        .as("h"))
      .agg(expr("kmv64(h)").as("sk"))
      .select(expr(
        "(CAST(63 AS BIGINT) * CAST(4503599627370496 AS BIGINT)) div " +
          "greatest(element_at(sk.hs, 64), CAST(1 AS BIGINT))"))
      .collect()(0).getLong(0)
    val (e1, e32) = (est(1), est(32))
    assert(e1 == e32, s"KMV must be partitioning-invariant ($e1 vs $e32)")
    assert(math.abs(e1 - 5000).toDouble / 5000 <= 3 * kmvSigma,
      s"KMV estimate $e1 for 5000 distinct breaks the 3σ bound")
  }

  test("native Spark sketches keep their theoretical-bound regression pins") {
    // approx_count_distinct (HLL++, relativeSD=0.05) and
    // percentile_approx (GK, accuracy=1000) were agg_approx_sketch's
    // implementation through round 10; the shipped query moved to
    // oracle-replayable sketches, but the native capability keeps its
    // bound assertions: 3σ hard / 1σ empirical for HLL, and the GK RANK
    // guarantee (returned value's rank within n/1000 + 2 of 0.5n).
    val rsd = 0.05
    val eps = 1.0 / 1000
    val approx = graft.engine.Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("ad"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap50"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val apCol = approx.foldLeft(lit(null).cast("double")) {
      case (acc, (k, (_, v))) => when(col("event_type") === k, lit(v)).otherwise(acc)
    }
    val exact = graft.engine.Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("d"), count(lit(1)).as("n"),
        sum(when(col("value") < apCol, 1L).otherwise(0L)).as("below"),
        sum(when(col("value") <= apCol, 1L).otherwise(0L)).as("atOrBelow"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    exact.foreach { case (k, (d, n, below, atOrBelow)) =>
      val (ad, ap50) = approx(k)
      val err = math.abs(ad - d).toDouble / d
      assert(err <= 3 * rsd, s"$k distinct: $ad vs $d breaks the 3*rsd HLL bound")
      assert(err <= rsd, s"$k distinct: $ad vs $d (1-sigma empirical pin)")
      val target = 0.5 * n
      val slack = eps * n + 2
      assert(below + 1 - slack <= target && target <= atOrBelow + slack,
        s"$k p50=$ap50 rank interval [${below + 1}, $atOrBelow] " +
          s"misses target $target by more than $slack")
    }
  }

  test("as-of join picks the latest order at-or-before event time") {
    val out = Relational.queries("join_asof")(spark, dir)
    val row = out.filter(col("event_id") === 5).collect()(0)
    // recompute directly for one event
    val uid = row.getLong(1)
    val ts = graft.engine.Tables(spark, dir, "events").filter(col("event_id") === 5)
      .select(timestamp_micros(lit(788918400000000L)
        + (unix_micros(col("ts")) * 131) % 207705600000000L)).collect()(0).getTimestamp(0)
    val expect = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_custkey") === uid && col("o_orderdate") <= lit(ts))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .select("o_orderkey").collect()(0).getLong(0)
    assert(row.getLong(2) == expect)
  }

  test("text quality/tokens: spot-check one document") {
    val doc = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 1).collect()(0)
    val words = doc.getAs[String]("text").split(" ")
    val t = TextOps.queries("text_tokens")(spark, dir)
      .filter(col("doc_id") === 1).collect()(0)
    assert(t.getAs[Int]("ws_tokens") == words.length)
    assert(t.getAs[Int]("chars") == doc.getAs[String]("text").length)
  }

  test("cluster CC: every planted near-dup pair lands in one cluster") {
    val labels = Dedup.queries("dedup_cluster_cc")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 === 0).select("doc_id").collect().map(_.getLong(0))
    planted.foreach { d =>
      assert(labels.contains(d) && labels.contains(d + 100000), s"node $d missing")
      assert(labels(d) == labels(d + 100000), s"pair $d split across clusters")
    }
    // a cluster label is the min member id, so it labels itself
    labels.values.foreach(l => assert(labels(l) == l, s"non-canonical label $l"))
  }

  test("frame sample: means match a direct computation for one doc") {
    val text = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val bytes = text.getBytes("UTF-8")
    val w = 16 // width for doc_id 0: 16 + 0 % 64
    val rows = Multimodal.queries("mm_frame_sample")(spark, dir)
      .filter(col("doc_id") === 0).collect()
    assert(rows.length == (bytes.length / w + 3) / 4) // frames 0,4,8,…
    rows.foreach { r =>
      val f = r.getInt(1)
      assert(f % 4 == 0)
      val frame = bytes.slice(f * w, f * w + w).map(_ & 0xff)
      val expect = math.round(frame.sum.toDouble / w * 1000) / 1000.0
      assert(r.getDouble(2) == expect, s"frame $f")
    }
  }

  test("salted skew join equals the plain unsalted join") {
    val salted = Relational.queries("join_skew_salted")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val li = graft.engine.Tables(spark, dir, "lineitem")
      .select((col("l_orderkey") % 5).as("hk"), col("l_extendedprice"))
    val dim = graft.engine.Tables(spark, dir, "nation")
      .filter(col("n_nationkey") < 5).select(col("n_nationkey").as("hk"), col("n_name"))
    val plain = li.join(dim, "hk")
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("unpivot emits one row per (part, metric)") {
    val out = Relational.queries("unpivot_long")(spark, dir)
    val nParts = spark.read.parquet(s"$dir/part.parquet").count()
    assert(out.count() == 2 * nParts)
    val metrics = out.select("metric").distinct().collect().map(_.getString(0)).toSet
    assert(metrics == Set("size", "price"))
  }

  test("quality expectations: one row, violation counts bounded by rows") {
    val r = Curation.queries("quality_expectations")(spark, dir).collect()
    assert(r.length == 1)
    val rows = r(0).getLong(0)
    assert(rows == spark.read.parquet(s"$dir/lineitem.parquet").count())
    (1 until r(0).size).foreach(i => assert(r(0).getLong(i) >= 0 && r(0).getLong(i) <= rows))
  }

  test("histogram bins partition the data: counts sum to table size") {
    val out = Curation.queries("profile_histogram")(spark, dir).collect()
    val total = out.map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"$dir/events.parquet").count())
    out.foreach { r => // per-bin bounds actually inside the bin
      val bin = r.getLong(0)
      assert(r.getDouble(2) >= bin * 50.0 && r.getDouble(3) < (bin + 1) * 50.0)
    }
  }

  test("streaming banded signatures reproduce the batch fast-variant candidates") {
    // the per-row array-land signature (streaming path) and the
    // explode+groupBy signature (batch path) must be the same function
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sigs = graft.streaming.StreamingDedup.bandedSignatures(docs)
    val pairs = sigs.as("x").join(sigs.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.queries("dedup_minhash_fast")(spark, dir)
      // fast variant runs on the planted near-dup corpus; restrict to the
      // base-table pairs for comparison
      .filter(col("da") < 100000 && col("db") < 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == batch)
  }

  test("star CC equals label-propagation CC on the real candidate graph") {
    val lp = Dedup.queries("dedup_cluster_cc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val st = Dedup.queries("dedup_cluster_cc_stars")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(st == lp)
  }

  test("star CC converges in O(log d) rounds on a diameter-1023 chain") {
    import spark.implicits._
    val chain = spark.range(1023)
      .select(col("id").as("da"), (col("id") + 1).as("db"))
    val (labels, rounds) = Dedup.starCC(chain)
    assert(rounds <= 12, s"took $rounds rounds") // log2(1024) + slack
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 1024 && got.forall(_._2 == 0L))
  }

  test("decontamination flags every planted benchmark-source doc") {
    val flagged = TextOps.queries("text_decontaminate")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    // every 10th doc is quoted into the benchmark set (first 2 words
    // dropped), so each source doc with >= 10 words must share 8-grams
    val sources = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 === 0 && size(split(col("text"), " ")) >= 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sources.subsetOf(flagged), s"missed: ${sources -- flagged}")
  }

  test("PII redaction counts the planted email and phone, and scrubs both") {
    val out = TextOps.queries("text_pii_redact")(spark, dir)
    val rows = out.collect()
    assert(rows.forall(_.getInt(1) >= 1)) // planted email always found
    rows.filter(_.getLong(0) % 2 == 0).foreach(r => assert(r.getInt(2) >= 1))
    // redacted text no longer matches either pattern: recompute counts on
    // the redacted string by rebuilding it (md5 output, so assert via a
    // direct recomputation instead)
    val clean = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("dirty", concat(
        lit("contact u"), col("doc_id").cast("string"), lit("@example.com "),
        col("text")))
      .withColumn("clean", regexp_replace(col("dirty"),
        "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"))
      .filter(col("clean").rlike("@")).count()
    assert(clean == 0)
  }

  test("repetition ratios are in [0,1] and planted-free corpus is mostly clean") {
    val rows = TextOps.queries("text_repetition")(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) > 0 && r.getDouble(1) <= 1)
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
    }
    assert(rows.length == spark.read.parquet(s"$dir/documents.parquet").count())
  }

  test("stratified split is ~90/10 per label and covers every doc") {
    val out = Curation.queries("sample_stratified")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = out.values.sum
    assert(total == spark.read.parquet(s"$dir/documents.parquet").count())
    out.keys.map(_._1).toSet.foreach { (lbl: String) =>
      val train = out.getOrElse((lbl, "train"), 0L).toDouble
      val n = train + out.getOrElse((lbl, "eval"), 0L)
      assert(train / n > 0.75 && train / n < 1.0, s"$lbl split ${train / n}")
    }
  }

  test("LSH embedding dedup finds every planted scaled copy (no labels needed)") {
    // a positive scalar copy preserves every hyperplane projection sign,
    // so each planted dup must share its original's bucket and be found
    val out = Dedup.queries("dedup_embedding_lsh")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 5 === 0).select("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    assert(planted.subsetOf(out), s"missed: ${planted -- out}")
  }

  test("sequence packing: bins fill sequentially, offsets stay under budget") {
    val out = Curation.queries("pack_sequences")(spark, dir).collect()
    assert(out.length == spark.read.parquet(s"$dir/documents.parquet").count())
    assert(out.forall(r => r.getLong(5) >= 0 && r.getLong(5) < 2048)) // off_in_bin
    // within each (lang, shard) group, bin ids are non-decreasing in doc order
    out.groupBy(r => (r.getString(1), r.getLong(2))).values.foreach { rs =>
      val bins = rs.sortBy(_.getLong(0)).map(_.getLong(4))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b }, bins.toSeq)
    }
  }

  test("token-budget curation: budget binds, kept set is the greedy quality prefix") {
    val out = Curation.queries("curate_token_budget")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    assert(out.forall(_._5 <= 200), "running sum exceeds the per-shard budget")
    // recompute every doc's (source, shard, rank) with the op's own hash
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 100 % 4).as("shard"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length < all.length, "budget never bound — raise the fixture density")
    // the kept set per (source, shard) is exactly the greedy prefix of the
    // quality order (capped tokens desc, doc_id asc) under the budget
    all.groupBy(t => (t._2, t._4)).foreach { case ((src, shard), docs) =>
      val ordered = docs.sortBy(t => (-math.min(t._3, 400L), t._1))
      val expected = ordered.scanLeft(0L)(_ + _._3).tail.zip(ordered)
        .takeWhile(_._1 <= 200).map(_._2._1).toSet
      val got = out.filter(t => t._2 == src && t._3 == shard).map(_._1).toSet
      assert(got == expected, s"($src, $shard): $got vs $expected")
    }
  }

  test("deterministic shuffle: a permutation, dense positions, reproducible") {
    val out = Curation.queries("shuffle_deterministic")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.length == n, "every doc assigned exactly once")
    assert(out.map(_._1).distinct.length == n)
    // positions are dense 0..k-1 within each shard
    out.groupBy(_._2).values.foreach { rs =>
      assert(rs.map(_._3).sorted.sameElements(rs.indices.map(_.toLong)))
    }
    // rerun is bit-identical (no rand() anywhere)
    val again = Curation.queries("shuffle_deterministic")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sameElements(again))
  }

  test("curation pipeline e2e composes its three stages exactly") {
    val out = Curation.queries("curate_pipeline_e2e")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // stage 1: the kept ids are exactly curate_token_budget's kept set
    val kept = Curation.queries("curate_token_budget")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == kept)
    // stage 2: positions are dense per shard, ordered by the seeded hash
    out.groupBy(_._2).values.foreach { rs =>
      assert(rs.map(_._3).sorted.sameElements(rs.indices.map(_.toLong)))
    }
    // stage 3: offsets are the running token sum in (shard, pos) order
    out.groupBy(_._2).values.foreach { rs =>
      var off = 0L
      rs.sortBy(_._3).foreach { case (_, _, _, toks, bin, offInBin) =>
        assert(bin == off / 2048 && offInBin == off % 2048)
        off += toks
      }
    }
  }

  test("weighted sampling honors the per-language target rates") {
    val out = Curation.queries("sample_weighted")(spark, dir).collect()
    out.foreach { r =>
      val (lang, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(kept <= total)
      val target = lang match {
        case "en" => 0.90; case "de" => 0.50; case "fr" => 0.25; case _ => 0.10
      }
      // hash buckets are uniform; small per-lang counts allow wide noise
      assert(math.abs(kept.toDouble / total - target) < 0.35, s"$lang ${kept.toDouble / total}")
    }
  }

  test("containment dedup finds truncated copies symmetric Jaccard would miss") {
    val out = Dedup.queries("dedup_containment")(spark, dir).collect()
    assert(out.forall(_.getDouble(2) >= 0.9))
    val found = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 6 === 0).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    // banded candidates are tuned for symmetric Jaccard; a 40-of-150-word
    // containment has J≈0.25, so some band misses are expected — the
    // asymmetric-candidate upgrade (prefix blocking) is the 100 TB path
    val recall = planted.count(found).toDouble / planted.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("simhash pair search: high planted recall, all pairs within hamming 2") {
    val out = Dedup.queries("dedup_simhash_pairs")(spark, dir).collect()
    assert(out.forall(_.getLong(2) <= 2))
    val found = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 === 0).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    val recall = planted.count(found).toDouble / planted.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("simhash64 pair search: planted recall, all pairs within hamming 3 of 64") {
    val out = Dedup.queries("dedup_simhash64_pairs")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(2) <= 3))
    val found = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 === 0).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + 100000)).toSet
    // a 2-word append flips more of 64 bits than of 32, so the Hamming-3
    // net catches fewer planted pairs than the 32-bit/≤2 variant — but the
    // wider signature also separates DISTINCT docs much harder, which is
    // the production trade. Recall here is a floor, precision-style sanity
    // is the ham<=3 assertion above.
    val recall = planted.count(found).toDouble / planted.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("incremental dedup: batch pairs only against the base index, high planted recall") {
    val out = Dedup.queries("dedup_incremental")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    // structure: output pairs are strictly (batch doc, base doc), J >= 0.5
    out.foreach { case (b, a, j) =>
      assert(b >= 100000 && a < 100000 && j >= 0.5, s"($b, $a, $j)")
    }
    // recall: each planted batch doc (original + 2 appended words) should
    // find its original; very short docs can fall under the 0.5 Jaccard
    // bar, so assert a high fraction rather than totality
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 === 0 && size(split(col("text"), " ")) >= 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hits = out.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).toSet }
    val found = planted.count(d => hits.getOrElse(d + 100000, Set.empty).contains(d))
    assert(found.toDouble / planted.size >= 0.8,
      s"recall ${found.toDouble / planted.size} ($found/${planted.size})")
  }

  test("maintained incremental dedup: batch 2 catches near-dups of batch 1, not just the base") {
    val out = Dedup.queries("dedup_incremental_maint")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    // structure: emitted pairs are (batch-2 doc, anything already indexed)
    out.foreach { case (b, a, j) =>
      assert(b >= 200000 && a < 200000 && j >= 0.5, s"($b, $a, $j)")
    }
    // the appended state is live: docs divisible by 15 exist in BOTH
    // batches (batch 1: +' zz0 zz1', batch 2: +' zz0 zz1 zz2'), so batch 2
    // must find its batch-1 twin — a dup_of in [100000, 200000) proves the
    // index really grew between the two ingest steps
    val vsBatch1 = out.filter { case (_, a, _) => a >= 100000 }
    assert(vsBatch1.nonEmpty, "no dup_of from batch 1 — the index did not grow")
    val both = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 15 === 0 && size(split(col("text"), " ")) >= 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hits = vsBatch1.map { case (b, a, _) => (b - 200000, a - 100000) }.toSet
    val found = both.count(d => hits.contains((d, d)))
    assert(found.toDouble / both.size >= 0.8,
      s"batch1-twin recall ${found.toDouble / both.size} ($found/${both.size})")
    // and it still finds base near-dups too
    assert(out.exists { case (_, a, _) => a < 100000 })
  }

  test("keep-canonical summary is consistent with the planted duplicates") {
    val r = Dedup.queries("dedup_keep_canonical")(spark, dir).head()
    val (docs, kept, dropped) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 === 0).count()
    assert(docs == n + planted)
    assert(kept + dropped == docs)
    // every planted {d, d+100000} cluster drops exactly its copy (plus any
    // incidental near-dups the corpus happens to contain)
    assert(dropped >= planted, s"dropped=$dropped planted=$planted")
  }

  test("IVF nprobe=2 recall vs brute force is at least nprobe=1's") {
    def top(name: String): Map[Long, Set[Long]] =
      Similarity.queries(name)(spark, dir).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = top("sim_topk_bruteforce")
    def recall(m: Map[Long, Set[Long]]): Double =
      exact.map { case (q, t) => m.getOrElse(q, Set.empty).count(t).toDouble / t.size }
        .sum / exact.size
    assert(recall(top("sim_ivf_nprobe2")) >= recall(top("sim_ivf_ann")) - 1e-9)
  }

  test("multi-probe LSH recall vs brute force is at least single-probe's") {
    def top(name: String): Map[Long, Set[Long]] =
      Similarity.queries(name)(spark, dir).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = top("sim_topk_bruteforce")
    def recall(m: Map[Long, Set[Long]]): Double =
      exact.map { case (q, t) => m.getOrElse(q, Set.empty).count(t).toDouble / t.size }
        .sum / exact.size
    // the multi-probe candidate set is a superset (exact bucket + all
    // Hamming-1 buckets), so its top-3 can only rank better or equal —
    // EXCEPT when an added candidate TIES a true neighbor's 6-decimal
    // rounded cosine and wins the nid tie-break, displacing it from the
    // top-3; tolerate exactly one such displaced item across all queries
    // (1 item = 1/3 of one query's recall term, averaged over queries)
    val tieTolerance = 1.0 / (3 * exact.size)
    assert(recall(top("sim_lsh_multiprobe"))
      >= recall(top("sim_lsh_ann")) - tieTolerance - 1e-9)
  }

  test("int8 quantize-then-rerank: full result shape, high recall vs brute force") {
    def top(name: String): Map[Long, Set[Long]] =
      Similarity.queries(name)(spark, dir).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = top("sim_topk_bruteforce")
    val q8 = top("sim_q8_rerank")
    assert(q8.keySet == exact.keySet, "every query must return candidates")
    assert(q8.values.forall(_.size == 3))
    // int8 symmetric quantization barely perturbs cosine ordering, and the
    // exact rerank fixes any inversion INSIDE the top-8 pool — only a true
    // neighbor pushed out of the approx top-8 can be lost
    val recall = exact.map { case (q, t) => q8(q).count(t).toDouble / t.size }
      .sum / exact.size
    assert(recall >= 0.75, s"recall $recall")
  }

  test("PQ-ADC: full result shape, useful recall vs brute force") {
    def top(name: String): Map[Long, Set[Long]] =
      Similarity.queries(name)(spark, dir).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = top("sim_topk_bruteforce")
    val pq = top("sim_pq_adc")
    assert(pq.keySet == exact.keySet, "every query must return candidates")
    assert(pq.values.forall(_.size == 3))
    // 4×16 product codes are a far coarser sketch than per-vector int8 —
    // the bar is "the index is informative", not q8's 0.75: mean recall@3
    // must beat the ~3/corpus floor random top-8 pools would give
    val recall = exact.map { case (q, t) => pq(q).count(t).toDouble / t.size }
      .sum / exact.size
    info(f"recall@3 vs brute force: $recall%.3f")
    assert(recall >= 0.25, s"recall $recall")
  }

  test("vocab top-k: frequency-ordered, fractions consistent with direct counts") {
    val out = TextOps.queries("text_vocab_topk")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // the synthetic corpus has a small closed vocabulary — the limit caps
    // at 50 but must not pad
    assert(out.nonEmpty && out.length <= 50)
    val ns = out.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "not frequency-descending")
    // cross-check the top word and its fraction against a direct count
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
    val total = words.count()
    val (topWord, topN, topFrac) = out.head
    assert(words.filter(col("w") === topWord).count() == topN)
    assert(math.abs(topFrac - math.rint(topN.toDouble / total * 1e6) / 1e6) < 1e-9)
  }

  test("BM25 top-10: descending scores, deterministic ties, hits contain a query term") {
    val rows = TextOps.queries("text_bm25_topk")(spark, dir).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "not descending")
    // tie-break: equal rounded scores must come out in doc_id order
    rows.sliding(2).foreach { case Array(a, b) =>
      if (a.getDouble(1) == b.getDouble(1)) assert(a.getLong(0) < b.getLong(0))
    }
    // every hit actually contains at least one of the query terms
    val ids = rows.map(_.getLong(0)).toSet
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val terms = Seq("hash", "join", "vector", "stream")
    ids.foreach { id =>
      val words = texts(id).split(" ").toSet
      assert(terms.exists(words), s"doc $id has no query term")
    }
  }

  test("multi-query BM25: 3 queries in one pass, q0 ranking agrees with the single-query path") {
    val multi = TextOps.queries("text_bm25_multi")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // 3 queries, each with ranks 1..8 and distinct docs
    assert(multi.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    multi.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 8), s"q$q ranks")
      assert(rs.map(_._3).distinct.length == 8, s"q$q docs distinct")
    }
    // q0 uses the single-query terms: the posting-join ranking must agree
    // with the generated-column ranking (both k1=1.2 b=0.75; ties at the
    // two paths' different rounding granularities may swap adjacent rows,
    // so assert strong overlap plus an identical leader)
    val single = TextOps.queries("text_bm25_topk")(spark, dir).collect()
      .map(_.getLong(0)).take(8)
    val q0 = multi.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    assert(q0.head == single.head, "top-1 must agree between formulations")
    assert(q0.toSet.intersect(single.toSet).size >= 6,
      s"rankings diverged: multi=${q0.toSeq} single=${single.toSeq}")
  }

  test("exact substring dedup removes the planted span from quote AND source") {
    val out = Dedup.queries("dedup_exact_substring")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(3))).toMap
    val sources = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 6 === 0 &&
        size(split(col("text"), " ")) >= 40)
      .select("doc_id").collect().map(_.getLong(0))
    assert(sources.nonEmpty)
    sources.foreach { id =>
      // the quote-doc loses the copied 30-word span, keeps its 10-word
      // reshuffled prefix (boundary 15-grams are unique by construction)
      val (qw, qr) = out(id + 200000)
      assert(qw == 40 && qr >= 30, s"quote of $id: $qw words, $qr removed")
      // the SOURCE loses the same span — removal hits every occurrence
      assert(out(id)._2 >= 30, s"source $id removed ${out(id)._2}")
    }
    // most of the corpus has no ≥15-word repeated span and is untouched
    val untouched = out.values.count(_._2 == 0)
    assert(untouched >= out.size / 2, s"only $untouched/${out.size} untouched")
  }

  test("bloom decontamination output is bit-identical to the exact operator") {
    // the bloom prefilter may pass false positives, but the exact
    // verification join removes them and the prefilter never drops a true
    // member — so the two plans must produce the same rows
    def rows(q: String) = TextOps.queries(q)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = rows("text_decontaminate")
    val bloom = rows("text_decontaminate_bloom")
    assert(exact.nonEmpty)
    assert(bloom == exact)
  }

  test("line dedup removes exactly the planted boilerplate lines") {
    val out = TextOps.queries("text_line_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length).toMap
    assert(out.keySet == words.keySet)
    var extraDocs = 0
    out.foreach { case (id, (nLines, nRemoved)) =>
      val planted = (if (id % 3 == 0) 1 else 0) + (if (id % 4 == 0) 1 else 0)
      assert(nLines == (words(id) + 9) / 10 + planted, s"doc $id line count")
      // every planted boilerplate line is removed; docs the DRIVER planted
      // as duplicate copies (the dedup fixtures) legitimately lose their
      // shared content chunks too, so > is allowed but bounded below
      assert(nRemoved >= planted, s"doc $id removed $nRemoved < $planted")
      if (nRemoved > planted) extraDocs += 1
    }
    assert(extraDocs > 0, "the dedup-fixture copies must share chunks")
    assert(extraDocs <= out.size / 2,
      s"$extraDocs/${out.size} docs lost non-planted lines — threshold broken")
  }

  test("BPE pad/gap encoding: literal replace is token-aligned and chains") {
    // the contract both engines' literal `replace` must satisfy for the
    // rewrite to BE greedy token-aligned BPE (java.lang.String.replace,
    // Spark's UTF8String.replace, and DuckDB's replace share it)
    def merge(sp: String, a: String, b: String): String =
      sp.replace(s" $a  $b ", s" ${a + b} ")
    def enc(toks: String*): String = toks.mkString(" ", "  ", " ")
    // adjacency chains: both (a,b) occurrences merge
    assert(merge(enc("a", "b", "a", "b"), "a", "b") == enc("ab", "ab"))
    // greedy left-to-right on overlap
    assert(merge(enc("a", "a", "a"), "a", "a") == enc("aa", "a"))
    // token alignment: pair (a, b) must NOT match the suffix of "xa" —
    // the single-space join this encoding replaced DID mis-merge here
    assert(merge(enc("xa", "b"), "a", "b") == enc("xa", "b"))
    assert("xa b".replace("a b", "ab") == "xab", // the old failure mode
      "single-space join suffix-matches; the pad/gap encoding exists because of this")
  }

  test("BPE training: 6 well-formed merges with non-increasing counts") {
    val out = TextOps.queries("text_bpe_train")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (1 to 6))
    out.foreach { case (_, pair, merged, cnt) =>
      // a merge is two adjacent units glued together
      assert(pair.count(_ == ' ') == 1, s"pair '$pair' must have one space")
      assert(merged == pair.replace(" ", ""))
      assert(cnt > 0)
    }
    // merging the top pair can only consume occurrences or create pairs
    // bounded by the merged count, so the winning count never increases
    val cnts = out.map(_._4)
    assert(cnts.zip(cnts.tail).forall { case (a, b) => b <= a },
      s"counts must be non-increasing: ${cnts.toSeq}")
    // later merges may build on earlier ones (that's the point of BPE) —
    // at minimum the 6 winning pairs are distinct
    assert(out.map(_._2).distinct.length == 6)
  }

  test("BPE tokenize: every merge compresses, no doc crosses a word boundary") {
    val out = TextOps.queries("text_bpe_tokens")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // baseline = char-level token count (chars + word separators): the
    // learned merges must strictly compress the corpus overall, and no
    // doc may ever GAIN tokens (replace only shrinks)
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        (length(translate(col("text"), " ", "")) +
          size(split(col("text"), " ")) - 1).cast("long").as("chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == base.keySet)
    out.foreach { case (id, n) =>
      assert(n > 0 && n <= base(id), s"doc $id: $n tokens vs ${base(id)} chars")
    }
    assert(out.values.sum < base.values.sum,
      "the merges must compress the corpus overall")
  }

  test("fused BPE kernel output is bit-identical to the chained-replace path") {
    def rows(q: String) = TextOps.queries(q)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val chained = rows("text_bpe_tokens")
    val fused = rows("text_bpe_tokens_fused")
    assert(chained.nonEmpty)
    assert(fused == chained)
  }

  test("contamination score: zeros included, bench sources score near 1") {
    val out = TextOps.queries("text_contamination_score")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // every eligible doc reports, including uncontaminated ones
    val eligible = spark.read.parquet(s"$dir/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 8).count()
    assert(out.length == eligible)
    assert(out.forall { case (_, n, sh, c) => sh <= n && c >= 0.0 && c <= 1.0 })
    // the benchmark was built from every 10th doc's suffix: those docs'
    // own grams are nearly all in the bench set
    val benchDocs = out.filter(t => t._1 % 10 == 0 && t._2 >= 12)
    assert(benchDocs.nonEmpty)
    benchDocs.foreach { case (id, _, _, c) =>
      assert(c > 0.5, s"bench-source doc $id scores $c")
    }
    // and the boolean drop query agrees with the nonzero rows
    val dropped = TextOps.queries("text_decontaminate")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(out.filter(_._3 > 0).map(_._1).toSet == dropped)
  }

  test("sliding chunks: full coverage, correct overlap, truncated tail") {
    val out = TextOps.queries("text_chunk_sliding")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == lens.keySet, "every doc chunks")
    byDoc.foreach { case (id, cs) =>
      val n = lens(id)
      // one chunk per stride start below n
      assert(cs.length == ((n - 1) / 40 + 1), s"doc $id: ${cs.length} chunks for $n tokens")
      assert(cs.map(_._2).sorted.sameElements(cs.indices.map(_.toLong)), "dense ids")
      // every chunk is full-width except possibly the trailing ones
      cs.sortBy(_._2).foreach { case (_, cid, toks) =>
        val expected = math.min(50L, n - cid * 40)
        assert(toks == expected, s"doc $id chunk $cid: $toks vs $expected")
      }
    }
  }

  test("ngram perplexity: the target LM finds its own sources more probable") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextOps.queries("text_ngram_perplexity")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.forall(_._2 > 0), "every doc has bigrams")
    assert(out.forall { case (_, _, p) => p > 1.0 && !p.isInfinite },
      "perplexity must be finite and > 1")
    // the LM is trained on the target slice's own counts, so target docs
    // must look more probable (lower perplexity) on average — the same
    // in-sample direction the DSIR spec pins
    val target = Set("src0", "src1", "src2", "src3")
    val (t, r) = out.partition { case (id, _, _) => target(docs(id)) }
    def meanPpl(xs: Array[(Long, Long, Double)]) = xs.map(_._3).sum / xs.length
    assert(t.nonEmpty && r.nonEmpty)
    assert(meanPpl(t) < meanPpl(r),
      s"target mean ppl ${meanPpl(t)} must be below non-target ${meanPpl(r)}")
  }

  test("DSIR importance: target-source docs outscore the rest on average") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextOps.queries("text_dsir_importance")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == docs.size)
    assert(out.forall(_._2 > 0), "every doc has bigrams")
    assert(out.exists(_._3 != 0L), "weights must not be degenerate")
    val target = Set("src0", "src1", "src2", "src3")
    // per-gram mean log-ratio (s9/n_grams): the weights are ESTIMATED from
    // the target's own counts, so target docs must score higher on average
    // — the in-sample direction any importance-weighting scheme shows
    val (t, r) = out.partition { case (id, _, _) => target(docs(id)) }
    def mean(xs: Array[(Long, Long, Long)]) =
      xs.map { case (_, n, s) => s.toDouble / n }.sum / xs.length
    assert(t.nonEmpty && r.nonEmpty)
    assert(mean(t) > mean(r),
      s"target mean ${mean(t)} must exceed non-target mean ${mean(r)}")
  }

  test("approx length-outlier trim honors the log-linear sketch's value-error bound") {
    val approx = TextOps.queries("text_length_outliers_approx")(spark, dir).head()
    val lens = graft.engine.Tables(spark, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long")).collect()
      .map(_.getLong(0)).sorted
    val n = lens.length.toLong
    assert(approx.getLong(0) == n, "docs count must be exact")
    assert(approx.getLong(1) + approx.getLong(2) + approx.getLong(3) == n,
      "trim buckets must partition the corpus")
    // the sketch's guarantee: each boundary is the lower bound of the
    // log-linear bucket (32 subdivisions per octave) containing the true
    // rank-ceil(q·n) value, so lo <= v* <= lo·(1 + 1/32); re-derive the
    // boundaries from the sketch algebra and check both directions
    def bucketOf(v: Long): Long = {
      val b = 63 - java.lang.Long.numberOfLeadingZeros(v)
      b * 32 + ((v - (1L << b)) * 32) / (1L << b)
    }
    def lob(bk: Long): Long =
      (1L << (bk / 32)) + (bk % 32) * (1L << (bk / 32)) / 32
    def sketchQ(r: Long): Long = {
      val hist = lens.groupBy(bucketOf).toSeq.sortBy(_._1)
      var cum = 0L
      hist.collectFirst {
        case (bk, vs) if { cum += vs.length; cum >= r } => lob(bk)
      }.get
    }
    val (lo, hi) = (sketchQ((n + 19) / 20), sketchQ((19 * n + 19) / 20))
    val vLo = lens(((n + 19) / 20 - 1).toInt)   // true rank-ceil(0.05n) value
    val vHi = lens(((19 * n + 19) / 20 - 1).toInt)
    assert(lo <= vLo && vLo <= lo + lo / 32 + 1, s"lo=$lo vs exact p05=$vLo")
    assert(hi <= vHi && vHi <= hi + hi / 32 + 1, s"hi=$hi vs exact p95=$vHi")
    // and the query's counts are exactly the trim by those boundaries
    assert(approx.getLong(1) == lens.count(v => v >= lo && v <= hi))
    assert(approx.getLong(2) == lens.count(_ < lo))
    assert(approx.getLong(3) == lens.count(_ > hi))
  }

  test("k-means IVF: every query gets 3 ranked neighbors, nonzero recall vs brute force") {
    def top(name: String): Map[Long, Set[Long]] =
      Similarity.queries(name)(spark, dir).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = top("sim_topk_bruteforce")
    val km = top("sim_ivf_kmeans")
    assert(km.keySet == exact.keySet, "every query must land in a non-empty block")
    assert(km.values.forall(_.size == 3))
    // nprobe=1 over 8 learned cells: a positive floor, not parity — the
    // recall/cost knob is probing more cells, same as sim_ivf_nprobe2
    val recall = exact.map { case (q, t) => km(q).count(t).toDouble / t.size }
      .sum / exact.size
    assert(recall > 0.2, s"recall $recall")
  }

  test("temperature mixture: q sums to 1, flattens toward uniform, epochs >= 1 for rare langs") {
    val out = Curation.queries("mix_temperature")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-3)
    val u = 1.0 / out.length
    out.foreach { case (lang, _, p, q, epochs) =>
      // α=0.5 pulls every share toward uniform but never across it
      if (p > u) assert(q <= p + 1e-9 && q >= u - 1e-9, s"$lang p=$p q=$q")
      if (p < u) assert(q >= p - 1e-9 && q <= u + 1e-9, s"$lang p=$p q=$q")
      assert(math.abs(epochs - q / p) < 1e-3)
      if (p < u) assert(epochs >= 1.0 - 1e-9, s"rare $lang must be upweighted")
    }
  }

  test("doremi reweight: mass conserved, clamp respected, updates point at hard domains") {
    val rows = Curation.queries("mix_doremi")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val k = graft.engine.Tables(spark, dir, "documents")
      .select("source").distinct().count()
    assert(rows.length == k, "one row per domain")
    // shares are floor-divided parts of 1e6: each sum lands within k of it
    assert(math.abs(rows.map(_._3).sum - 1000000L) <= k, "p6 mass")
    assert(math.abs(rows.map(_._6).sum - 1000000L) <= k, "q6 mass")
    rows.foreach { case (src, docs, p6, excess, mult, q6, epochs) =>
      assert(docs > 0 && p6 > 0 && q6 > 0, s"$src degenerate")
      assert(mult >= 5000 && mult <= 20000, s"$src multiplier $mult outside clamp")
      // the update points the right way: harder-than-average domains
      // (positive excess) upweight, easier ones downweight. The floor
      // division mult = 10000 + ((excess+10000) div 4) - 2500 maps
      // excess ∈ {1,2,3} to exactly 10000, so the strict upweight is
      // only provable from excess >= 4 — asserting it for smaller
      // excess was a latent flake waiting on a corpus shift (ADVICE r10)
      if (excess > 0) assert(mult >= 10000, s"$src hard domain not upweighted")
      if (excess >= 4) assert(mult > 10000, s"$src hard domain not upweighted")
      if (excess < 0) assert(mult < 10000, s"$src easy domain not downweighted")
      assert(math.abs(epochs - q6.toDouble / p6) < 5e-4, s"$src epochs ratio")
    }
    // excess is zero-mean-ish by construction (deviations from the
    // corpus mean): both directions must appear on a real corpus
    assert(rows.exists(_._4 > 0) && rows.exists(_._4 < 0),
      "no hardness spread — the signal is degenerate")
  }

  test("mixture rebalance rates scale every language to the rarest") {
    val out = Curation.queries("mix_rebalance")(spark, dir).collect()
    val minN = out.map(_.getLong(1)).min
    out.foreach { r =>
      assert(r.getDouble(2) <= 1.0 && r.getDouble(2) > 0.0)
      assert(math.abs(r.getDouble(2) - minN.toDouble / r.getLong(1)) < 1e-3)
    }
  }

  test("warm pagerank refresh: every node + arrival ranked once, floor respected") {
    val out = Similarity.queries("sim_pagerank_incr")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val e = graft.engine.Tables(spark, dir, "embeddings")
    val n = e.count()
    val narr = e.filter(col("vec_id") % 5 === 0).count()
    assert(out.length == n + narr, s"one rank row per node: ${out.length} vs ${n + narr}")
    assert(out.map(_._1).distinct.length == out.length, "duplicate node ranks")
    // arrivals are first-class graph nodes in the refreshed artifact
    assert(out.count(_._1 >= 100000L) == narr)
    // every rank carries at least the teleport floor under the NEW count
    val floor = (15L * 1000000000000L) / (100L * (n + narr))
    assert(out.forall(_._2 >= floor), "rank below the teleport floor")
    // floor-leak keeps total mass bounded: seed <= S + arrivals' uniform
    // share, and each iteration contracts the non-teleport mass
    assert(out.map(_._2).sum <= (1000000000000L * 12) / 10, "mass blow-up")
    // the warm result must DIFFER from the base build (it ranks a larger
    // graph) while preserving the base floor structure
    val base = Similarity.queries("sim_graph_pagerank")(spark, dir).collect()
    assert(base.length.toLong == n)
  }

  test("kNN graph: consecutive ranks, no self-edges, most nodes get neighbors") {
    val out = Similarity.queries("sim_knn_graph")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.forall { case (qid, _, nid) => qid != nid })
    val byQ = out.groupBy(_._1)
    byQ.foreach { case (qid, es) =>
      assert(es.map(_._2).sorted.sameElements(1 to es.length), s"node $qid ranks")
      assert(es.map(_._3).distinct.length == es.length, s"node $qid dup neighbor")
    }
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    // a node misses out only when alone in its LSH bucket — rare at
    // TargetBucketPop=64 expected occupancy
    assert(byQ.size >= n * 8 / 10, s"coverage ${byQ.size}/$n")
  }

  test("bucket capping fires on a single-cluster corpus: sub-buckets hold the target pop") {
    // degenerate worst case for LSH: EVERY vector identical -> one bucket
    // holds the whole corpus; without capping the self-join is n^2. The
    // cap must split it into ceil(n/64) sub-buckets of exactly the target
    // population, and the kNN queries must still serve every node.
    val tmp = java.nio.file.Files.createTempDirectory("knncap").toString
    val n = 256
    import spark.implicits._
    val vec = Array.fill(64)(0.5f)
    (0 until n).map(i => (i.toLong, vec, 0)).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val pops = Similarity.cappedKnnBuckets(spark, tmp)
      .select(col("bucket"), (col("vec_id") % col("nsub")).as("sub"))
      .groupBy("bucket", "sub").count().collect()
    assert(pops.length == 4, s"expected ceil(256/64)=4 sub-buckets, got ${pops.length}")
    assert(pops.forall(_.getLong(2) == 64L), "every sub-bucket at the target pop")
    val edges = Similarity.queries("sim_knn_graph")(spark, tmp).collect()
    assert(edges.map(_.getLong(0)).distinct.length == n,
      "capping must not orphan any node")
  }

  test("multi-probe kNN graph recovers lone-bucket nodes the single-probe graph orphans") {
    // 69 identical vectors (one bucket) + ONE vector constructed to land
    // exactly 1 plane-bit away: u = -0.5 uniform puts every plane dot
    // positive (bits all 1, thresholds pin to u's own projections); the
    // outlier perturbs dim 1 by -0.5, and plane weights w(p, 1) =
    // (-8, 26, -37, -3) make that lower ONLY plane 1's dot (w > 0) while
    // raising the rest — so exactly bit 1 flips. Single-probe: the
    // outlier is alone in its bucket -> zero edges. Multi-probe: its
    // 1-bit flip reaches the cluster bucket and it gains neighbors.
    val tmp = java.nio.file.Files.createTempDirectory("knnmp").toString
    import spark.implicits._
    val u = Array.fill(64)(-0.5f)
    val outlier = u.clone(); outlier(1) = -1.0f
    val rows = (0L until 69L).map(i => (i, u, 0)) :+ ((69L, outlier, 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val single = Similarity.queries("sim_knn_graph")(spark, tmp).collect()
      .map(_.getLong(0)).toSet
    val mp = Similarity.queries("sim_knn_graph_mp")(spark, tmp).collect()
      .map(_.getLong(0)).toSet
    assert(!single.contains(69L), "fixture broken: outlier not alone in its bucket")
    assert(single.size == 69, s"cluster nodes must all have edges, got ${single.size}")
    assert(mp.contains(69L), "multi-probe must recover the lone node")
    assert(single.subsetOf(mp) && mp.size == 70,
      s"multi-probe coverage ${mp.size}/70 must dominate single-probe ${single.size}/70")
    // on the real corpus the candidate superset can only widen coverage
    val covS = Similarity.queries("sim_knn_graph")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val covM = Similarity.queries("sim_knn_graph_mp")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(covS.subsetOf(covM))
  }

  test("kNN clustering: labels are cluster minima and every kNN edge is intra-cluster") {
    val labels = Similarity.queries("sim_cluster_knn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    labels.groupBy(_._2).foreach { case (lbl, ns) =>
      assert(ns.keys.min == lbl, s"cluster $lbl is not rooted at its minimum")
    }
    assert(labels.values.toSet.size > 1, "everything collapsed into one cluster")
    val edges = Similarity.queries("sim_knn_graph")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    edges.foreach { case (a, b) => assert(labels(a) == labels(b), s"edge $a-$b split") }
  }

  test("cluster labels are an index artifact: repeat invocations run zero CC rounds") {
    // prime the memo (earlier tests in this suite may already have)
    Similarity.queries("sim_cluster_knn")(spark, dir).collect()
    val builds = Similarity.labelBuildCounts.getOrElse((spark, dir), 0)
    assert(builds == 1, s"one live session must build the labels exactly once, saw $builds")
    // repeat invocations — the clustering query AND its balancing consumer
    // — must probe the memoized artifact: the build thunk (and with it the
    // whole edge build + CC loop) never re-evaluates, and the probing
    // invocation launches only result-sized jobs, nothing CC-loop-shaped
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val again = Similarity.queries("sim_cluster_knn")(spark, dir).collect()
      assert(again.nonEmpty)
      Thread.sleep(500) // listener bus is async
    } finally spark.sparkContext.removeSparkListener(listener)
    // the CC loop alone costs ≥2 jobs per round (~5 rounds at this SF)
    // plus the edge build; re-sorting + collecting the checkpointed
    // labels is ≤4 (AQE sub-jobs included). The ceiling proves the loop
    // didn't run; the counter below proves the thunk never evaluated.
    assert(jobs.get() <= 4,
      s"a probing invocation should not run CC-loop-sized job counts, saw ${jobs.get()}")
    // the balancing consumer must also probe, not rebuild
    assert(Curation.queries("curate_cluster_balanced")(spark, dir).collect().nonEmpty)
    assert(Similarity.labelBuildCounts((spark, dir)) == builds,
      "a repeat invocation re-ran the label build")
  }

  test("incremental label maintenance: zero CC rounds, base rows preserved, NN-consistent routing") {
    // warm the durable artifacts (labels + buckets) and snapshot the
    // CC build counter — the maintenance invocation must never bump it
    val base = Similarity.queries("sim_cluster_knn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ccBuilds = Similarity.labelBuildCounts.getOrElse((spark, dir), 0)
    val merged = Similarity.queries("sim_cluster_labels_incr")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // zero CC rounds AND zero base-rehash: the label build thunk (the
    // only place the edge build + star loop lives) never re-evaluated —
    // arrivals probe the stored capped buckets + labels only
    assert(Similarity.labelBuildCounts.getOrElse((spark, dir), 0) == ccBuilds,
      "incremental maintenance re-ran the CC label build")
    // the merge appends, never mutates: base labels pass through
    // row-identical; routed arrivals land above the id offset in
    // existing clusters; unrouted arrivals are simply absent
    val (batchRows, baseRows) = merged.partition(_._1 >= 100000)
    assert(baseRows.toMap == base, "maintenance mutated base labels")
    assert(batchRows.nonEmpty, "no arrivals were routed")
    val validClusters = base.values.toSet
    batchRows.foreach { case (n, c) =>
      assert(validClusters.contains(c), s"arrival $n routed to unknown cluster $c") }
    // NN-routing consistency on THIS corpus: every arrival is a ×1.01
    // rescale of an existing vector — cosine is scale-invariant, so
    // whenever the arrival's probe set contains its own original (same
    // centered bucket, matching sub-bucket), the top-1 is cos = 1.0 at
    // the original and the arrival MUST inherit the original's cluster.
    // Probe membership varies per arrival (thresholds and nsub shift),
    // so assert over the routed rows whose original is labeled: the
    // overwhelming majority route home, and at least one does (the
    // planted-signal sanity floor).
    val home = batchRows.flatMap { case (n, c) =>
      base.get(n - 100000).map(orig => c == orig) }
    assert(home.nonEmpty && home.count(identity) * 10 >= home.size * 8,
      s"only ${home.count(identity)}/${home.size} rescaled arrivals routed " +
        "to their original's cluster — NN routing is broken")
  }

  test("dedup method eval: exact arithmetic, and recall floors guard every pair-search knob") {
    val rows = Dedup.queries("dedup_method_eval")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set(
      "minhash_lsh", "ngram_jaccard", "simhash32", "simhash64", "winnowing"))
    val truthN = rows.values.head._3
    rows.foreach { case (m, (pairs, hits, tn, bp)) =>
      assert(tn == truthN, s"$m truth_n")
      assert(hits >= 0 && hits <= math.min(pairs, truthN), s"$m hits $hits")
      assert(bp == hits * 10000 / truthN, s"$m recall_bp")
    }
    // ABSOLUTE planted-recall floors at THIS sf (measured: minhash 10000,
    // ngram 10000, winnowing 9820, simhash32 9161, simhash64 8622),
    // pinned at ~90% of measured — a band-count, shingle-size, hamming-
    // gate or fingerprint-window regression fails here instead of
    // passing silently. sf-specific; re-measure if testdata changes.
    val floors = Map(
      "minhash_lsh" -> 9000L, "ngram_jaccard" -> 9000L, "winnowing" -> 8800L,
      "simhash32" -> 8200L, "simhash64" -> 7700L)
    floors.foreach { case (m, floor) =>
      assert(rows(m)._4 >= floor, s"$m recall ${rows(m)._4} bp < floor $floor") }
    // the volume column is the honest precision-side cost: the loose
    // hamming gate (simhash32, ham ≤ 2 of 32 bits) must surface MORE
    // pairs than the banded-verified methods — if it ever reports fewer,
    // the gate (or the volume accounting) broke
    assert(rows("simhash32")._1 > rows("minhash_lsh")._1,
      "simhash32's loose gate should out-volume the verified methods")
  }

  test("centroid drift: one-sided labels verdict stale — the canary cannot be blind to new labels") {
    // a label present only in the CURRENT corpus (new content arrived
    // under a label the stored index has never seen) or only in the
    // STORED set (the label's last rows left) must verdict 'stale':
    // an inner join would drop exactly the row that demands a rebuild,
    // and the IVF routing table would permanently lack the new centroid
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val stored = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("label", "carr")
    val current = Seq((0L, Seq(1.0, 0.0)), (2L, Seq(0.5, 0.5)))
      .toDF("label", "carr")
    val v = Similarity.centroidDrift(stored, current).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getString(2))).toMap
    assert(v.keySet == Set(0L, 1L, 2L), "full outer must keep both sides")
    assert(v(0L) == ((Some(0L), "fresh")), s"matched identical label: ${v(0L)}")
    assert(v(1L)._2 == "stale" && v(1L)._1.isEmpty, "stored-only label must be stale")
    assert(v(2L)._2 == "stale" && v(2L)._1.isEmpty, "current-only label must be stale")
  }

  test("incremental edge maintenance: base edges preserved, arrival edges well-formed") {
    val base = Similarity.queries("sim_graph_pagerank")(spark, dir) // warms edges artifact
    assert(base.collect().nonEmpty)
    val baseEdges = Similarity.queries("sim_knn_graph")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val merged = Similarity.queries("sim_graph_edges_incr")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (arr, kept) = merged.partition(_._1 >= 100000)
    // base edge set passes through unchanged (deg is per-src so existing
    // rows cannot be touched by appended sources)
    assert(kept.map(t => (t._1, t._2)).toSet == baseEdges,
      "maintenance mutated the base edge set")
    assert(arr.nonEmpty, "no arrival edges appended")
    val nodes = graft.engine.Tables(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    arr.groupBy(_._1).foreach { case (src, es) =>
      assert(es.length <= 3, s"arrival $src has ${es.length} edges (top-3 rule)")
      es.foreach { case (_, dst, deg) =>
        assert(deg == es.length, s"arrival $src deg $deg != ${es.length}")
        assert(nodes.contains(dst), s"arrival $src edge to unknown node $dst")
      }
    }
  }

  test("cluster quality: clusters beat the noise baseline; the global exemplar's cluster is the zero point") {
    val rows = Similarity.queries("sim_cluster_quality")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (c, m, coh, bl, mg) =>
      assert(m >= 1, s"cluster $c empty after exemplar exclusion")
      assert(coh >= -1000000 && coh <= 1000000, s"cluster $c cohesion $coh")
      assert(bl >= -1000000 && bl <= 1000000, s"cluster $c baseline $bl")
      // margin and cohesion/baseline share the same +1e6 shift, so the
      // identity is exact, not ±1
      assert(mg == coh - bl, s"cluster $c margin $mg != $coh - $bl")
    }
    // the cluster CONTAINING the global exemplar measures itself against
    // its own exemplar: cohesion ≡ baseline, margin exactly 0 — the
    // metric's built-in zero point
    assert(rows.exists { case (_, _, coh, bl, mg) => mg == 0 && coh == bl },
      "no zero-point cluster — the global exemplar fell outside every cluster?")
    // the clustering is real: cohesion beats the noise baseline on
    // average (mean margin positive), not just on one lucky cluster
    assert(rows.map(_._5).sum > 0, "clusters do not beat the noise baseline")
  }

  test("gopher rules: bits are binary, verdict is their AND, and the battery discriminates") {
    val rows = TextOps.queries("text_gopher_rules")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)),
        r.getString(7)))
    val nDocs = graft.engine.Tables(spark, dir, "documents").count()
    assert(rows.length == nDocs, "one verdict row per document")
    rows.foreach { case (id, n, bits, verdict) =>
      assert(n > 0, s"doc $id word count")
      assert(bits.forall(b => b == 0L || b == 1L), s"doc $id non-binary bit")
      assert(verdict == (if (bits.sum == 5) "keep" else "drop"),
        s"doc $id verdict $verdict vs bits $bits")
    }
    // off-Spark recheck of the word-count rule on raw text
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length.toLong).toMap
    rows.foreach { case (id, n, bits, _) =>
      assert(n == words(id), s"doc $id word count $n != ${words(id)}")
      assert(bits.head == (if (n >= 50 && n <= 100000) 1L else 0L), s"doc $id r_len")
    }
    val verdicts = rows.map(_._4).toSet
    assert(verdicts == Set("keep", "drop"),
      s"battery must discriminate on this corpus, saw $verdicts")
  }

  test("kNN density agrees with the graph's neighbor sets; densities are valid cosine means") {
    val edges = Similarity.queries("sim_knn_graph")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val dens = Similarity.queries("sim_knn_density")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(dens.map(_._1).toSet == edges.keySet, "same covered node set")
    dens.foreach { case (qid, k, d) =>
      assert(k == edges(qid).length, s"node $qid k")
      assert(d >= -1.000001 && d <= 1.000001, s"node $qid density $d")
    }
  }

  test("CMS heavy hitters: one-sided error, zero false negatives, truthful flags") {
    import org.apache.spark.sql.functions._
    val out = TextOps.queries("text_heavy_hitters_cms")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // independent truth: per-bigram document frequency and the 8% doc
    // threshold, computed with plain aggregation (no hashing, no sketch)
    val docs = graft.engine.Tables(spark, dir, "documents")
    val truth = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(w) - 2),
             i -> concat_ws(' ', w[i], w[i + 1]))""")).as("gram"))
      .distinct()
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = math.max(2L, docs.count() * 8 / 100)
    out.foreach { case (gram, df, est, flag) =>
      assert(truth(gram) == df, s"$gram exact df")
      assert(est >= df, s"$gram: CMS must never underestimate ($est < $df)")
      assert(est >= t, s"$gram emitted below the sketch threshold")
      assert(flag == (if (df >= t) 1L else 0L), s"$gram truth flag")
    }
    // CMS's one-sided error makes false NEGATIVES impossible: every true
    // heavy hitter must be in the sketch-flagged output
    val trueHH = truth.filter(_._2 >= t).keySet
    val emitted = out.map(_._1).toSet
    assert(trueHH.subsetOf(emitted),
      s"missed true heavy hitters: ${trueHH -- emitted}")
    assert(trueHH.nonEmpty, "degenerate fixture: no true heavy hitters")
  }

  test("incremental CMS heavy hitters: planted boilerplate surfaces post-merge, one-sided error holds") {
    import org.apache.spark.sql.functions._
    val out = TextOps.queries("text_heavy_hitters_incr")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (g, df, est, _) =>
      assert(est >= df, s"$g: merged CMS must never underestimate") }
    // the planted batch boilerplate is a NEW heavy hitter that exists
    // only after the stored base sketch absorbs the batch's cells —
    // cell addition is EXACT merging (CMS(base)+CMS(batch) ==
    // CMS(base ∪ batch)), so df is the precise batch doc count
    val docs = graft.engine.Tables(spark, dir, "documents")
    val nBatch = docs.filter(col("doc_id") % 4 === 0).count()
    val t = math.max(2L, (docs.count() + nBatch) * 8 / 100)
    assert(nBatch >= t, "degenerate fixture: planted gram below threshold")
    val zz = out.find(_._1 == "zz0 zz1")
    assert(zz.nonEmpty, "planted boilerplate bigram missing from the report")
    assert(zz.get._2 == nBatch && zz.get._4 == 1L, s"zz0 zz1 row ${zz.get}")
    // and it is genuinely post-merge: the base-corpus report cannot
    // contain a gram no base document has
    val base = TextOps.queries("text_heavy_hitters_cms")(spark, dir)
      .collect().map(_.getString(0)).toSet
    assert(!base.contains("zz0 zz1"))
  }

  test("top-ngram profile: document-frequency ranked, deterministic boundary, honest counts") {
    val out = TextOps.queries("text_topk_ngrams")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.length == 20)
    out.sliding(2).foreach {
      case Array((g1, d1), (g2, d2)) =>
        assert(d1 > d2 || (d1 == d2 && g1 < g2),
          s"order broken at ($g1,$d1) -> ($g2,$d2)")
      case _ =>
    }
    assert(out.forall(_._1.split(" ").length == 5), "every gram is a 5-gram")
    // df is a DOCUMENT count: the top gram's df can't exceed the number of
    // docs containing it as a substring (word-aligned occurrences are a
    // subset of substring occurrences on space-joined text)
    val (topGram, topDf) = out.head
    val nDocs = graft.engine.Tables(spark, dir, "documents").count()
    val containing = graft.engine.Tables(spark, dir, "documents")
      .filter(col("text").contains(topGram)).count()
    assert(topDf <= containing && containing <= nDocs,
      s"top gram df=$topDf exceeds substring-containing doc count $containing")
    assert(topDf > 1, "a boilerplate profile with no recurring gram is vacuous")
  }

  test("source overlap: complete pair coverage, bounded estimates, exact match arithmetic") {
    val out = Dedup.queries("dedup_source_overlap")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val k = graft.engine.Tables(spark, dir, "documents")
      .select("source").distinct().count().toInt
    assert(out.length == k * (k - 1) / 2, s"expected all C($k,2) source pairs")
    out.foreach { case (a, b, m, j) =>
      assert(a < b, s"pair ($a,$b) not canonically ordered")
      assert(m >= 0 && m <= 16, s"($a,$b) matches=$m outside [0,16]")
      assert(math.abs(j - m / 16.0) < 1e-9, s"($a,$b) jaccard_est $j != $m/16")
    }
    // the synthetic sources draw from one shared vocabulary: at least one
    // pair must show nonzero estimated overlap, or the signature
    // construction is broken (e.g. per-source salt leaking into the hash)
    assert(out.exists(_._3 > 0), "every source pair estimated disjoint")
  }

  test("graph PageRank: floor-bounded, leak-only mass, in-degree-sensitive, and an index artifact") {
    val ranks = Similarity.queries("sim_graph_pagerank")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = graft.engine.Tables(spark, dir, "embeddings").count()
    assert(ranks.length == n, "every vector gets a rank")
    val S = 1000000000000L
    val base = 15L * S / (100L * n)
    // every node keeps at least the teleport floor; total mass only LEAKS
    // (floor rounding + sub-3 out-degrees), never grows
    assert(ranks.forall(_._2 >= base), "rank below the teleport floor")
    assert(ranks.map(_._2).sum <= S, "mass grew — the iteration is wrong")
    assert(ranks.map(_._2).distinct.length > 10, "rank distribution collapsed")
    // centrality is in-degree-sensitive: the most-chosen neighbor must
    // outrank the floor, and nodes nobody points at must sit exactly on it
    val edges = Similarity.queries("sim_knn_graph")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val rmap = ranks.toMap
    val indeg = edges.groupBy(_._2).view.mapValues(_.length).toMap
    val popular = indeg.maxBy(_._2)._1
    assert(rmap(popular) > base, s"max-in-degree node $popular sits on the floor")
    rmap.keys.filterNot(indeg.contains).foreach { lonely =>
      assert(rmap(lonely) == base, s"no-in-edge node $lonely must rank exactly base")
    }
    // index artifact: repeat invocations probe the memo, never rebuild
    val builds = Similarity.prBuildCounts.getOrElse((spark, dir), 0)
    assert(builds == 1, s"one live session must build the ranks exactly once, saw $builds")
    assert(Similarity.queries("sim_graph_pagerank")(spark, dir).collect().nonEmpty)
    assert(Similarity.prBuildCounts((spark, dir)) == builds,
      "a repeat invocation re-ran the PageRank build")
  }

  test("BPE fertility: agrees with the per-doc fused apply; at least one token per word") {
    val r = TextOps.queries("text_bpe_fertility")(spark, dir).collect()(0)
    val (words, toks, bp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val sumToks = TextOps.queries("text_bpe_tokens_fused")(spark, dir).collect()
      .map(_.getLong(1)).sum
    assert(toks == sumToks, "corpus token sum disagrees with the per-doc apply")
    assert(bp == toks * 10000 / words, "basis-point arithmetic broken")
    assert(toks >= words, "a word can never tokenize to zero tokens")
    val sumWords = graft.engine.Tables(spark, dir, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(_.getLong(0)).sum
    assert(words == sumWords, "word denominator disagrees with the corpus")
  }

  test("length buckets: power-of-2 ladder, exhaustive coverage, exact padding arithmetic") {
    val out = Curation.queries("curate_length_buckets")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val ladder = Set(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)
    assert(out.nonEmpty && out.forall(b => ladder.contains(b._1)))
    val nDocs = graft.engine.Tables(spark, dir, "documents").count()
    assert(out.map(_._2).sum == nDocs, "every doc lands in exactly one bucket")
    out.foreach { case (bucket, docs, toks, pad, bp) =>
      assert(pad == bucket * docs - toks && pad >= 0,
        s"bucket $bucket padding arithmetic broken")
      assert(bp == pad * 10000 / (bucket * docs), s"bucket $bucket basis points")
      // smallest-holding-bucket: every member is longer than the next
      // bucket down, so the bucket can never be less than half full
      assert(bucket == 16 || toks > bucket / 2 * docs,
        s"bucket $bucket holds docs that belong in a smaller bucket")
    }
    // over-4096 docs round UP to the next 4096 multiple (chunked-window
    // padding) — the original ELSE 4096 made pad NEGATIVE there. This
    // corpus has no such docs, so pin the formula on constructed lengths.
    import spark.implicits._
    val longDocs = Seq(4096L, 4097L, 8000L, 8192L, 8193L, 100000L).toDF("len")
      .selectExpr("len", """CASE WHEN len <= 16 THEN 16 WHEN len <= 32 THEN 32
            WHEN len <= 64 THEN 64 WHEN len <= 128 THEN 128
            WHEN len <= 256 THEN 256 WHEN len <= 512 THEN 512
            WHEN len <= 1024 THEN 1024 WHEN len <= 2048 THEN 2048
            WHEN len <= 4096 THEN 4096
            ELSE (len + 4095) - ((len + 4095) % 4096) END AS bucket""")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(longDocs.toSeq == Seq(4096L -> 4096L, 4097L -> 8192L, 8000L -> 8192L,
      8192L -> 8192L, 8193L -> 12288L, 100000L -> 102400L))
    longDocs.foreach { case (len, b) => assert(b >= len, s"negative pad at $len") }
  }

  test("seed expansion: non-seed top-50, positive scores, nothing beyond 3 hops of a seed") {
    val out = Similarity.queries("sim_seed_expand")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty && out.length <= 50)
    assert(out.forall(_._1 >= 8), "a seed leaked into its own expansion")
    assert(out.forall(_._2 > 0), "unreached nodes must be excluded")
    out.sliding(2).foreach {
      case Array((n1, s1), (n2, s2)) =>
        assert(s1 > s2 || (s1 == s2 && n1 < n2), "expansion order broken")
      case _ =>
    }
    // three diffusion rounds cannot score a node more than 3 edge-hops
    // from a seed — recompute reachability over the kNN edge list
    val adj = Similarity.queries("sim_knn_graph")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var reach = (0L until 8L).toSet
    for (_ <- 1 to 3) reach = reach ++ reach.flatMap(n => adj.getOrElse(n, Set.empty[Long]))
    assert(out.forall(o => reach.contains(o._1)),
      "a scored node is not 3-hop reachable from any seed")
  }

  test("cluster exemplars: one per cluster, a member of it, the (rank desc, node asc) argmax") {
    val ex = Similarity.queries("sim_cluster_exemplars")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val labels = Similarity.queries("sim_cluster_knn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ranks = Similarity.queries("sim_graph_pagerank")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val byCluster = labels.groupBy(_._2)
    assert(ex.length == byCluster.size, "exactly one exemplar per cluster")
    ex.foreach { case (c, e, rk) =>
      val members = byCluster(c).map(_._1)
      assert(members.contains(e), s"cluster $c exemplar $e is not a member")
      assert(rk == ranks(e), s"cluster $c reports a stale rank for $e")
      assert(members.map(n => (ranks(n), -n)).max == ((ranks(e), -e)),
        s"cluster $c exemplar $e is not the centrality argmax")
    }
  }

  test("hybrid RRF: fused ranking is consistent with its two source lists") {
    val out = TextOps.queries("text_hybrid_rrf")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.nonEmpty && out.length <= 10)
    // every fused row came from at least one list, scores non-increasing,
    // and each contribution is exactly round(1e9/(60+rank))
    assert(out.forall { case (_, _, rt, rv) => rt.nonEmpty || rv.nonEmpty })
    assert(out.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    out.foreach { case (doc, rrf9, rt, rv) =>
      def c(r: Option[Long]) = r.map(x => math.round(1e9 / (60 + x))).getOrElse(0L)
      assert(rrf9 == c(rt) + c(rv), s"doc $doc")
    }
    // a doc on BOTH lists must outrank a doc on one list at the same ranks
    val both = out.filter(r => r._3.nonEmpty && r._4.nonEmpty)
    val single = out.filter(r => r._3.isEmpty || r._4.isEmpty)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_._2).max > single.map(_._2).min)
  }

  test("multi-query hybrid RRF fuses >=3 queries in one pass, consistent with both source lists") {
    val out = TextOps.queries("text_hybrid_rrf_multi")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val qids = out.map(_._1).distinct.sorted.toSeq
    assert(qids.size >= 3, s"expected >=3 fused queries, got $qids")
    out.foreach { case (q, d, rrf9, rt, rv) =>
      def c(r: Option[Long]) = r.map(x => math.round(1e9 / (60 + x))).getOrElse(0L)
      assert(rt.nonEmpty || rv.nonEmpty, s"($q,$d) came from neither list")
      assert(rrf9 == c(rt) + c(rv), s"($q,$d) rrf9")
      assert(rt.forall(t => t >= 1 && t <= 8) && rv.forall(v => v >= 1 && v <= 8))
    }
    // two <=8 lists fuse to <=16 rows per query
    qids.foreach(q => assert(out.count(_._1 == q) <= 16, s"query $q list size"))
    // the lexical ranks are exactly text_bm25_multi's (the shared index path)
    val bm = TextOps.queries("text_bm25_multi")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1).toLong)).toMap
    out.foreach { case (q, d, _, rt, _) =>
      rt.foreach(t => assert(bm((q, d)) == t, s"($q,$d) lexical rank")) }
    assert(bm.keySet == out.filter(_._4.nonEmpty).map(t => (t._1, t._2)).toSet)
  }

  test("winnowing: doc 0's fingerprint count matches a direct replay of the algorithm") {
    val out = TextOps.queries("text_winnowing")(spark, dir).collect()
    assert(out.nonEmpty)
    val text = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val w = text.split(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val grams = (0 to w.length - 4).map(i => h(w.slice(i, i + 4).mkString(" ")))
    val fps = (0 to grams.length - 5).map { i =>
      // min hash in the window, ties -> rightmost (largest position)
      (i until i + 5).map(j => (grams(j), -j)).min._1
    }.distinct
    val r0 = out.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) == fps.length.toLong, s"doc0 n_fp ${r0.getLong(1)} vs ${fps.length}")
    assert(r0.getString(2) == fps.min)
    // reduction: fingerprints are a strict subset of the gram set
    assert(fps.length < grams.distinct.length)
  }

  test("winnowing boundary rule: short docs (fewer grams than the window) fingerprint once") {
    val tmp = java.nio.file.Files.createTempDirectory("winshort").toString
    import spark.implicits._
    Seq(
      (0L, "a b c"),                    // 3 tokens: below the gram size, no fp
      (1L, "a b c d"),                  // 4 tokens: 1 gram  -> 1 fp (min of all)
      (2L, "a b c d e f g"),            // 7 tokens: 4 grams -> 1 fp
      (3L, "a b c d e f g h"),          // 8 tokens: 5 grams -> exactly 1 full window
      (4L, "a b c d e f g h i j k l"))  // 12 tokens: >1 window
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextOps.queries("text_winnowing")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!out.contains(0L), "sub-gram doc must not fingerprint")
    assert(out(1L) == 1L && out(2L) == 1L,
      "short docs take the min of their available grams — not zero fingerprints")
    assert(out(3L) == 1L)
    assert(out(4L) >= 1L)
  }

  test("winnowing pair search: planted near-dups are recalled with dominant overlap") {
    val out = TextOps.queries("dedup_winnowing_pairs")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.nonEmpty)
    // every planted near-dup pair (d, d+100000) long enough to carry
    // several interior fingerprints must surface (recall), and the
    // shared span being the whole doc, its overlap must dominate
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nw")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).filter(_._2 >= 30).map(_._1)
    assert(planted.nonEmpty)
    planted.foreach { d =>
      val hit = out.get((d, d + 100000L))
      assert(hit.nonEmpty, s"planted pair ($d, ${d + 100000}) not recalled")
      assert(hit.get._2 >= 0.5, s"planted pair $d overlap ${hit.get._2}")
    }
    // sanity on the ratio: n_shared <= min fingerprint count => overlap <= 1
    out.foreach { case ((da, db), (n, r)) =>
      assert(n >= 2 && r > 0.0 && r <= 1.0, s"pair ($da,$db) n=$n r=$r")
    }
  }

  test("incremental winnowing: every long-enough batch arrival is flagged against its source") {
    val out = TextOps.queries("dedup_winnowing_incr")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.nonEmpty)
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nw")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).filter(_._2 >= 30).map(_._1)
    assert(planted.nonEmpty)
    planted.foreach { d =>
      val hit = out.get((d + 100000L, d))
      assert(hit.nonEmpty, s"batch doc ${d + 100000} not flagged against source $d")
      // the shared span is (almost) the whole doc: containment dominates
      assert(hit.get._2 >= 0.5, s"batch doc ${d + 100000} contain_r ${hit.get._2}")
    }
    out.foreach { case ((db, da), (n, r)) =>
      assert(db >= 100000L && da < 100000L, s"($db,$da) not an index x batch pair")
      assert(n >= 2 && r > 0.0 && r <= 1.0, s"($db,$da) n=$n r=$r")
    }
  }

  test("cluster-balanced sampling equalizes toward the rarest cluster") {
    val out = Curation.queries("curate_cluster_balanced")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val minTotal = out.map(_._2).min
    out.foreach { case (c, total, kept) =>
      assert(kept <= total, s"cluster $c")
      if (total == minTotal) assert(kept == total, s"rarest cluster $c keeps all")
    }
    // every cluster's keep count lands near the rarest cluster's size
    // (integer pct floor + deterministic hash ⇒ a slack band, not exact)
    assert(out.map(_._3).max <= minTotal * 3 + 5,
      s"keeps ${out.map(_._3).max} should approximate rarest $minTotal")
  }

  test("domain-quality filter: decision matches a direct integer recomputation") {
    val out = Curation.queries("curate_domain_quality")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // per-lang tallies are consistent and the filter is actually active
    out.foreach { case (lang, total, kept, frac) =>
      assert(kept >= 0 && kept <= total, s"$lang")
      assert(math.abs(frac - kept.toDouble / total) < 1e-3, s"$lang frac")
    }
    assert(out.map(_._3).sum > 0, "filter dropped everything")
    assert(out.map(_._3).sum < out.map(_._2).sum, "filter kept everything")
    // replay the per-source integer decision directly and re-derive the
    // per-lang kept counts
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val keep = docs.groupBy(_._2).map { case (src, ds) =>
      src -> (ds.map(_._3).sum >= 54L * ds.length)
    }
    val expect = docs.groupBy(_._1).map { case (lang, ds) =>
      lang -> ds.count(d => keep(d._2)).toLong
    }
    out.foreach { case (lang, _, kept, _) => assert(kept == expect(lang), lang) }
  }

  test("snapshot diff statuses partition both snapshots with the planted counts") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val out = Curation.queries("curate_snapshot_diff")(spark, dir).collect()
    val byStatus = out.groupBy(_.getString(1))
      .map { case (st, rs) => st -> rs.map(_.getLong(2)).sum }
    assert(byStatus("added") == ids.count(_ % 10 == 7))
    assert(byStatus("removed") == ids.count(_ % 10 == 3))
    assert(byStatus("changed") ==
      ids.count(i => i % 10 != 7 && i % 10 != 3 && i % 5 == 0))
    assert(byStatus.values.sum ==
      ids.count(i => i % 10 != 7 || i % 10 != 3)) // |A ∪ B|
  }

  test("quality classifier: exact score replay for one doc, labels follow sign") {
    val rows = TextOps.queries("text_quality_classifier")(spark, dir).collect()
    rows.foreach { r =>
      val (score, label) = (r.getLong(2), r.getString(3))
      assert(if (score > 0) label == "keep" else label == "drop")
    }
    assert(rows.map(_.getString(3)).distinct.sorted.sameElements(Array("drop", "keep")),
      "both labels should occur on this corpus")
    // bit-exact replay of doc 0's score off-Spark
    val text = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val score0 = text.split(" ").map { w =>
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val gid = java.lang.Long.parseLong(hex.take(15), 16) % 2147483647L
      (gid % 1024L) * 2654435761L % 2001L - 1000L
    }.sum
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(2) == score0)
    assert(r0.getLong(1) == text.split(" ").length.toLong)
  }

  test("tf-idf top-3 replays off-Spark: scores, ranks, and tie order") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nDocs = texts.size
    val tfByDoc = texts.map { case (id, t) =>
      id -> t.split(" ").groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    }
    val df = tfByDoc.values.flatMap(_.keys).groupBy(identity).map { case (w, ws) => w -> ws.size }
    def idf6(w: String): Long = math.round(math.log(nDocs.toDouble / df(w)) * 1e6)
    val out = TextOps.queries("text_tfidf_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc.keySet == texts.keySet.filter(id => tfByDoc(id).size >= 3)
      ++ texts.keySet.filter(id => tfByDoc(id).size < 3), "every doc represented")
    byDoc.foreach { case (id, rows) =>
      val expected = tfByDoc(id).toSeq
        .map { case (w, tf) => (w, tf * idf6(w)) }
        .sortBy { case (w, s) => (-s, w) }.take(3)
      val got = rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(got == expected, s"doc $id: got $got expected $expected")
    }
  }

  test("curriculum phases: complete partition, disjoint descending score ranges") {
    val rows = Curation.queries("curate_curriculum")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted, "phase order")
    assert(rows.forall(r => r._2 > 0 && r._3 > 0), "no empty phase at this sf")
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._2).sum == total, "every doc lands in exactly one phase")
    // quartile thresholds make the per-phase score ranges disjoint and
    // strictly descending (equal scores always share a phase)
    rows.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(lo._5 < hi._4,
          s"phase ${lo._1} range [${lo._4},${lo._5}] overlaps phase ${hi._1} [${hi._4},${hi._5}]")
      case _ =>
    }
    rows.foreach { case (p, _, _, mn, mx) => assert(mn <= mx, s"phase $p range") }
  }

  test("ngram novelty replays off-Spark: distinct grams, df counts, basis points") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def gramsOf(t: String): Set[String] =
      t.split(" ").sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    val byDoc = texts.collect { case (id, t) if t.split(" ").length >= 5 =>
      id -> gramsOf(t)
    }
    val df = byDoc.values.flatten.groupBy(identity).map { case (g, gs) => g -> gs.size }
    val rows = TextOps.queries("text_ngram_novelty")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet == byDoc.keySet, "exactly the >=5-word docs")
    rows.foreach { case (id, ng, uniq, bp) =>
      val expect = byDoc(id)
      assert(ng == expect.size, s"doc $id gram count")
      assert(uniq == expect.count(g => df(g) == 1), s"doc $id unique grams")
      assert(bp == uniq * 10000 / ng, s"doc $id novelty")
    }
  }

  test("index staleness: drift replays off-Spark per label; verdicts match the threshold") {
    val rows = Similarity.queries("sim_index_staleness")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    assert(rows.map(_._1).toSet == emb.map(_._3).toSet, "every label present")
    def cents(vs: Seq[(Long, Array[Float], Int)]): Map[Int, Array[Double]] =
      vs.groupBy(_._3).map { case (l, g) =>
        l -> Array.tabulate(g.head._2.length)(d => g.map(_._2(d).toDouble).sum / g.size)
      }
    val c0 = cents(emb.toSeq)
    val batch = emb.filter(_._1 % 5 == 0)
      .map { case (id, v, l) => (id + 100000, v.map(x => (x * 1.01f)), l) }
    val c1 = cents(emb.toSeq ++ batch)
    rows.foreach { case (l, d6, v) =>
      val sq = c0(l).zip(c1(l)).map { case (a, b) => (a - b) * (a - b) }.sum
      val expect6 = math.round(BigDecimal(sq).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
      assert(math.abs(d6 - expect6) <= 1, s"label $l drift $d6 vs replay $expect6")
      assert(v == (if (d6 > Similarity.StaleDrift6) "stale" else "fresh"), s"label $l verdict")
      assert(d6 >= 0)
    }
  }

  test("decontamination spans: planted quotes located exactly, spans disjoint, doc set consistent") {
    val spans = TextOps.queries("text_decontaminate_spans")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length.toLong).toMap
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, a, b) =>
        assert(a >= 0 && a < b && b <= lens(id), s"doc $id span [$a,$b) out of bounds")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(s2 > e1, s"doc $id spans overlap — islands not merged")
        case _ =>
      }
    }
    // the planted contamination: every 10th doc quotes ITSELF minus its
    // first two words, so its own span must start at word 2 and run to
    // the end of the doc
    lens.keys.filter(id => id % 10 == 0 && lens(id) >= 10).foreach { id =>
      assert(spans.contains((id, 2L, lens(id))),
        s"planted doc $id: expected span [2, ${lens(id)}), got ${spans.filter(_._1 == id).toSeq}")
    }
    // phase-1 detect and span output must agree on WHICH docs are dirty
    val flagged = TextOps.queries("text_decontaminate")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(spans.map(_._1).toSet == flagged,
      "span docs differ from the gram-count detector's docs")
  }

  test("blocklist gate: verdicts replay off-Spark and gates compose by AND") {
    val rows = TextOps.queries("text_blocklist_filter")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    rows.foreach { case (id, wh, ph, v) =>
      val t = texts(id)
      assert(wh == t.split(" ").count(Set("dup", "deadlock")), s"doc $id word_hits")
      assert(ph == Seq("slow query", "lorem ipsum").count(t.contains), s"doc $id phrase_hits")
      assert(v == (if (wh == 0 && ph == 0) "keep" else "drop"), s"doc $id verdict")
    }
    // both gates must actually fire on this corpus, or the test is vacuous
    assert(rows.exists(r => r._2 > 0 && r._4 == "drop"), "word gate fired")
    assert(rows.exists(r => r._3 > 0 && r._4 == "drop"), "phrase gate fired")
  }

  test("threshold calibration: exact cumulative algebra, consistent with the near-dup query") {
    val rows = Dedup.queries("dedup_threshold_calibration")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (d, p, _) =>
      assert(d >= 0 && d <= 10 && p > 0, s"decile $d pairs $p")
    }
    // cum(d) = pairs(d) + cum(next decile up); the top decile's cum is itself
    rows.foreach { case (d, p, cum) =>
      val higher = rows.filter(_._1 > d)
      assert(cum == p + higher.map(_._2).sum, s"decile $d cumulative")
    }
    // the ≥0.5 near-dup query is exactly the deciles-≥5 slice
    val lsh = Dedup.queries("dedup_minhash_lsh")(spark, dir).count()
    assert(rows.filter(_._1 >= 5).map(_._2).sum == lsh,
      "calibration disagrees with the near-dup query at threshold 0.5")
  }

  test("incremental card: merge equals recompute-over-union; base card builds once") {
    val run1 = Curation.queries("curate_card_incremental")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val builds = Curation.cardBuildCounts((spark, dir))
    // off-Spark recompute over base ∪ batch — proves exact mergeability
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val union = docs ++ docs.filter(_._1 % 9 == 0)
    val expect = union.groupBy(_._2).map { case (lang, g) =>
      val nw = g.map(_._3.split(" ").length.toLong)
      (lang, g.length.toLong, nw.sum, g.map(_._3.length.toLong).sum,
        nw.count(_ < 20).toLong)
    }.toSeq.sortBy(_._1)
    assert(run1.toSeq == expect, "merged card != recomputed union card")
    // a second invocation must probe the stored base card, not rescan
    val run2 = Curation.queries("curate_card_incremental")(spark, dir).collect()
    assert(run2.length == run1.length)
    assert(Curation.cardBuildCounts((spark, dir)) == builds,
      "repeat invocation re-built the base card artifact")
  }

  test("reservoir sample: exactly K, the md5-rank prefix, via bounded TakeOrdered") {
    val df = Curation.queries("sample_reservoir")(spark, dir)
    val got = df.collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.length == 25, "exact sample size")
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
      .map { id =>
        (id, md.digest(s"$id#seed7".getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }.sortBy { case (id, rk) => (rk, id) }.take(25)
    assert(got.toSeq == expect.toSeq, "the K smallest hash ranks, in order")
    // bounded top-K, not a global sort: the plan must be TakeOrdered
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered plan:\n$plan")
  }

  test("dataset card: every metric replays off-Spark from the raw corpus") {
    val rows = Curation.queries("curate_dataset_card")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text", "lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows("docs") == docs.length)
    assert(rows("tokens") == docs.map(_._1.split(" ").length.toLong).sum)
    assert(rows("chars") == docs.map(_._1.length.toLong).sum)
    assert(rows("distinct_langs") == docs.map(_._2).distinct.length)
    assert(rows("distinct_sources") == docs.map(_._3).distinct.length)
    assert(rows("distinct_texts") == docs.map(_._1).distinct.length)
    assert(rows("short_docs") == docs.count(_._1.split(" ").length < 20))
    assert(rows("p50_tokens") > 0 && rows("mean_quality_bp") > 0)
    assert(rows("mean_quality_bp") <= 10000, "basis points")
  }

  test("multi-set span decontamination: evalA slice reproduces the single-set operator exactly") {
    val multi = TextOps.queries("text_decontam_spans_multi")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val single = TextOps.queries("text_decontaminate_spans")(spark, dir).collect()
      .map(r => ("evalA", r.getLong(0), r.getLong(1), r.getLong(2)))
    // the parameter-table generalization must be a strict superset: its
    // evalA arm IS the original suite, span-for-span
    assert(multi.filter(_._1 == "evalA").toSet == single.toSet,
      "generalized operator diverges from the single-set one on the same suite")
    // and the second suite actually contributes (≥2 sets in ONE pass —
    // the r9 verdict's done-condition)
    assert(multi.exists(_._1 == "evalB"), "second benchmark set found nothing")
    multi.foreach { case (set, _, s0, s1) =>
      assert(s1 - s0 >= 8, s"$set span shorter than one 8-gram") }
  }

  test("decontam report: exact rollup of the span table, spans never overlap within a doc") {
    val spans = TextOps.queries("text_decontam_spans_multi")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val report = TextOps.queries("text_decontam_report")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(report.keySet == spans.map(_._1).toSet)
    spans.groupBy(_._1).foreach { case (set, ss) =>
      val (docsHit, nSpans, redacted) = report(set)
      assert(docsHit == ss.map(_._2).distinct.length, s"$set docs_hit")
      assert(nSpans == ss.length, s"$set spans")
      assert(redacted == ss.map(s => s._4 - s._3).sum, s"$set redacted_tokens")
      // maximal spans: within a doc they must be disjoint AND non-adjacent
      // (an adjacent pair would have merged in the gaps-and-islands pass)
      ss.groupBy(_._2).foreach { case (doc, ds) =>
        ds.sortBy(_._3).sliding(2).filter(_.length == 2).foreach { pair =>
          val e1 = pair(0)._4
          val s2 = pair(1)._3
          assert(s2 > e1, s"$set doc $doc spans not maximal: end $e1 vs start $s2")
        }
      }
    }
  }

  test("media oracle precondition: the test corpus text is pure ASCII at every oracle SF") {
    // the mm_* oracles replay payload BYTES via DuckDB's
    // ascii(substring(text, ...)) — char-indexed code points — which
    // equals the Spark side's UTF-8 byte stream ONLY for pure-ASCII
    // text: one non-ASCII document would silently diverge the engines
    // (code points vs bytes, char-indexed vs byte-indexed positions)
    // and surface as an unexplained hash mismatch. Fail LOUDLY here
    // instead if a future testdata generation breaks the assumption.
    // ASCII ⟺ UTF-8 byte length == char length (multi-byte encodings
    // only appear above U+007F).
    Seq(dir, "/root/testdata/sf0.01").foreach { d =>
      val nonAscii = spark.read.parquet(s"$d/documents.parquet")
        .filter(octet_length(col("text")) =!= length(col("text"))).count()
      assert(nonAscii == 0,
        s"$d: $nonAscii non-ASCII documents — the mm_* byte-replay oracles " +
          "(and their char-indexed positions) are no longer valid")
    }
  }

  test("perceptual-hash media dedup: planted minor-edit copies all recovered") {
    val pairs = Multimodal.queries("mm_dedup_phash")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.forall(_._3 <= 3), "every reported pair within the Hamming gate")
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 7 === 0).select("doc_id").collect().map(_.getLong(0))
    planted.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + 100000),
        s"planted near-dup pair ($id, ${id + 100000}) not recovered")
    }
  }

  test("incremental media dedup: batch probes the stored signature index, zero re-hash") {
    val pairs = Multimodal.queries("mm_dedup_phash_incr")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val builds = Multimodal.phashBuildCounts((spark, dir))
    assert(pairs.forall(p => p._1 >= 100000 && p._2 < 100000),
      "every pair is batch × index — never index-internal")
    assert(pairs.forall(_._3 <= 3), "Hamming gate")
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 7 === 0).select("doc_id").collect().map(_.getLong(0))
    planted.foreach { id =>
      assert(pairs.exists(p => p._1 == id + 100000 && p._2 == id),
        s"planted arrival ${id + 100000} did not match its original $id")
    }
    // a repeat invocation must probe the stored signatures, not re-hash
    assert(Multimodal.queries("mm_dedup_phash_incr")(spark, dir).collect()
      .length == pairs.length)
    assert(Multimodal.phashBuildCounts((spark, dir)) == builds,
      "repeat invocation re-built the signature index")
  }

  test("phash stop-band cap fires on a degenerate identical-signature corpus") {
    import spark.implicits._
    // 70 identical signatures: every band bucket pops 70 > MaxBandPop=64
    // → all dropped → ZERO pairs (the 100×-probe mega-bucket pathology,
    // constructed); 5 identical signatures stay under the cap → C(5,2)
    val mega = (0 until 70).map(i => (i.toLong, 0x12345678L, 0x0abcdef0L))
      .toDF("doc_id", "lo", "hi")
    assert(Multimodal.phashPairs(mega).count() == 0, "cap did not fire")
    val small = (0 until 5).map(i => (i.toLong, 0x12345678L, 0x0abcdef0L))
      .toDF("doc_id", "lo", "hi")
    assert(Multimodal.phashPairs(small).count() == 10, "under-cap pairs kept")
  }

  test("aHash64 is order-stable and zeroes empty blocks on sub-64-byte payloads") {
    import spark.implicits._
    // "abcd" vs "dcba": byte order reverses which blocks sit above the
    // (identical) global mean, so the signatures MUST differ; a one-byte
    // tweak that keeps block means on the same side of the global mean
    // ("abce") must NOT flip bits — collision on near-identical payloads
    // is aHash working, not a bug
    val tiny = Seq(
      Multimodal.MediaRecord(1L, "png", 8, 8, "abcd".getBytes("UTF-8")),
      Multimodal.MediaRecord(2L, "png", 8, 8, "abcd".getBytes("UTF-8")),
      Multimodal.MediaRecord(3L, "png", 8, 8, "dcba".getBytes("UTF-8")),
      Multimodal.MediaRecord(4L, "png", 8, 8, "abce".getBytes("UTF-8"))).toDS()
    val sigs = Multimodal.aHash64(tiny).collect().map(s => s.doc_id -> (s.lo, s.hi)).toMap
    assert(sigs(1L) == sigs(2L), "identical payloads hash identically")
    assert(sigs(1L) != sigs(3L), "reversed payload flips blocks across the mean")
    assert(sigs(1L) == sigs(4L), "near-identical payload collides — the aHash contract")
    // 4 bytes → only blocks 0,16,32,48 are populated; every other bit
    // must be 0, so lo/hi can each have at most 2 bits set
    sigs.values.foreach { case (lo, hi) =>
      assert((lo & ~((1L << 0) | (1L << 16))) == 0, s"unexpected lo bits: $lo")
      assert((hi & ~((1L << 0) | (1L << 16))) == 0, s"unexpected hi bits: $hi")
    }
  }

  test("cluster profile: exact partition of the labeled nodes by (cluster, lang)") {
    val labels = Similarity.queries("sim_cluster_knn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val prof = Similarity.queries("sim_cluster_profile")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
    assert(prof.map(_._1).distinct.length == prof.length, "one row per (cluster, lang)")
    assert(prof.map(_._2._1).sum == labels.length,
      "every labeled node counted exactly once")
    assert(prof.map(_._1._1).toSet == labels.map(_._2).toSet,
      "profile covers exactly the label clusters")
    assert(prof.forall { case (_, (docs, tokens)) => docs > 0 && tokens >= docs },
      "positive masses (every doc has >= 1 word)")
  }

  test("ANN recall eval: bounded counts, and candidate-superset knobs never lose recall") {
    val rows = Similarity.queries("sim_recall_eval")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("ivf_kmeans", "ivf_nprobe1", "ivf_nprobe2",
      "lsh_multiprobe", "lsh_single", "pq_adc", "q8_rerank"))
    val truthN = rows.values.head._3
    rows.foreach { case (m, (retrieved, hits, tn, bp)) =>
      assert(tn == truthN, s"$m truth_n")
      assert(retrieved <= truthN, s"$m retrieved $retrieved > truth $truthN")
      assert(hits >= 0 && hits <= retrieved, s"$m hits $hits")
      assert(bp == hits * 10000 / truthN, s"$m recall_bp")
    }
    // candidate-set inclusion ⇒ recall monotonicity (a truth member can
    // only be displaced from an exact-cosine top-3 by other truth members,
    // so a superset candidate pool never lowers hits): nprobe2 probes a
    // superset of nprobe1's block, multiprobe a superset of the single
    // bucket. These MUST hold at every sf — they are the knobs' contract.
    assert(rows("ivf_nprobe2")._2 >= rows("ivf_nprobe1")._2,
      "nprobe=2 lost recall vs nprobe=1")
    assert(rows("lsh_multiprobe")._2 >= rows("lsh_single")._2,
      "multi-probe lost recall vs single-probe")

    // ABSOLUTE recall floors (the r9 verdict's ask: measurement → guard):
    // each method's recall_bp measured at THIS sf (sf0.001: kmeans 2916,
    // nprobe1 1250, nprobe2 2500, multiprobe 3750, single 1666, pq 3750,
    // q8 8750), pinned at 80% of measured so an index or knob regression
    // fails sbt test instead of passing silently, while leaving slack for
    // benign tie-reorderings. sf-specific by nature — re-measure via
    // sim_recall_eval if the testdata generation changes.
    val floors = Map(
      "ivf_kmeans" -> 2333L, "ivf_nprobe1" -> 1000L, "ivf_nprobe2" -> 2000L,
      "lsh_multiprobe" -> 3000L, "lsh_single" -> 1333L, "pq_adc" -> 3000L,
      "q8_rerank" -> 7000L)
    floors.foreach { case (m, floor) =>
      assert(rows(m)._4 >= floor,
        s"$m recall regressed: ${rows(m)._4} bp < floor $floor bp")
    }
    // the floors have teeth — negative controls on live data: the
    // deliberate knob-breaks the guard must catch are sitting right in
    // the eval table. Degrading nprobe 2→1 means serving nprobe1's
    // recall, which sits BELOW nprobe2's floor, so the assertion above
    // would flip; same for multiprobe→single. If these ever stop holding
    // the floors have gone vacuous and need re-pinning.
    assert(rows("ivf_nprobe1")._4 < floors("ivf_nprobe2"),
      "nprobe floor is vacuous: a 2->1 knob break would still pass")
    assert(rows("lsh_single")._4 < floors("lsh_multiprobe"),
      "multiprobe floor is vacuous: a probe-fanout break would still pass")
  }
}
