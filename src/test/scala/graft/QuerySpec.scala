package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for query smoke tests (sf0.001). Full value
  * correctness is checked against the DuckDB oracle by the driver (and
  * locally by scripts/check_oracle.py); these specs assert executability,
  * schema and basic invariants for every declared query. */
object TestSpark {
  /** Self-reviving shared session: suites that build their own session
    * via getOrCreate receive THIS one when it is already active, and
    * their afterAll stop() kills the shared context — so hand out a
    * fresh session whenever the previous one has been stopped. */
  def spark: SparkSession = synchronized {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the 235-query sweeps evict the default 100-entry codegen cache
      // and pay janino recompiles on every pass (static conf — applies
      // only when this builder actually creates the session)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    // getOrCreate may return a session another suite created with
    // DIFFERENT builder configs (builder configs apply only at creation) —
    // re-assert the runtime-settable ones this harness depends on
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class QuerySpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query runs at sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"query $name returned no rows")
    }
  }

  test("HLL cardinality sketch lands inside its rsd bound of the exact t24 gate") {
    // the 100 TB path of t24: approx_count_distinct (mergeable HLL++)
    // must sit within ~3 rsd of the exact distinct the oracle gates
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS tok")
    val exact = toks.selectExpr("CAST(count(DISTINCT tok) AS BIGINT)")
      .collect()(0).getLong(0)
    val rsd = 0.02
    val approx = toks
      .agg(org.apache.spark.sql.functions.approx_count_distinct("tok", rsd))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact) <= 3 * rsd * exact + 1,
      s"approx $approx vs exact $exact outside 3*rsd")
  }

  test("k-means training is invariant to the input's physical partitioning") {
    // the distributed-correctness claim behind e13: exact integer sums
    // mean every Lloyd iteration (and so the trained model) is identical
    // under ANY partitioning of the embeddings — here 1 vs 7 partitions
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.EmbeddingQueries.kmeansLloydFrom(df)
        .collect().map(_.toSeq).toSeq
    assert(run(emb.coalesce(1)) == run(emb.repartition(7)))
  }

  /** Every registered BATCH query's physical plan string, built once and
    * shared by the plan-shape sweeps below. The streaming gates (s01–s06)
    * are excluded deliberately: building their DataFrame replays a whole
    * stream to completion (~30 s of wall across the six), yet the plan
    * that comes back is only the memory-SINK scan — the lints would see
    * nothing of the streaming transform either way. The transforms'
    * shuffle/join shapes are covered by their registered batch twins
    * (t26/t01/t19/q64/…, linted here) and by StreamingSpec's parity
    * assertions; the Bloom confirm join inside the stream carries the
    * same hash-pair keying contract as the linted batch pass. */
  /** Queries whose BUILDER runs a driver-side training loop (collect
    * per round): building "the plan" would execute the whole trainer
    * and hand the lints only a LocalTableScan of the collected result —
    * slow AND vacuous. Each exclusion must supply its real per-round
    * plan under a synthetic name below, so the lint sweep still sees
    * the shuffles that matter. */
  private val driverLoopQueries = Set("t33_bpe_train")

  private lazy val planStrings: Map[String, String] = {
    val registered = SparkEntry.queries.collect {
      // exclusion by MEMBERSHIP in the streaming-gate registry, not by
      // name prefix (r11 advisory: a prefix exempted any future "s0…"
      // query from the lints, streaming or not)
      case (name, fn)
          if !graft.operators.StreamQueries.queries.keySet.contains(name) &&
            !driverLoopQueries.contains(name) =>
        name -> fn(spark, sf).queryExecution.executedPlan.toString
    }
    // t33's real per-round plan: the pair-count stage over the vocab
    // table with a non-empty merge list (lazy — never executed here)
    val bpeWords = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS w")
      .where("w RLIKE '^[a-z]+$'")
      .groupBy("w").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("freq"))
    // s08/s09's streaming TRANSFORMS escape the sweep by registry design
    // (their gates replay streams; the plan at the gate is only the sink
    // scan). Both run unchanged on batch Datasets — flatMapGroupsWithState
    // executes with empty prior state, the stateless encode is a plain
    // projection — so inject the batch-built plans under synthetic names
    // and the lints see the real shuffle/projection shapes (r12 verdict
    // #8). Lazy: planned, never executed.
    val sp = spark
    import sp.implicits._
    val docsDs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("timestamp_seconds(1700000000) AS ts", "doc_id", "text")
      .as[graft.streaming.StreamOps.Doc]
    registered +
      ("t33_bpe_round" ->
        graft.operators.TextQueries.bpePairCounts(bpeWords, Seq((" a  b ", " ab ")))
          .queryExecution.executedPlan.toString) +
      ("s08_dsir_topk_batch" ->
        graft.streaming.StreamOps.dsirTopK(docsDs, Array.fill(64)(1L))
          .queryExecution.executedPlan.toString) +
      ("s09_bpe_encode_batch" ->
        graft.streaming.StreamOps.bpeEncode(docsDs, Seq((" a  b ", " ab ")))
          .queryExecution.executedPlan.toString) +
      ("s10_interval_outer_batch" -> {
        // the left-outer interval join built on a batch Dataset: the
        // equi-key (u = ru) must drive a keyed join with the time bounds
        // as residual filters — never a cartesian
        val ev = spark.range(64).selectExpr(
          "timestamp_seconds(1700000000 + id) AS ts", "id % 7 AS user", "id")
          .as[graft.streaming.StreamOps.EvId]
        graft.streaming.StreamOps.intervalJoin(ev, joinType = "left_outer")
          .queryExecution.executedPlan.toString
      })
  }

  test("no query plans a CartesianProduct (every cross join is broadcast)") {
    // a CartesianProduct is the O(parts^2) task explosion AQE can't save;
    // scalar/tiny cross joins must go through broadcast (BNLJ)
    val offenders = planStrings.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"CartesianProduct in: ${offenders.toSeq.sorted}")
  }

  test("no corpus-scale shuffle carries a raw wide-text key (hash-key rule)") {
    // Formalized from the r10 t27/t28 fix (r10 verdict ask #8): a
    // groupBy/join whose shuffle key is the document text or a
    // multi-token window/span string moves ~W× the corpus bytes through
    // the exchange at 100 TB — such keys must be fixed-width hashes.
    // The ONE sanctioned exception class (t20-style): the gate needs
    // exact string equality the oracle can replay, and the scaladoc
    // documents the hash-keyed production variant. New entries join the
    // waiver map only with that written justification.
    val waived = Map(
      "t20_span_dedup" ->
        "oracle requires exact span equality; hash-key variant documented in scaladoc")
    // attribute names that carry doc text or multi-token windows/spans
    val wide = "(?<![A-Za-z0-9_])(text|span|spans|g|toks)#".r
    val offenders = planStrings.flatMap { case (name, plan) =>
      if (waived.contains(name)) None
      else {
        val bad = plan.linesIterator.filter(l =>
          l.contains("hashpartitioning") && wide.findFirstIn(l).isDefined).toSeq
        if (bad.nonEmpty) Some(s"$name: ${bad.head.trim.take(160)}") else None
      }
    }
    assert(offenders.isEmpty,
      s"wide-text shuffle keys (hash them or add a written waiver):\n  ${offenders.mkString("\n  ")}")
  }

  test("every query has an oracle or is explicitly exempt") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("flagship revenue matches a direct Spark SQL computation") {
    val got = SparkEntry.queries("q01_sum_revenue")(spark, sf)
      .collect()(0).getDouble(0)
    val exp = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("round(sum(l_extendedprice * (1 - l_discount)), 2) AS r")
      .collect()(0).getDouble(0)
    assert(got == exp)
  }

  test("cumsum last element equals total sum") {
    val ds = DArray.fromColumn(spark, sf, "events", "event_id", "value")
    val total = ds.elements.selectExpr("round(sum(v), 2)").collect()(0).getDouble(0)
    val lastCum = ds.cumsum.elements.orderBy(org.apache.spark.sql.functions.col("idx").desc)
      .limit(1).selectExpr("round(v, 2)").collect()(0).getDouble(0)
    assert(math.abs(total - lastCum) < 1e-6)
  }

  test("negative-step slice: values, empty ranges, single element") {
    val x = DArray.arange(spark, sf, 0, 50, 1)
    def vals(lo: Long, hi: Long, st: Long): Seq[Double] =
      x.slice(lo, hi, st).elements.orderBy("idx").collect().map(_.getDouble(1)).toSeq
    // out[t] = x[hi-1-t*k]
    assert(vals(10, 20, -3) == Seq(19.0, 16.0, 13.0, 10.0))
    assert(vals(10, 19, -3) == Seq(18.0, 15.0, 12.0))
    assert(vals(5, 5, -2).isEmpty, "hi == lo must be empty")
    assert(vals(0, 0, -2).isEmpty, "hi == lo == 0 must be empty")
    assert(vals(7, 8, -4) == Seq(7.0), "single-element range")
  }

  test("two-array weighted bincount (distinct leaves) joins on idx") {
    // the join form exists for weights from a DIFFERENT array — q16 now
    // uses the one-scan bincountBy, so this branch needs its own coverage
    val buckets = DArray.arange(spark, sf, 0, 100, 1).map("floor(v / 10)")
    val weights = DArray.arange(spark, sf, 0, 100, 1).map("v * 2")
    val out = buckets.bincount(Some(weights)).orderBy("value").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == 10, s"bucket $k count")
      // weights 2v over v in [10k, 10k+10): 2 * (100k + 45)
      assert(r.getDouble(2) == 2.0 * (100 * k + 45), s"bucket $k wsum")
    }
  }

  test("sliding_window_view is a narrow generator expansion (no Exchange)") {
    val da = DArray.fromColumn(spark, sf, "events", "event_id", "value")
      .slice(0, 300)
    val win = da.slidingWindowView(5)
    val plan = win.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free window view:\n$plan")
    // spot-check values: pos p, off o holds x[p+o]
    val rows = win.orderBy("pos", "off").collect()
    assert(rows.length == (300 - 5 + 1) * 5)
    val base = da.elements.orderBy("idx").collect().map(_.getDouble(1))
    rows.foreach { r =>
      assert(r.getDouble(2) == base((r.getLong(0) + r.getLong(1)).toInt))
    }
  }

  test("t14 contamination: eval hash set joins as broadcast (no pair join)") {
    val df = SparkEntry.queries("t14_contamination")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast of the eval hash set:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"contamination must not shuffle-join the corpus:\n$plan")
  }

  test("sorted-neighborhood pair queries plan ONE pass — no self-join") {
    // t06/t11/e05/e06 generate bucket-window pairs from W lead() columns
    // in a single window pass; a rn self-join would run the signature
    // kernel / embedding scan twice and shuffle the table again
    for (q <- Seq("t06_lsh_candidates", "t11_simhash_pairs",
                  "e05_ann_bucketed", "e06_label_topk_pairs")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"$q must not self-join the pair table:\n$plan")
      assert(plan.contains("Window"), s"$q should use the lead() window pass:\n$plan")
    }
  }

  test("t30 threshold pre-filter keeps >= K survivors per source (exactness guard)") {
    // the sample is exact iff each source's K smallest coins all pass
    // the pre-filter — guaranteed when >= K survivors exist under T.
    // Data and coin are deterministic, so this is a fixture invariant,
    // not a probabilistic one (also measured >= 12 at sf0.01/sf0.1).
    val minSurvivors = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("source",
        "((1103515245 * (doc_id % 2147483648) + 12345) % 2147483648) AS u")
      .where("u < 1073741824")
      .groupBy("source").count()
      .agg(org.apache.spark.sql.functions.min("count")).head().getLong(0)
    assert(minSurvivors >= 5, s"t30 exactness bound violated: $minSurvivors < 5")
  }

  test("band-width scale contract: bits derive from the corpus count, clamped [4,16]") {
    import graft.operators.TextQueries.{bandBits, bandStackExpr}
    // fixed 4-bit bands are 16 buckets/table at ANY corpus size — the
    // production path widens b so the expected bucket stays bounded
    assert(bandBits(0) == 4 && bandBits(65536) == 4)
    assert(bandBits(1L << 26) == 10)          // 2^10 buckets of ~65536
    assert(bandBits(100L * 65536) == 7)       // ceil(log2(100))
    assert(bandBits(Long.MaxValue / 2) == 16) // 4 bands × 16 bits = 64
    val widths = Seq(1L << 16, 1L << 20, 1L << 24, 1L << 30, 1L << 40).map(bandBits(_))
    assert(widths == widths.sorted, s"bandBits must be monotone: $widths")
    // the derived-width path generates real band keys: at b = 8 the
    // bucket space is 16× the pinned 4-bit one
    val n = 4096L
    // non-negative signatures, like the simhash/phash columns the band
    // key is applied to (SQL % is signed — a negative h would mint
    // negative bucket ids)
    val sigs = spark.range(n).selectExpr("id AS doc_id", "abs(xxhash64(id)) AS h")
    val b = bandBits(n, targetBucket = 16L) // 256 buckets/table -> b = 8
    assert(b == 8)
    val buckets = sigs.selectExpr("doc_id", bandStackExpr(4, b))
      .selectExpr("t", "bh").distinct().count()
    assert(buckets > 4L * 16L && buckets <= 4L * 256L,
      s"derived 8-bit bands should fan past the 64 fixed buckets, got $buckets")
  }

  test("t27/t28 exact-substr: corpus-wide exchanges keyed on window hashes, not strings") {
    // the repeat groupBy + join must shuffle the 128-bit (h1, h2) window
    // hash — 16 bytes/row — never the raw W-token window string `g`
    // (~W× the corpus bytes; at 100 TB the difference between a ~100 TB
    // and a ~2 PB exchange). `g` exists only inside the projection that
    // computes the hashes, so no Exchange/hashpartitioning may mention it.
    val gRef = "(?<![A-Za-z0-9_])g#".r // avoid matching lang#12 etc.
    for (q <- Seq("t27_exact_substr", "t28_substr_removal")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("xxhash64"), s"$q should hash the window key:\n$plan")
      val offending = plan.linesIterator.filter(l =>
        l.contains("hashpartitioning") && gRef.findFirstIn(l).isDefined).toSeq
      assert(offending.isEmpty,
        s"$q exchanges the raw window string:\n${offending.mkString("\n")}")
    }
  }

  test("t15 sequence packing: block-partitioned prefix sum + broadcast carry") {
    val df = SparkEntry.queries("t15_seq_packing")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the data-sized window runs per 1000-doc block, never globally
    assert(plan.contains("windowspecdefinition(blk"),
      s"expected blk-partitioned prefix-sum window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the O(numBlocks) carry table broadcast back:\n$plan")
    // values match the single-window definition (fine at sf0.001 scale)
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS nt")
      .selectExpr("doc_id", "nt",
        "sum(nt) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt AS pos")
      .selectExpr("pos DIV 2048 AS bin", "nt", "doc_id")
      .groupBy("bin")
      .agg(
        org.apache.spark.sql.functions.expr("CAST(count(*) AS BIGINT)").as("n_docs"),
        org.apache.spark.sql.functions.expr("CAST(sum(nt) AS BIGINT)").as("toks"),
        org.apache.spark.sql.functions.expr("min(doc_id)").as("first_id"),
        org.apache.spark.sql.functions.expr("max(doc_id)").as("last_id"))
      .orderBy("bin")
    assert(df.collect().toSeq == direct.collect().toSeq)
  }

  test("distinct ranks plan has no single-partition window (q57 engine)") {
    // unique(return_inverse) ranks distinct values via range-partitioned
    // sort + per-partition offsets; a Window.orderBy here would collapse
    // the distinct set onto one task (the round-6 scale-killer boundary
    // case). Assert the engine itself plans no Window at all.
    val el = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id AS idx", "floor(value / 100) AS v")
    val (ranks, release) = graft.operators.DistinctRank.distinctRanks(el, "v")
    try {
      val plan = ranks.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"window in distinct-rank plan:\n$plan")
      // ranks are dense 0..k-1 ascending by value
      val rows = ranks.orderBy("inv").collect()
      assert(rows.map(_.getLong(1)).toSeq == rows.indices.map(_.toLong))
      assert(rows.map(_.getDouble(0)).toSeq == rows.map(_.getDouble(0)).sorted.toSeq)
    } finally release()
  }

  test("salted join equals the plain join and shuffles on (key, salt)") {
    // double-sided hot key: 90% of both sides carry key 0 — the case
    // AQE's skew-join split cannot fix (it can split only one side)
    val probe = spark.range(0, 2000).selectExpr(
      "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k", "id AS pid")
    val build = spark.range(0, 200).selectExpr(
      "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k", "id AS bid")
    val salted = graft.operators.Salt.saltedJoin(probe, build, "k", 8, "pid")
    val plain = probe.join(build, "k")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(salted.collect().map(key).sorted.toSeq == plain.collect().map(key).sorted.toSeq)
    // the exchange keys on the salt, so the hot key spreads over 8 buckets
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt key missing from plan:\n$plan")
  }

  test("perf tripwire: steady-state per-query time stays inside budget") {
    // Plan-regression guard (round-6 lesson: a 54x q05 surprise shipped
    // because nothing asserted on time). Every query already ran once in
    // the first test, so JIT/codegen is warm; this times ONE more
    // execution against a generous checked-in ceiling — local[4] sf0.001
    // steady state is <1s/query, so the default 15s ceiling only trips on
    // a collapsed plan (driver loop, global sort, cartesian blowup), not
    // on machine noise. The 2s soft report surfaces drift before it
    // becomes a failure.
    val budgetSec = (Map( // driver-coordinated linalg chains run many jobs
      "l06_svd_compressed" -> 60.0, "l05_svd_full" -> 30.0,
      "l03_cholesky_trace" -> 30.0, "l09_lu_reconstruct" -> 30.0,
      "l08_solve_lu" -> 30.0, "l10_solve_spd" -> 30.0, "l04_inv" -> 30.0
    ) ++
      // streaming replay gates: wall time is harness scheduling (bounded
      // file replays, watermark polling, no-data batches) — r14 observed
      // s17 at 15.7 s on local[4] with a healthy plan; their drift gate
      // is PerfBudgets against the full-bench artifact, this ceiling only
      // catches a hung replay
      graft.operators.StreamQueries.queries.keys.map(_ -> 60.0))
      .withDefaultValue(15.0)
    val times = SparkEntry.queries.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val slow = times.filter(_._2 > 2.0).sortBy(-_._2)
    if (slow.nonEmpty)
      info("steady-state over 2s: " +
        slow.map { case (n, t) => f"$n=$t%.1fs" }.mkString(", "))
    val over = times.filter { case (n, t) => t > budgetSec(n) }
    assert(over.isEmpty, "queries exceeded their steady-state ceiling: " +
      over.map { case (n, t) => f"$n=$t%.1fs" }.mkString(", "))
  }

  test("slice pushdown reaches the parquet scan (PushedFilters)") {
    val da = DArray.fromColumn(spark, sf, "events", "event_id", "value")
      .slice(100, 200).map("v * 2")
    val plan = da.elements.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(event_id,100") || plan.contains("IsNotNull")),
      s"expected pushed range filter in scan:\n$plan")
  }
}
