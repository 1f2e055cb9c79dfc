package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Native Catalyst expression surface: graft_dot must bit-match the
  * interpreted HOF fold it replaces and stay inside whole-stage codegen. */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark.spark

  private def hofDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, z) -> acc + z)"

  test("graft_dot bit-matches the HOF fold on float arrays") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val df = (0 until 200).map { i =>
      (i.toLong,
        Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6) / 3.0f),
        Array.tabulate(64)(d => ((i * 17 + d * 5) % 11 - 5) / 7.0f))
    }.toDF("id", "a", "b")
    val rows = df.selectExpr("graft_dot(a, b) AS fast", s"${hofDot("a", "b")} AS slow")
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"$r")
    }
  }

  test("mixed float/double arrays and literal weight vectors work") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5, -1.0, 2.0))).toDF("f", "d")
    val v = df.selectExpr("graft_dot(f, d) AS x").head().getDouble(0)
    assert(v == 1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0)
    // literal array (double) against the float column
    val w = df.selectExpr(
      "graft_dot(f, array(CAST(2 AS DOUBLE), CAST(0 AS DOUBLE), CAST(-1 AS DOUBLE))) AS x")
      .head().getDouble(0)
    assert(w == 2.0 - 3.0)
  }

  test("null input yields null; bad types fail analysis") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    val df = Seq((Option.empty[Array[Float]], Array(1.0f))).toDF("a", "b")
    assert(df.selectExpr("graft_dot(a, b) AS x").head().isNullAt(0))
    val bad = intercept[Exception](
      Seq((1, 2)).toDF("a", "b").selectExpr("graft_dot(a, b)").head())
    assert(bad.getMessage.toLowerCase.contains("graft_dot") ||
      bad.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("null elements and length mismatches yield NULL like the HOF fold") {
    GraftFunctions.register(spark)
    // both interpreted eval (LocalTableScan) and the codegen path (range
    // source) must agree with zip_with's NULL-poisoning semantics
    val nullElem = spark.sql(
      "SELECT graft_dot(array(CAST(1 AS DOUBLE), CAST(NULL AS DOUBLE)), " +
        "array(CAST(1 AS DOUBLE), CAST(2 AS DOUBLE))) AS x")
    assert(nullElem.head().isNullAt(0), "null element must poison the dot")
    val shortArr = spark.sql(
      "SELECT graft_dot(array(CAST(1 AS DOUBLE)), " +
        "array(CAST(1 AS DOUBLE), CAST(2 AS DOUBLE))) AS x")
    assert(shortArr.head().isNullAt(0), "length mismatch must yield NULL")
    // codegen path: per-row arrays built from range
    val cg = spark.range(4).selectExpr(
      "graft_dot(transform(sequence(0, 2), d -> CASE WHEN d = 2 AND id = 1 " +
        "THEN CAST(NULL AS DOUBLE) ELSE CAST(d AS DOUBLE) END), " +
        "array(CAST(1 AS DOUBLE), CAST(1 AS DOUBLE), CAST(1 AS DOUBLE))) AS x")
      .collect()
    assert(cg.count(_.isNullAt(0)) == 1, "exactly the poisoned row is NULL")
    assert(cg.filter(!_.isNullAt(0)).forall(_.getDouble(0) == 3.0))
  }

  test("GraftExtensions installs graft_dot via spark.sql.extensions") {
    // spark.sql.extensions only applies at session CREATION — recycle the
    // context so the builder conf is honored (suites run sequentially in
    // the forked test JVM; later suites revive via TestSpark). Stop BOTH
    // the thread-local active session and the process default: a prior
    // suite's session may be default-only on this executor thread.
    org.apache.spark.sql.SparkSession.getActiveSession.foreach(_.stop())
    org.apache.spark.sql.SparkSession.getDefaultSession.foreach(_.stop())
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val v = s.sql(
        "SELECT graft_dot(array(CAST(2 AS DOUBLE), CAST(3 AS DOUBLE)), " +
          "array(CAST(4 AS DOUBLE), CAST(5 AS DOUBLE))) AS x").head().getDouble(0)
      assert(v == 2.0 * 4 + 3.0 * 5)
      // the extension route must carry the WHOLE builder surface — a name
      // resolvable via register() but not here silently breaks sessions
      // whose register() call short-circuits on the first already-present
      // name (the exact round-7 graft_bits regression)
      GraftFunctions.builders.foreach { case (name, _, _, _) =>
        assert(s.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
          s"extension session is missing $name")
      }
    } finally s.stop()
  }

  test("graft_bits/graft_from_bits: raw-bit round trip, NaN payloads, signed zero") {
    GraftFunctions.register(spark)
    val rows = spark.range(1).selectExpr(
      "graft_bits(CAST(1 AS DOUBLE)) AS one",          // 0x3FF0000000000000
      "graft_bits(CAST(-2 AS DOUBLE)) AS negTwo",      // sign bit + 0x4000...
      "graft_bits(CAST('-0.0' AS DOUBLE)) AS negZero", // just the sign bit
      "graft_from_bits(9221120237041090561) AS nanBack", // NaN w/ payload 1
      "graft_bits(graft_from_bits(9221120237041090561)) AS nanBits" // raw-preserved
    ).head()
    assert(rows.getLong(0) == java.lang.Double.doubleToRawLongBits(1.0))
    assert(rows.getLong(1) == java.lang.Double.doubleToRawLongBits(-2.0))
    assert(rows.getLong(2) == java.lang.Long.MIN_VALUE) // -0.0 = sign bit only
    assert(rows.getDouble(3).isNaN)
    // the payload survives the round trip — buffer semantics, not value
    assert(rows.getLong(4) == 9221120237041090561L)
  }

  test("FloatInspect ufuncs match java.lang.Math bit-for-bit") {
    GraftFunctions.register(spark)
    import graft.functions.{FloatInspect => F}
    // awkward magnitudes: subnormal-adjacent, powers of two (next-down
    // crosses the exponent boundary), negatives, and -0.0 sign handling
    val vals = Seq(1.0, 2.0, 0.5, 3.141592653589793, 1e-300, 123456.789,
      -1.0, -2.0, -0.75, -1e-10)
    val df = spark.createDataFrame(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }).toDF("idx", "v")
    val rows = df.selectExpr(
      "v",
      s"${F.nextUp("v")} AS nup",
      s"${F.nextDown("v")} AS ndn",
      s"${F.spacing("v")} AS sp",
      s"CAST(${F.signbit("v")} AS BIGINT) AS sb",
      s"${F.copysign("v", F.negZero)} AS csn",
      s"${F.copysign("v", "0.0")} AS csp",
      s"${F.ldexp("v", "7")} AS ld").collect()
    rows.foreach { r =>
      val v = r.getDouble(0)
      def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
      assert(bits(r.getDouble(1)) == bits(Math.nextUp(v)), s"nextUp($v)")
      assert(bits(r.getDouble(2)) == bits(Math.nextDown(v)), s"nextDown($v)")
      // numpy spacing: signed ulp (Math.ulp is the unsigned magnitude)
      assert(bits(r.getDouble(3)) == bits(if (v < 0) -Math.ulp(v) else Math.ulp(v)), s"spacing($v)")
      assert(r.getLong(4) == (if (bits(v) < 0) 1L else 0L), s"signbit($v)")
      assert(bits(r.getDouble(5)) == bits(Math.copySign(v, -0.0)), s"copysign($v,-0.0)")
      assert(bits(r.getDouble(6)) == bits(Math.copySign(v, 0.0)), s"copysign($v,0.0)")
      assert(r.getDouble(7) == v * 128.0, s"ldexp($v,7)")
    }
    // ±0.0 step to the signed minimal subnormals
    val z = spark.range(1).selectExpr(
      s"${F.nextUp("0.0")} AS a", s"${F.nextDown("0.0")} AS b").head()
    assert(z.getDouble(0) == java.lang.Double.MIN_VALUE)
    assert(z.getDouble(1) == -java.lang.Double.MIN_VALUE)
    // binary nextafter: steps toward y; equal pairs return Y (numpy) —
    // observable in the sign bit of the (+0.0, -0.0) pair
    val na = spark.range(1).selectExpr(
      s"graft_bits(${F.nextafter("0.0", F.negZero)}) AS zn",
      s"graft_bits(${F.nextafter(F.negZero, "0.0")}) AS zp",
      s"${F.nextafter("1.0", "2.0")} AS up",
      s"${F.nextafter("1.0", "0.0")} AS dn").head()
    assert(na.getLong(0) == java.lang.Long.MIN_VALUE) // -0.0
    assert(na.getLong(1) == 0L)                        // +0.0
    assert(na.getDouble(2) == Math.nextUp(1.0))
    assert(na.getDouble(3) == Math.nextDown(1.0))
  }

  test("besselI0 series: known values and symmetry") {
    GraftFunctions.register(spark)
    import graft.functions.{FloatInspect => F}
    val rows = spark.range(1).selectExpr(
      s"${F.i0("0.0")} AS z",
      s"${F.i0("1.0")} AS one",
      s"${F.i0("5.0")} AS five",
      s"${F.i0("(-5.0)")} AS mfive").head()
    assert(rows.getDouble(0) == 1.0)
    // reference values (Abramowitz & Stegun / scipy.special.i0)
    assert(math.abs(rows.getDouble(1) - 1.2660658777520084) < 1e-14)
    assert(math.abs(rows.getDouble(2) - 27.239871823604442) / 27.24 < 1e-13)
    assert(rows.getDouble(2) == rows.getDouble(3)) // even function
  }

  test("graft_bits stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val q = spark.range(100).selectExpr("graft_bits(CAST(id AS DOUBLE)) AS b")
    val plan = q.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_bits")).getOrElse("")
    assert(line.trim.startsWith("*"), s"graft_bits outside codegen:\n$plan")
    assert(q.where("b <> 0").count() == 99) // bits(0.0) == 0
  }

  test("graft_argmin_dot: first-minimum semantics, codegen/interpreted parity") {
    GraftFunctions.register(spark)
    val sp = spark
    import sp.implicits._
    // deterministic small grid; candidates as a literal-ish projected array
    val df = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(9)(d => ((i * 31 + d * 7) % 13 - 6).toDouble))
    }.toDF("id", "q")
    val cands = "array(" + (0 until 16).map { c =>
      "array(" + (0 until 9).map(d => s"CAST(${(c * 17 + d * 5) % 11 - 5} AS DOUBLE)")
        .mkString(", ") + ")"
    }.mkString(", ") + ")"
    // oracle: the r12 least/when cascade semantics — smallest index whose
    // score <= min of every later score (ascending-fold dots)
    val rows = df.selectExpr("id", "q", s"graft_argmin_dot(q, $cands) AS fast").collect()
    val candVals = Array.tabulate(16, 9)((c, d) => ((c * 17 + d * 5) % 11 - 5).toDouble)
    rows.foreach { r =>
      val q = r.getSeq[Double](1).toArray
      val scores = candVals.map(cv => cv.zip(q).map { case (y, x) => x * y }
        .foldLeft(0.0)(_ + _))
      val want = scores.indices.minBy(i => (scores(i), i))
      assert(r.getInt(2) == want, s"id=${r.getLong(0)} scores=${scores.mkString(",")}")
    }
    // ties resolve to the LOWEST index (duplicate candidates)
    val tie = spark.sql(
      "SELECT graft_argmin_dot(array(1.0D, 2.0D), " +
        "array(array(9.0D, 9.0D), array(3.0D, 6.0D), array(3.0D, 6.0D))) AS i")
      .head().getInt(0)
    assert(tie == 1, "equal-score candidates must pick the first")
    // NULL contract: null input, null candidate row, null element,
    // length mismatch, empty candidate list — all NULL
    Seq(
      "graft_argmin_dot(CAST(NULL AS ARRAY<DOUBLE>), array(array(1.0D)))",
      "graft_argmin_dot(array(1.0D), CAST(NULL AS ARRAY<ARRAY<DOUBLE>>))",
      "graft_argmin_dot(array(1.0D), array(CAST(NULL AS ARRAY<DOUBLE>)))",
      "graft_argmin_dot(array(1.0D), array(array(CAST(NULL AS DOUBLE))))",
      "graft_argmin_dot(array(1.0D), array(array(1.0D, 2.0D)))",
      "graft_argmin_dot(array(1.0D), CAST(array() AS ARRAY<ARRAY<DOUBLE>>))").foreach { e =>
      assert(spark.sql(s"SELECT $e AS i").head().isNullAt(0), e)
    }
  }

  test("graft_argmin_dot stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // q is referenced twice so CollapseProject keeps the (fallback-HOF)
    // transform in its own projection — same trick as the graft_dot test
    val df = spark.range(100).selectExpr(
      "id", "transform(sequence(0, 8), d -> CAST(id + d AS DOUBLE)) AS q")
    val cands = "array(" +
      "array(" + Seq.fill(9)("1.0D").mkString(", ") + "), " +
      "array(" + Seq.fill(9)("-1.0D").mkString(", ") + "))"
    val q = df.selectExpr(
      s"graft_argmin_dot(q, $cands) AS c", "graft_dot(q, q) AS d2")
    val plan = q.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_argmin_dot")).getOrElse("")
    assert(line.trim.startsWith("*"), s"graft_argmin_dot outside codegen:\n$plan")
    assert(q.where("c = 1").count() == 100) // the all-(−1) candidate always wins
  }

  test("graft_dot stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // range source so ConvertToLocalRelation can't fold the plan away
    val df = spark.range(100).selectExpr(
      "id", "transform(sequence(0, 7), d -> CAST(id + d AS FLOAT)) AS e")
    val q = df.selectExpr("graft_dot(e, e) AS x")
    val plan = q.queryExecution.executedPlan.toString
    // the '*' stage marker = operator runs inside WholeStageCodegen
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).getOrElse("")
    assert(dotLine.trim.startsWith("*"), s"graft_dot outside codegen:\n$plan")
    assert(q.agg(org.apache.spark.sql.functions.sum("x")).head().getDouble(0) > 0)
  }

  test("mapTyped/zipTyped lift arbitrary lambdas (frompyfunc analogue)") {
    val s = spark
    val a = graft.DArray.arange(s, "/unused", 0, 20, 1)
    val f: Double => Double = v => if (v % 3.0 == 0.0) v * v else -v
    val got = a.mapTyped(f).elements.orderBy("idx")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    got.foreach { case (i, v) => assert(v == f(i.toDouble), s"idx $i") }
    val g: (Double, Double) => Double = (x, y) => x * 2 + y
    val both = a.mapTyped(f).zipTyped(a, g).elements.orderBy("idx")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    both.foreach { case (i, v) => assert(v == g(f(i.toDouble), i.toDouble), s"idx $i") }
  }

  test("typed kernels are registered once per lambda instance") {
    val s = spark
    val f: Double => Double = _ + 1.5
    val a = graft.DArray.arange(s, "/unused", 0, 5, 1)
    // same instance twice -> same kernel SQL text (content-addressed
    // expression trees stay stable across query re-construction)
    val k1 = a.mapTyped(f).exprTree.toString
    val k2 = a.mapTyped(f).exprTree.toString
    assert(k1 == k2)
    assert(a.mapTyped(f).elements.collect().map(_.getDouble(1)).sum == 0 + 1 + 2 + 3 + 4 + 5 * 1.5)
  }

  test("TextSig kernel indexes CODE POINTS (SQL substring/ascii parity on non-BMP)") {
    // Spark SQL substring()/length()/ascii() index code points (probed:
    // ascii('🍕') = 127829, substring('a🍕b', 2, 1) = '🍕'), as does
    // DuckDB — a charAt-based kernel would hash UTF-16 halves of every
    // surrogate pair and desync both gates on non-BMP text
    val text = "a🍕b🍕c" // a🍕b🍕c — 5 code points, 7 chars
    val row = graft.functions.TextSig.sig(7L, text)
    val fpSql = spark.sql(
      s"SELECT aggregate(sequence(1, length('$text')), CAST(0 AS BIGINT), " +
        s"(acc, i) -> (acc * 31 + ascii(substring('$text', i, 1))) % 1000003) AS fp")
      .head().getLong(0)
    assert(row.fp == fpSql, s"rolling fp ${row.fp} != SQL twin $fpSql")
    val tri1 = spark.sql(
      s"SELECT CAST(ascii(substring('$text', 1, 1)) * 961 + " +
        s"ascii(substring('$text', 2, 1)) * 31 + " +
        s"ascii(substring('$text', 3, 1)) AS BIGINT)")
      .head().getLong(0)
    assert(row.dhl.head.toLong == tri1, s"trigram ${row.dhl.head} != SQL twin $tri1")
  }

  test("typed kernels: non-capturing lambdas dedup by class, capturing by instance") {
    val s = spark
    val a = graft.DArray.arange(s, "/unused", 0, 5, 1)
    // a fresh NON-capturing instance per call (the inline-lambda usage
    // pattern, e.g. a bench query re-constructed every run) must land
    // on ONE kernel — its class has no captured state to differ by
    def freshNonCapturing: Double => Double = v => v * 3.0 + 7.0
    val n1 = a.mapTyped(freshNonCapturing).exprTree.toString
    val n2 = a.mapTyped(freshNonCapturing).exprTree.toString
    assert(n1 == n2, s"fresh non-capturing instances re-registered: $n1 vs $n2")
    // CAPTURING instances of the same class close over different values
    // — deduping them by class would silently run the first closure
    def capturing(k: Double): Double => Double = v => v + k
    val c1 = a.mapTyped(capturing(10.0))
    val c2 = a.mapTyped(capturing(20.0))
    assert(c1.exprTree.toString != c2.exprTree.toString,
      "capturing lambdas with different environments must be distinct kernels")
    assert(c1.elements.orderBy("idx").collect().map(_.getDouble(1)).toSeq ==
      Seq(10.0, 11.0, 12.0, 13.0, 14.0))
    assert(c2.elements.orderBy("idx").collect().map(_.getDouble(1)).toSeq ==
      Seq(20.0, 21.0, 22.0, 23.0, 24.0))
  }
}
