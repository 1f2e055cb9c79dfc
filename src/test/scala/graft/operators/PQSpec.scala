package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Drift guard: the PQ codebook weight exists twice by necessity — a JVM
  * value ([[EmbeddingQueries.pqWeight]], driving the encode kernel) and a
  * SQL fragment ([[EmbeddingQueries.pqW]], driving the ADC score and both
  * DuckDB oracles). This pins them to the same algebra over the full
  * (sub, code, dim) domain so an edit to one cannot silently desync the
  * other. */
class PQSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = spark.stop()

  test("pqW SQL fragment equals pqWeight for every (sub, code, dim)") {
    val exprs = for {
      sub <- 0 until 8; c <- 0 until 16; d <- 0 until 8
    } yield EmbeddingQueries.pqW(sub, c.toString, d.toString)
    val row = spark.range(1).selectExpr(exprs: _*).collect()(0)
    var i = 0
    for (sub <- 0 until 8; c <- 0 until 16; d <- 0 until 8) {
      val sqlVal = row.get(i) match {
        case l: java.lang.Long    => l.toInt
        case n: java.lang.Integer => n.toInt
        case other                => fail(s"unexpected type $other")
      }
      assert(sqlVal == EmbeddingQueries.pqWeight(sub, c, d),
        s"drift at sub=$sub c=$c d=$d")
      i += 1
    }
  }

  test("fused-dot centroid literals keep the generated code iteration-stable") {
    // the e14 Lloyd loop re-plans each iteration with NEW centroid
    // values. The fused form — dot([p,1], [−2G·m, ||m||²]) with the
    // operand folded out of element_at(typedLit(...), idx) — keeps
    // every per-iteration value in the codegen REFERENCES array, so
    // the generated source is byte-identical across iterations and
    // janino's cache serves every iteration after the first. A SCALAR
    // element_at (the r9 form for ||m||²) instead constant-folds to an
    // inline `…D` literal and recompiles the projection every
    // iteration — pinned as the negative case below.
    import org.apache.spark.sql.functions._
    val s = spark
    graft.functions.GraftFunctions.register(s)
    def gen(df: org.apache.spark.sql.DataFrame): String = {
      val txt = org.apache.spark.sql.execution.debug.codegenString(
        df.queryExecution.executedPlan)
      // keep ONLY the generated java lines (prefixed "/* NNN */") —
      // the subtree headers embed session-cumulative compile metrics
      // and the plan snippet embeds per-query expression ids, both of
      // which differ run to run without the CODE differing
      txt.linesIterator.filter(_.matches("""^/\* \d+ \*/.*"""))
        .mkString("\n")
    }
    def base = s.range(64).selectExpr(
      "transform(sequence(1, 16), i -> CAST(i + id AS DOUBLE)) AS pD")
    def fusedPlan(cents: Seq[Seq[Double]]) = {
      val cl = typedLit(cents)
      base.select((0 until 4).map { i =>
        call_function("graft_dot",
          concat(slice(col("pD"), i * 4 + 1, 4), array(lit(1.0))),
          element_at(cl, i + 1)).as(s"s$i")
      }: _*)
    }
    val a = gen(fusedPlan(Seq.tabulate(4, 5)((i, j) => (i * 4 + j).toDouble)))
    val b = gen(fusedPlan(Seq.tabulate(4, 5)((i, j) => (i * 7 + j * 3 + 100).toDouble)))
    if (a != b) {
      a.linesIterator.zip(b.linesIterator).zipWithIndex.foreach { case ((x, y), n) =>
        if (x != y) info(s"DIFF $n: |$x| vs |$y|") }
    }
    assert(a == b, "generated code must not embed centroid values")
    // the r13 e14 shape: ONE graft_argmin_dot kernel per subspace, the
    // candidate table a slice of the array literal — the slice folds to
    // another array literal that rides references, so iteration N's plan
    // generates byte-identical code (and the generated method is two
    // small loops, not 128 dot columns — the r12 code-cache-pressure fix)
    def argminPlan(cents: Seq[Seq[Double]]) = {
      val cl = typedLit(cents)
      base.select((0 until 2).map { sub =>
        call_function("graft_argmin_dot",
          concat(slice(col("pD"), sub * 8 + 1, 8), array(lit(1.0))),
          slice(cl, sub * 2 + 1, 2)).as(s"c$sub")
      }: _*)
    }
    val a2 = gen(argminPlan(Seq.tabulate(4, 9)((i, j) => (i * 9 + j).toDouble)))
    val b2 = gen(argminPlan(Seq.tabulate(4, 9)((i, j) => (i * 3 + j * 5 + 40).toDouble)))
    assert(a2 == b2, "argmin-dot generated code must not embed centroid values")

    // negative control: a scalar element_at folds to an inline literal
    def scalarPlan(m2: Seq[Double]) = {
      val ml = typedLit(m2)
      base.select((0 until 4).map(i => (element_at(ml, i + 1) +
        element_at(col("pD"), 1)).as(s"s$i")): _*)
    }
    assert(gen(scalarPlan(Seq(1.0, 2.0, 3.0, 4.0))) !=
      gen(scalarPlan(Seq(9.0, 8.0, 7.0, 6.0))),
      "scalar literals are expected to inline — if Spark stops folding " +
        "them, the fused-dot rationale should be re-examined")
  }
}
