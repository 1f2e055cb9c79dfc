package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** asof / rangeJoin — edge semantics and the scale-shape pins. */
class JoinOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = spark.stop()

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  test("asof: latest at-or-before payload attaches; no prior right -> NULL") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, ts(1), 10L), (1L, ts(5), 11L), (1L, ts(9), 12L),
      (2L, ts(4), 20L))
      .toDF("k", "t", "id")
    val right = Seq((1L, ts(3), 0.5), (1L, ts(5), 0.7), (2L, ts(9), 0.9))
      .toDF("k", "t", "v")
    val got = JoinOps.asof(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(got(10L) == None, "left row before any right must get NULL")
    assert(got(11L) == Some(0.7), "an exactly-simultaneous right row is visible")
    assert(got(12L) == Some(0.7), "latest at-or-before, not just any earlier")
    assert(got(20L) == None, "keys never leak payloads across each other")
  }

  test("asof attaches ONE right row atomically — NULL payload fields never tear") {
    // right rows: ts=1 has (v1=5, v2=NULL); ts=2 has (v1=NULL, v2=7).
    // The match for a left row at ts=3 is the ts=2 ROW — (NULL, 7), as
    // DuckDB's ASOF yields. A per-column last(ignoreNulls) would reach
    // back to ts=1 for v1 alone and assemble the torn row (5, 7).
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, ts(3), 10L)).toDF("k", "t", "id")
    val right = Seq((1L, ts(1), Some(5.0), Option.empty[Double]),
      (1L, ts(2), Option.empty[Double], Some(7.0)))
      .toDF("k", "t", "v1", "v2")
    val r = JoinOps.asof(left, right, "k", "t", Seq("v1", "v2")).head()
    assert(r.isNullAt(3) && r.getDouble(4) == 7.0,
      s"payloads must come from the single matched right row, got $r")
  }

  test("asof plans ONE exchange and ONE window for any payload width") {
    val sp = spark
    import sp.implicits._
    val left = sp.range(100).selectExpr("id % 7 AS k",
      "timestamp_seconds(id) AS t", "id")
    val right = sp.range(50).selectExpr("id % 7 AS k",
      "timestamp_seconds(id * 2) AS t", "CAST(id AS DOUBLE) AS v1",
      "CAST(id * 3 AS DOUBLE) AS v2")
    val plan = JoinOps.asof(left, right, "k", "t", Seq("v1", "v2"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"asof must shuffle exactly once:\n$plan")
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1,
      "same-frame payload windows must collapse into one Window node")
    assert(!plan.contains("CartesianProduct"))
  }

  test("rangeJoin: exactly-once pairs across band boundaries, no cartesian") {
    val sp = spark
    import sp.implicits._
    // width 10s; pairs that straddle a band edge (8s->12s) must appear
    // exactly once, in-band pairs once, out-of-range never
    val ev = Seq((1L, ts(8), 1L), (1L, ts(12), 2L), (1L, ts(17), 3L),
      (1L, ts(40), 4L), (2L, ts(9), 5L))
      .toDF("k", "t", "id")
    val l = ev.selectExpr("k", "t", "id AS a")
    val r = ev.selectExpr("k", "t", "id AS b")
    val df = JoinOps.rangeJoin(l, r, "k", "t", widthUs = 10000000L,
      lOut = Seq("a"), rOut = Seq("b"))
      .where("a <> b")
    val got = df.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got.size == got.distinct.size, s"duplicate pairs: $got")
    assert(got.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"pair set wrong: $got")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "banding must equi-join")
  }
}
