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
}
