package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.Bucketed

/** Bucketed tables make repeated joins/aggs on the bucket key
  * exchange-free — the persisted-partitioning half of the scale story
  * (the other half, runtime co-partitioning, is asserted all over
  * QuerySpec/MatrixSpec). */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      // force sort-merge so an elided exchange is provably the bucketing
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .appName("BucketingSpec")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = spark.stop()

  test("co-located join on matching buckets plans ZERO exchanges") {
    val a = spark.range(0, 10000).selectExpr("id % 500 AS k", "id AS a")
    val b = spark.range(0, 5000).selectExpr("id % 500 AS k", "id AS b")
    Bucketed.writeBucketed(a, "bk_a", "k", 8)
    Bucketed.writeBucketed(b, "bk_b", "k", 8)
    val j = Bucketed.coLocatedJoin(spark, "bk_a", "bk_b", "k")
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free join:\n$plan")
    // and it is the right join: row count = sum over k of n_a(k)*n_b(k)
    assert(j.count() == 10000L / 500 * (5000L / 500) * 500)
  }

  test("aggregation on the bucket key reuses the bucketing (no exchange)") {
    val agg = spark.table("bk_a").groupBy("k").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free agg:\n$plan")
    assert(agg.count() == 500)
  }

  test("mismatched bucket counts fall back to a shuffled join (sanity)") {
    val c = spark.range(0, 1000).selectExpr("id % 100 AS k", "id AS c")
    c.write.bucketBy(4, "k").mode("overwrite").format("parquet").saveAsTable("bk_c")
    val j = spark.table("bk_a").join(spark.table("bk_c"), "k")
    val plan = j.queryExecution.executedPlan.toString
    // one side re-shuffles (or both, depending on AQE) — the point is the
    // zero-exchange guarantee above is NOT vacuous
    assert(plan.contains("Exchange"), s"expected a shuffle somewhere:\n$plan")
  }
}
