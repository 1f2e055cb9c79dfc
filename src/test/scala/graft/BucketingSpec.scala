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
  private var dataDir: String = _

  override def beforeAll(): Unit = {
    // A sibling suite may already own this JVM's session, in which case
    // getOrCreate IGNORES builder configs — so take a dedicated
    // newSession (isolates runtime conf, temp views, and the function
    // registry; the EXTERNAL catalog stays JVM-shared, which is why the
    // table names below are suite-prefixed and dropped in afterAll), set
    // the runtime-settable knobs explicitly, and write EXTERNAL tables
    // under a temp path so the shared static warehouse dir never matters.
    val base = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .appName("BucketingSpec")
      .getOrCreate()
    spark = base.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // force sort-merge so an elided exchange is provably the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.setLogLevel("ERROR")
    dataDir = Files.createTempDirectory("graft-bucketed").toString
  }
  // the SparkContext is shared with sibling suites — do NOT stop it;
  // just drop this suite's tables from the (session-scoped) catalog
  override def afterAll(): Unit =
    Seq("bk_a", "bk_b", "bk_c").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("co-located join on matching buckets plans ZERO exchanges") {
    val a = spark.range(0, 10000).selectExpr("id % 500 AS k", "id AS a")
    val b = spark.range(0, 5000).selectExpr("id % 500 AS k", "id AS b")
    Bucketed.writeBucketed(a, "bk_a", "k", 8, Some(s"$dataDir/bk_a"))
    Bucketed.writeBucketed(b, "bk_b", "k", 8, Some(s"$dataDir/bk_b"))
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

  test("e18 bucketed IVF serve: corpus side exchange-free (probe side only)") {
    // build the index table from the sf0.001 corpus, then check the
    // batch-serving shape: with broadcast disabled (this suite's
    // session), joining an UNBUCKETED probe set against the cells on
    // `label` must shuffle ONLY the probe side — the corpus scan
    // satisfies the hash distribution from its buckets
    val sf = "/root/testdata/sf0.001"
    val t = graft.operators.EmbeddingQueries.ivfBucketedTable(spark, sf)
    val cells = spark.table(t)
    // label must match the table's INT type exactly — a widening CAST
    // on the bucket key makes the planner disable bucketed reads
    val probes = spark.range(64).selectExpr("CAST(id % 8 AS INT) AS label", "id AS qid")
    val j = probes.join(cells, "label")
    val plan = j.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllMatchIn(plan).size
    assert(exchanges == 1, s"expected exactly the probe-side exchange:\n$plan")
    // and per-cell stats read straight off the buckets
    val agg = cells.groupBy("label").count()
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    val want = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label").distinct().count()
    assert(agg.count() == want, s"cell count ${agg.count()} != $want")
  }

  test("mismatched bucket counts fall back to a shuffled join (sanity)") {
    val c = spark.range(0, 1000).selectExpr("id % 100 AS k", "id AS c")
    Bucketed.writeBucketed(c, "bk_c", "k", 4, Some(s"$dataDir/bk_c"))
    val j = spark.table("bk_a").join(spark.table("bk_c"), "k")
    val plan = j.queryExecution.executedPlan.toString
    // one side re-shuffles (or both, depending on AQE) — the point is the
    // zero-exchange guarantee above is NOT vacuous
    assert(plan.contains("Exchange"), s"expected a shuffle somewhere:\n$plan")
  }
}
