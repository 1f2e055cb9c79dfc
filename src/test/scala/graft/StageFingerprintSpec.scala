package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.StreamQueries

/** Staged-replay corpus fingerprinting (r13 verdict #3 / "next" #3).
  *
  * `stageOnce` memoizes a replay gate's staged corpus on disk behind a
  * `_STAGED_OK` marker that survives JVMs and driver rounds. Until r14
  * the key was (gate | corpus dir | nFiles | version) — a corpus
  * REGENERATED under the same path silently replayed the stale staged
  * bytes in every streaming gate: rows would match, hashes wouldn't
  * (exactly the class of the recurrent s03 driver red, and exactly the
  * bug the r12 ADVICE had flagged — fixed in `modelCache`, missed in
  * `stageOnce`). The key now folds in a CONTENT fingerprint of the
  * corpus directory (per-file path/size/mtime), so regeneration forces
  * a re-stage. This spec regenerates a corpus in place and asserts the
  * replay sees the new data. */
class StageFingerprintSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = spark.stop()

  private def writeCorpus(dir: String, lo: Int): Unit = {
    val sp = spark
    import sp.implicits._
    (lo until lo + 4).map(i => (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), i))
      .toDF("ts", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/table.parquet")
  }

  test("dirFingerprint changes when a corpus file is rewritten in place") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fpspec_").toString
    writeCorpus(dir, 1)
    val fp1 = StreamQueries.dirFingerprint(dir)
    assert(fp1.nonEmpty)
    Thread.sleep(5) // ensure a distinct mtime even on coarse clocks
    writeCorpus(dir, 100)
    assert(StreamQueries.dirFingerprint(dir) != fp1,
      "regenerating the corpus must change the fingerprint")
  }

  test("a corpus regenerated in place forces a re-stage of the replay corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fpspec2_").toString
    def replayValues(): Set[Int] = {
      val src = spark.read.parquet(s"$dir/table.parquet")
      StreamQueries.replayToCompletion(spark, src, nFiles = 2,
        stageKey = s"fpspec|$dir", corpusDir = dir)(st => st)
        .collect().map(_.getInt(1)).toSet
    }
    writeCorpus(dir, 1)
    assert(replayValues() == Set(1, 2, 3, 4))
    Thread.sleep(5)
    writeCorpus(dir, 100)
    // under the old key the on-disk _STAGED_OK marker (and the in-JVM
    // memo) would replay the stale bytes and return 1..4 here
    assert(replayValues() == Set(100, 101, 102, 103),
      "replay must re-stage after the corpus is regenerated in place")
  }
}
