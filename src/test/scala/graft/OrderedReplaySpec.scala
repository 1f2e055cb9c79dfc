package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.StreamQueries

/** Replay-order determinism — the r11 verdict's one red oracle row.
  *
  * s03_stream_packing replays an ORDER-SENSITIVE stateful op (the
  * running-offset sequence packer) and is only correct if the staged
  * ranges arrive as micro-batches in range order. The old harness pinned
  * that order through `File.setLastModified` + the file source's mtime
  * sort — which silently randomized on any box whose filesystem ignores
  * the stamp (the source's tie-break on equal mtimes is directory-listing
  * order: readdir hash order on ext4). The rebuilt
  * `replayOrderedToCompletion` publishes each staged file only after a
  * `processAllAvailable()` barrier confirms the previous file's batches
  * committed, so batch order equals publish order BY CONSTRUCTION.
  *
  * This spec drives the point adversarially: the test hook stamps every
  * published file with strictly DECREASING mtimes (stamped on the hidden
  * temp file BEFORE its atomic publish rename, so there is no
  * stamp-after-visible race). Under the old mtime-ordered harness the
  * ranges would replay in reverse and every cross-batch carry would land
  * in the wrong bin; under the arrival-barrier harness the output must
  * still equal the batch packing in range order. */
class OrderedReplaySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

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

  /** The batch truth s03 must reproduce: per source in doc_id order, a
    * doc's bin is (running token offset before it) DIV 2048 — computed
    * here independently, in plain Scala, from the raw corpus. */
  private def batchPacking(): Seq[(String, Long, Long, Long)] = {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    rows.groupBy(_._1).toSeq.flatMap { case (src, docs) =>
      var off = 0L
      docs.sortBy(_._2).map { case (_, id, text) =>
        val nt = text.split(" ", -1).length.toLong
        val bin = off / 2048L
        off += nt
        (src, id, nt, bin)
      }
    }.sortBy(t => (t._1, t._2))
  }

  test("ordered replay packs in range order even under inverted mtimes") {
    // decreasing stamps: a harness that ordered batches by mtime would
    // replay range 3 first and shift every carry
    StreamQueries.testPublishStamp = Some(k => 1800000000000L - k * 60000L)
    try {
      val got = StreamQueries.queries("s03_stream_packing")(spark, sfDir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      val want = batchPacking()
      assert(got == want,
        s"replay diverged from batch packing under inverted mtimes; " +
          s"first diff: ${got.zip(want).find { case (a, b) => a != b }}")
    } finally StreamQueries.testPublishStamp = None
  }
}
