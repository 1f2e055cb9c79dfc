package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** t33 BPE training — the iteration-plan and merge-semantics pins.
  *
  * The trainer runs K rounds, each re-planning the pair-count stage with
  * the merges learned so far. The e14 lesson applies verbatim: if the
  * per-round values leaked into the generated source as folded literals,
  * every round would janino-recompile the projection; routed through an
  * array-typed literal they ride the references array and all K rounds
  * share one compiled plan. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def words(ws: (String, Long)*) = {
    val sp = spark
    import sp.implicits._
    ws.toSeq.toDF("w", "freq")
  }

  /** Generated-java lines only (the PQSpec filter): subtree headers
    * embed session-cumulative compile metrics and per-query expression
    * ids that differ run to run without the CODE differing. */
  private def gen(df: org.apache.spark.sql.DataFrame): String =
    org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
      .linesIterator.filter(_.matches("""^/\* \d+ \*/.*"""))
      .mkString("\n")

  test("pair-count plan codegen is identical across merge tables and depths") {
    val w = words("hello" -> 3L, "world" -> 2L)
    val a = gen(TextQueries.bpePairCounts(w, Seq((" l  l ", " ll "))))
    val b = gen(TextQueries.bpePairCounts(w, Seq((" o  r ", " or "))))
    val c = gen(TextQueries.bpePairCounts(w,
      Seq((" l  l ", " ll "), (" ll  o ", " llo "), (" h  e ", " he "))))
    assert(a == b, "generated code must not embed merge strings")
    assert(a == c, "generated code must not depend on the merge count")
  }

  /** The padded-double-space `replace` must implement the greedy
    * left-to-right non-overlapping merge rule of published BPE trainers
    * — consecutive pairs both merge, overlapping runs merge greedily,
    * non-adjacent symbols never do. */
  test("merge application is greedy left-to-right, boundary-exact") {
    def tokens(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val r = TextQueries.bpePairCounts(words(word -> 1L), merges)
      // recover the representation instead: apply the same fold directly
      val row = words(word -> 1L)
        .withColumn("_m", typedLit(merges))
        .selectExpr(s"aggregate(_m, ${TextQueries.bpeBaseSql}, " +
          "(acc, m) -> replace(acc, m._1, m._2)) AS r")
        .head()
      r.count() // force the count plan too (smoke: it must not throw)
      row.getString(0).trim.split("  ").toSeq
    }
    val ab = Seq((" a  b ", " ab "))
    assert(tokens("abab", ab) == Seq("ab", "ab"), "consecutive pairs both merge")
    assert(tokens("aabb", ab) == Seq("a", "ab", "b"), "single interior match")
    val aa = Seq((" a  a ", " aa "))
    assert(tokens("aaa", aa) == Seq("aa", "a"), "overlap resolves greedily left")
    assert(tokens("aaaa", aa) == Seq("aa", "aa"), "even run pairs fully")
    val stacked = Seq((" a  b ", " ab "), (" ab  ab ", " abab "))
    assert(tokens("abab", stacked) == Seq("abab"), "merged symbols re-merge")
  }

  test("two training rounds on a tiny corpus match the hand-computed merges") {
    // corpus: "abab" ×3, "abc" ×2 → pair counts round 1:
    //   (a,b): 2·3 + 1·2 = 8 ; (b,a): 1·3 = 3 ; (b,c): 2 → merge "a b"
    // round 2 (after ab): (ab,ab): 3 ; (ab,c): 2 → merge "ab ab"
    val w = words("abab" -> 3L, "abc" -> 2L)
    val r1 = TextQueries.bpePairCounts(w, Nil)
      .orderBy(desc("cnt"), col("p")).head()
    assert((r1.getString(0), r1.getLong(1)) == (("a b", 8L)), s"round 1: $r1")
    val r2 = TextQueries.bpePairCounts(w, Seq((" a  b ", " ab ")))
      .orderBy(desc("cnt"), col("p")).head()
    assert((r2.getString(0), r2.getLong(1)) == (("ab ab", 3L)), s"round 2: $r2")
  }
}
