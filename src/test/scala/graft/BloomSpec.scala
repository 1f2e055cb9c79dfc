package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bloom

/** Bloom-prefiltered decontamination (`functions/Bloom.scala`): the
  * result must be EXACTLY the anti-join — false positives re-checked,
  * false negatives impossible — and the definite-negative branch must
  * plan with no join at all (that's the 100 TB story: the blob is a
  * scan-side literal predicate, only the might-sliver shuffles). */
class BloomSpec extends AnyFunSuite {
  import TestSpark.spark

  // range-backed (not a LocalRelation) so filters survive to the
  // physical plan instead of being folded into a LocalTableScan
  private def corpus(n: Int) =
    spark.range(n).selectExpr("id AS doc_id",
      s"concat('doc text number ', id % ${n / 2}) AS text")

  test("decontaminate equals the exact anti-join, including forced false positives") {
    val all = corpus(400) // texts repeat with period 200 → real overlap
    val train = all.where("doc_id % 7 <> 3")
    val eval = all.where("doc_id % 7 = 3")
    // 64-bit blob → false-positive rate near 1: every row takes the
    // confirm path, so exactness there is genuinely exercised
    for (fpp <- Seq(0.9, 0.01)) {
      val got = Bloom.decontaminate(train, eval, "text", expectedEval = 4, fpp = fpp)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      val want = train.join(eval.select("text").distinct(), Seq("text"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"fpp=$fpp: ${got.size} vs ${want.size}")
      assert(want.nonEmpty && want.size < train.count(), "test needs real overlap")
    }
  }

  test("NULL keys survive: NULL never matches an eval key, even a NULL one") {
    // xxhash64 is NON-nullable (NULL input leaves the fold at its seed),
    // so without the explicit guards a NULL train key and a NULL eval key
    // hash EQUAL and the confirm pair-join drops rows the raw-key
    // anti-join semantics keep — the regression the r11 hash-pair keying
    // introduced and this test pins closed
    val withNulls = corpus(200).selectExpr(
      "doc_id", "CASE WHEN doc_id % 50 = 7 THEN NULL ELSE text END AS text")
    val train = withNulls.where("doc_id % 7 <> 3") // contains NULL-text rows
    val eval = withNulls.where("doc_id % 7 = 3")   // also contains NULL-text rows
    assert(train.where("text IS NULL").count() > 0 &&
      eval.where("text IS NULL").count() > 0, "fixture needs NULLs on both sides")
    val got = Bloom.decontaminate(train, eval, "text", expectedEval = 16, fpp = 0.9)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = train.join(eval.select("text").distinct(), Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, s"${got.size} vs ${want.size}")
    val keptNulls = Bloom.decontaminate(train, eval, "text", 16, 0.9)
      .where("text IS NULL").count()
    assert(keptNulls == train.where("text IS NULL").count(),
      "every NULL-key train row must be kept")
  }

  test("empty eval set passes everything through unchanged") {
    val train = corpus(50)
    val kept = Bloom.decontaminate(train, train.where("false"), "text", 16)
    assert(kept.count() == 50)
  }

  test("the definite-negative branch plans without any join") {
    val all = corpus(200)
    val train = all.where("doc_id % 7 <> 3")
    val eval = all.where("doc_id % 7 = 3")
    val planned = Bloom.decontaminate(train, eval, "text", expectedEval = 64)
    val planText = planned.queryExecution.executedPlan.toString
    // exactly ONE join operator in the whole plan — the confirm branch;
    // the clean branch filters on the blob literal with no join
    val joinOps = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
      .r.findAllIn(planText).length
    assert(joinOps == 1, s"expected exactly one join, got $joinOps:\n${planText.take(3000)}")
    // and the blob predicate is present as a scan-side filter
    assert(planText.toLowerCase.contains("might_contain"), planText.take(2000))
  }
}
