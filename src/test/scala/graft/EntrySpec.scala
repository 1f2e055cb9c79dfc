package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: `SparkEntry.entry` on sf0.001 must
  * return rows (the flagship query). */
class EntrySpec extends AnyFunSuite {
  test("SparkEntry.entry returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
