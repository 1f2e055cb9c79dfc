package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[GraphOps.connectedComponents]] — correctness on adversarial shapes
  * and the logarithmic-round bound that makes it viable at scale. */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark

  private def edges(pairs: (Long, Long)*) = {
    val s = spark // stable identifier for the implicits import
    import s.implicits._
    pairs.toDF("a", "b")
  }

  private def components(pairs: (Long, Long)*): Map[Long, Long] =
    GraphOps.connectedComponents(edges(pairs: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint components get their min ids as labels") {
    val c = components((5L, 3L), (3L, 9L), (20L, 21L))
    assert(c == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("chain graph converges (pointer jumping beats O(diameter))") {
    // a 64-node path — sorted-neighborhood LSH produces exactly this
    // shape; plain neighbor-min would need 63 rounds, the jumping step
    // must close it within the 25-round bound
    val path = (0L until 63L).map(i => (i, i + 1))
    val c = components(path: _*)
    assert(c.size == 64 && c.values.forall(_ == 0L))
  }

  test("star, cycle and self-contained cluster shapes") {
    val star = (1L to 10L).map(i => (100L, 100L + i))
    val cycle = Seq((200L, 201L), (201L, 202L), (202L, 203L), (203L, 200L))
    val c = components(star ++ cycle: _*)
    assert(c.filter(_._1 >= 200L).values.toSet == Set(200L))
    assert(c.filter(_._1 < 200L).values.toSet == Set(100L))
  }

  test("reliable=true: DFS checkpoints against a checkpoint dir (cluster mode)") {
    // the executor-loss-safe path a real cluster uses: reliable
    // checkpoints write to the checkpoint dir instead of executor-local
    // block storage — verify the rounds run and converge through it
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    try {
      spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
      val path = (0L until 16L).map(i => (i, i + 1))
      val c = GraphOps.connectedComponents(edges(path: _*), reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(c.size == 17 && c.values.forall(_ == 0L))
      // the reliable run actually materialized checkpoint data on disk
      assert(dir.listFiles != null && dir.listFiles.nonEmpty,
        "no checkpoint data written to the checkpoint dir")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  test("leakage split invariant: no edge ever crosses the train/val boundary") {
    // the t35 rule: side = (component label % 10 == 0) ? val : train.
    // Any edge's endpoints share a component ⇒ share a label ⇒ share a
    // side — pin it over a messy multi-component graph whose labels
    // land on BOTH sides of the % 10 rule (components 3, 20, 40: 20 and
    // 40 are val, 3 is train — so a label-propagation bug that merged
    // or split a component would surface as a crossing edge).
    val pairs = Seq((5L, 3L), (3L, 9L), (9L, 47L), (20L, 21L),
      (40L, 41L), (41L, 44L), (44L, 40L))
    val c = components(pairs: _*)
    def side(id: Long) = if (c(id) % 10 == 0) "val" else "train"
    val crossing = pairs.filter { case (a, b) => side(a) != side(b) }
    assert(crossing.isEmpty, s"edges crossing the split: $crossing")
    assert(Set(side(3), side(20)) == Set("train", "val"),
      "test graph must actually exercise both sides of the rule")
  }
}
