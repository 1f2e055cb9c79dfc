package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[DSparse]] — the explicit sparse surface: O(nnz) algebra, loud
  * refusal to densify, implicit-zero-corrected reductions (reference
  * `dask_array/_chunk_types.py:31` — sparse chunks flow through the same
  * array API). */
class DSparseSpec extends AnyFunSuite {
  import TestSpark.spark

  private def coo(cells: (Long, Long, Double)*): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    cells.toDF("i", "j", "v")
  }

  private def cellsOf(m: DSparse): Map[(Long, Long), Double] =
    m.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("map: zero-preserving kernels stay sparse; densifying kernels are refused") {
    val a = new DSparse(coo((0, 0, 2.0), (3, 1, -4.0)), 4, 4)
    assert(cellsOf(a.map("v * 3")) == Map((0L, 0L) -> 6.0, (3L, 1L) -> -12.0))
    assert(cellsOf(a.map("sqrt(abs(v))")).keySet == Set((0L, 0L), (3L, 1L)))
    val e = intercept[IllegalArgumentException](a.map("v + 1"))
    assert(e.getMessage.contains("toDense"))
  }

  test("zip is union-support with absent cells read as zero; result drops zeros") {
    val a = new DSparse(coo((0, 0, 2.0), (1, 1, 5.0)), 2, 2)
    val b = new DSparse(coo((0, 0, 2.0), (0, 1, 7.0)), 2, 2)
    // (0,0): 2-2=0 dropped; (1,1): 5-0 kept; (0,1): 0-7 kept
    assert(cellsOf(a - b) == Map((1L, 1L) -> 5.0, (0L, 1L) -> -7.0))
    // Hadamard annihilates where either side is absent
    assert(cellsOf(a * b) == Map((0L, 0L) -> 4.0))
  }

  test("aggAll corrects min/max for implicit zeros; dense support skips the correction") {
    val a = new DSparse(coo((0, 0, 3.0), (1, 1, 8.0)), 2, 2) // 2 absent cells
    val r = a.aggAll().collect()(0)
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 8.0
      && r.getLong(3) == 2L)
    val full = new DSparse(coo((0, 0, 3.0), (0, 1, 1.0), (1, 0, 2.0), (1, 1, 8.0)), 2, 2)
    val rf = full.aggAll().collect()(0)
    assert(rf.getDouble(1) == 1.0, "dense support must NOT clamp min to 0")
  }

  test("SpGEMM matches dense matmul; eye is the identity") {
    val a = new DSparse(coo((0, 0, 1.0), (0, 2, 2.0), (1, 1, 3.0), (2, 0, -1.0)), 3, 3)
    val b = new DSparse(coo((0, 1, 4.0), (2, 2, 5.0), (1, 0, 1.0)), 3, 3)
    val sparse = cellsOf(a.matmul(b))
    val dense = a.toDense.matmul(b.toDense).df.collect()
      .filter(_.getDouble(2) != 0.0)
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sparse == dense)
    assert(cellsOf(DSparse.eye(spark, 3).matmul(a)) == cellsOf(a))
  }

  test("fromCOO sums duplicates and drops explicit zeros; fromDense round-trips") {
    val a = DSparse.fromCOO(coo((0, 0, 1.0), (0, 0, 2.0), (1, 1, 0.0)), 2, 2)
    assert(cellsOf(a) == Map((0L, 0L) -> 3.0))
    assert(a.nnz == 1L)
    val rt = DSparse.fromDense(a.toDense)
    assert(cellsOf(rt) == cellsOf(a))
  }

  test("gram (per-task dense accumulation) equals the general SpGEMM AtA") {
    // ragged sparse fixture incl. an empty row and a duplicate-column row
    val a = new DSparse(coo(
      (0, 0, 2.0), (0, 2, -1.0), (1, 1, 3.0), (3, 0, 1.0), (3, 1, 4.0), (3, 2, 5.0)), 4, 3)
    assert(cellsOf(a.gram) == cellsOf(a.t.matmul(a)))
    // and both match the dense algebra on a tiny case: gram of a column
    val c = new DSparse(coo((0, 0, 2.0), (1, 0, 3.0)), 2, 1)
    assert(cellsOf(c.gram) == Map((0L, 0L) -> 13.0))
  }

  test("matvec is a broadcast join: y = A x on sparse A") {
    val s = spark
    import s.implicits._
    val a = new DSparse(coo((0, 0, 2.0), (0, 1, 1.0), (2, 1, 4.0)), 3, 2)
    val x = Seq((0L, 10.0), (1L, 3.0)).toDF("i", "v")
    val y = a.matvec(x).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(y == Map(0L -> 23.0, 2L -> 12.0))
  }

  test("map's zero-probe runs driver-side, launching no Spark job") {
    val s = spark
    val a = new DSparse(coo((0, 0, 2.0), (1, 1, -1.0)), 2, 2)
    val sc = s.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    a.map("v * 3") // probe + plan construction only — nothing executes
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, s"zero-probe launched ${after - before} job(s)")
  }

  test("nnz is cached; report shows density and stored-vs-dense bytes") {
    val a = new DSparse(coo((0, 0, 2.0), (1, 1, -1.0), (3, 2, 5.0)), 4, 3)
    assert(a.nnz == 3L && a.nnz == 3L)
    val rep = a.report
    assert(rep.contains("sparse 4x3") && rep.contains("nnz=3"))
    assert(rep.contains("stored=72 B") && rep.contains("dense=96 B"))
  }
}
