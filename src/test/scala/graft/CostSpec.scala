package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr._

/** transfer_bytes cost-model tests (reference `test_transfer.py` /
  * `_expr.py:241-286`): narrow chains move nothing; shuffling ops cost a
  * pass; optimization never increases the modeled movement. */
class CostSpec extends AnyFunSuite {

  private val src = RangeVec(0, 1, 1000)

  private def rechunks(e: VecExpr): Int =
    (if (e.isInstanceOf[RechunkVec]) 1 else 0) + e.children.map(rechunks).sum

  test("narrow elemwise/slice/concat chains move zero bytes") {
    val e = ConcatVec(SliceVec(MapVec(src, "v * 2"), 10, 500), MapVec(src, "v + 1"))
    assert(e.totalTransfer == ((0L, 0L)))
  }

  test("alignment join costs a pass of both sides at most") {
    val e = ZipVec(src, MapVec(src, "v * 3"), "v1 + v2")
    assert(e.totalTransfer == ((0L, 2 * 1000 * VecExpr.RowBytes)))
  }

  test("cumulative scan costs one pass; unknown lengths propagate as ?") {
    assert(CumVec(src, "sum").totalTransfer == ((0L, 1000 * VecExpr.RowBytes)))
    val unknown = CumVec(ColumnVec("events", "event_id", "value"), "sum")
    assert(unknown.totalTransfer._2 == -1L)
  }

  test("self-zip fusion drops the modeled transfer to zero (q40 shape)") {
    // x ⊗ map(x): before optimization the alignment join models a pass of
    // both sides; after self-zip fusion nothing moves
    val tree = ZipVec(src, MapVec(src, "1 + v % 7"), "v1 * v2")
    assert(tree.totalTransfer._2 == 2 * 1000 * VecExpr.RowBytes)
    assert(Simplify(tree).totalTransfer == ((0L, 0L)))
  }

  test("offset-zip fusion halves the modeled transfer (q12 shape)") {
    val leaf = ColumnVec("events", "event_id", "value", Some((0L, 1000L)))
    val tree = ZipVec(SliceVec(leaf, 0, 800), SliceVec(leaf, 100, 900), "v1 + v2")
    val after = Simplify(tree)
    val zo = after match {
      case z: ZipOffsetVec => z
      case other           => fail(s"expected ZipOffsetVec, got ${other.token}")
    }
    // one pass of the (fused) 900-element region vs two 800-element passes
    assert(zo.totalTransfer._2 == 900 * VecExpr.RowBytes)
    assert(zo.totalTransfer._2 < tree.totalTransfer._2)
  }

  test("cross-IO zip on matching grids inserts no rechunk (BASELINE.md row 9)") {
    // the reference's cross_io case: two independent scans, compatible
    // grids — the aligned join needs NO realignment pass; inserting one
    // was the 879 MiB regression its rechunk-insertion rule fixed
    val a = ColumnVec("events", "event_id", "value", Some((0L, 1000L)))
    val b = ColumnVec("events", "event_id", "value * 2", Some((0L, 1000L)))
    val s = Simplify(ZipVec(a, b, "v1 + v2"))
    assert(rechunks(s) == 0, s.pprint())
  }

  test("roll feeding a narrow consumer stays narrow (BASELINE.md row 10)") {
    // negative_control: roll(x,1).sum() — rechunk insertion here would be
    // a pure 2x loss; the roll is an index remap whose exchange rides the
    // consumer, and nothing in the optimized tree adds a standalone pass
    val tree = MapVec(RollVec(src, 1), "v * 2")
    val s = Simplify(tree)
    assert(rechunks(s) == 0, s.pprint())
    assert(s.totalTransfer == ((0L, 0L)), "roll+map must model zero standalone movement")
  }

  test("optimization does not increase the modeled movement") {
    val tree = SliceVec(MapVec(MapVec(src, "v * 2"), "v + 1"), 0, 100)
    val before = tree.totalTransfer._2
    val after = Simplify(tree).totalTransfer._2
    assert(after <= before)
  }

  test("round-5 pushdown rules keep the modeled movement monotone") {
    val col0 = ColumnVec("events", "event_id", "value", Some((0L, 100L)))
    val col1 = ColumnVec("events", "event_id", "value", Some((100L, 200L)))
    val trees = Seq[VecExpr](
      SliceVec(RepeatVec(src, 3), 7, 13),                       // slice-through-repeat
      SliceVec(SetItemVec(src, Seq((5L, 9.0), (15L, 3.0))), 10, 20), // slice-through-setitem
      ConcatVec(MapVec(col0, "v * 2"), MapVec(col1, "v * 2")))  // map-through-concat
    trees.foreach { t =>
      assert(Simplify(t).totalTransfer._2 <= t.totalTransfer._2, t.pprint())
    }
  }

  test("pprintCost annotates every node") {
    val e = CumVec(MapVec(src, "v * 2"), "sum")
    val out = e.pprintCost()
    assert(out.linesIterator.forall(_.contains("[moved:")), out)
  }
}
