package graft

import org.scalatest.funsuite.AnyFunSuite

/** NdArray structural properties: shape algebra round-trips and the
  * rank-generic tensordot against the tuned 2-d matmul. */
class NdSpec extends AnyFunSuite {
  import TestSpark.spark

  private def values(a: NdArray): Seq[Double] =
    a.ravel.orderBy("idx").collect().map(_.getDouble(1)).toSeq

  test("transpose composed with its inverse is the identity") {
    val a = NdArray.tabulate(spark, Seq(2L, 3L, 4L, 5L), "(c0*7 + c1*5 + c2*3 + c3) % 11")
    val perm = Seq(2, 0, 3, 1)
    val inv = perm.zipWithIndex.sortBy(_._1).map(_._2)
    val back = a.transpose(perm).transpose(inv)
    assert(back.shape == a.shape)
    assert(values(back) == values(a))
  }

  test("reshape round-trips and preserves row-major order") {
    val a = NdArray.tabulate(spark, Seq(3L, 4L, 5L), "(c0*13 + c1*7 + c2) % 17")
    val r = a.reshape(Seq(6L, 10L))
    assert(r.shape == Seq(6L, 10L))
    assert(values(r) == values(a)) // flat order invariant
    assert(values(r.reshape(Seq(3L, 4L, 5L))) == values(a))
  }

  test("swapaxes is its own inverse; moveaxis matches the transpose it names") {
    val a = NdArray.tabulate(spark, Seq(2L, 3L, 4L, 5L), "(c0*3 + c1*9 + c2*5 + c3) % 13")
    val sw = a.swapaxes(1, 3)
    assert(sw.shape == Seq(2L, 5L, 4L, 3L))
    assert(values(sw.swapaxes(1, 3)) == values(a))
    // moveaxis(3, 0) == transpose((3,0,1,2))
    assert(values(a.moveaxis(3, 0)) == values(a.transpose(Seq(3, 0, 1, 2))))
    assert(a.moveaxis(3, 0).shape == Seq(5L, 2L, 3L, 4L))
    // moveaxis(0, 2) == transpose((1,2,0,3))
    assert(values(a.moveaxis(0, 2)) == values(a.transpose(Seq(1, 2, 0, 3))))
  }

  test("applyOverAxes keeps reduced axes as size-1 dims (keepdims)") {
    val a = NdArray.tabulate(spark, Seq(3L, 4L, 5L), "(c0*7 + c1*3 + c2) % 11")
    val k = a.applyOverAxes(Seq(0, 2), "sum(v)")
    assert(k.shape == Seq(1L, 4L, 1L))
    // same values as the plain axis-tuple reduction
    assert(values(k) == values(a.reduceAxes(Seq(0, 2), "sum(v)")))
    // keepdims makes the result zip-broadcastable... squeeze recovers rank-1
    assert(k.squeeze(2).squeeze(0).shape == Seq(4L))
  }

  test("squeeze / expandDims are inverse projections") {
    val a = NdArray.tabulate(spark, Seq(3L, 4L), "(c0*3 + c1) % 5")
    val e = a.expandDims(1)
    assert(e.shape == Seq(3L, 1L, 4L))
    assert(values(e.squeeze(1)) == values(a))
  }

  test("slice rebases coordinates and prunes the grid") {
    val a = NdArray.tabulate(spark, Seq(4L, 5L, 6L), "c0*30 + c1*6 + c2")
    val s = a.slice(Seq((1L, 3L), (2L, 5L), (0L, 6L)))
    assert(s.shape == Seq(2L, 3L, 6L))
    val got = values(s)
    val expected = for {
      i <- 1 until 3; j <- 2 until 5; k <- 0 until 6
    } yield (i * 30 + j * 6 + k).toDouble
    assert(got == expected)
  }

  test("N-d einsum: batched matmul per batch equals DMatrix matmul; bii->bi diag") {
    val ak = "(c0*9 + c1*7 + c2*3) % 11"
    val bk = "(c0*5 + c1*2 + c2) % 13"
    val a = NdArray.tabulate(spark, Seq(2L, 6L, 4L), ak)
    val b = NdArray.tabulate(spark, Seq(2L, 4L, 5L), bk)
    val got = Einsum.nd("bij,bjk->bik", a, b)
      .orderBy("b", "i", "k").collect().map(_.getDouble(3)).toSeq
    val perBatch = (0 until 2).flatMap { bt =>
      val am = DMatrix.tabulate(spark, 6, 4, s"($bt*9 + i*7 + j*3) % 11")
      val bm = DMatrix.tabulate(spark, 4, 5, s"($bt*5 + i*2 + j) % 13")
      am.matmul(bm).ravel.orderBy("idx").collect().map(_.getDouble(1)).toSeq
    }
    assert(got == perBatch)
    // repeated-letter diagonal at rank 3
    val sq = NdArray.tabulate(spark, Seq(2L, 3L, 3L), "c0*100 + c1*10 + c2")
    val diag = Einsum.nd("bii->bi", sq).orderBy("b", "i").collect()
      .map(_.getDouble(2)).toSeq
    assert(diag == Seq(0.0, 11.0, 22.0, 100.0, 111.0, 122.0))
    // ellipsis sugar: '...ij,...jk->...ik' expands to the explicit batch form
    val viaEll = Einsum.nd("...ij,...jk->...ik", a, b)
      .orderBy("a", "i", "k").collect().map(_.getDouble(3)).toSeq
    assert(viaEll == perBatch, "ellipsis batched matmul")
    // ellipsis full reduction: '...->' sums everything
    val tot = Einsum.nd("...->", a).collect()(0).getDouble(0)
    val direct = a.ravel.selectExpr("sum(v)").collect()(0).getDouble(0)
    assert(tot == direct, "ellipsis total")
    // implicit mode: no '->' emits the once-occurring letters sorted;
    // with an ellipsis the batch dims lead (numpy '...ij,...jk' ≡ '...ik')
    val implicitEll = Einsum.nd("...ij,...jk", a, b)
      .orderBy("a", "i", "k").collect().map(_.getDouble(3)).toSeq
    assert(implicitEll == perBatch, "implicit ellipsis output")
    val m1 = NdArray.tabulate(spark, Seq(3L, 4L), "(c0*2 + c1) % 5")
    val m2 = NdArray.tabulate(spark, Seq(4L, 2L), "(c0 + c1*3) % 7")
    val viaImplicit = Einsum.nd("ij,jk", m1, m2).orderBy("i", "k")
      .collect().map(_.getDouble(2)).toSeq
    val viaExplicit = Einsum.nd("ij,jk->ik", m1, m2).orderBy("i", "k")
      .collect().map(_.getDouble(2)).toSeq
    assert(viaImplicit == viaExplicit, "implicit matmul")
  }

  test("rank-2 tensordot equals DMatrix matmul") {
    val a2 = NdArray.tabulate(spark, Seq(6L, 4L), "(c0*7 + c1*3) % 11")
    val b2 = NdArray.tabulate(spark, Seq(4L, 5L), "(c0*5 + c1*2) % 13")
    val nd = a2.tensordot(b2, Seq(1), Seq(0))
    assert(nd.shape == Seq(6L, 5L))
    val am = DMatrix.tabulate(spark, 6, 4, "(i*7 + j*3) % 11")
    val bm = DMatrix.tabulate(spark, 4, 5, "(i*5 + j*2) % 13")
    val mm = am.matmul(bm).ravel.orderBy("idx").collect().map(_.getDouble(1)).toSeq
    assert(values(nd) == mm)
  }

  test("full contraction and full reduction agree (scalar results)") {
    val a = NdArray.tabulate(spark, Seq(3L, 4L), "(c0 + c1*2) % 5")
    val dot = a.tensordot(a, Seq(0, 1), Seq(0, 1)) // sum of squares
    val viaReduce = a.map("v * v").reduceAxes(Seq(0, 1), "sum(v)")
    assert(values(dot) == values(viaReduce))
  }

  test("tensordot rejects duplicate and out-of-range contraction axes") {
    val a = NdArray.tabulate(spark, Seq(3L, 3L, 4L), "c0 + c1 + c2")
    val b = NdArray.tabulate(spark, Seq(3L, 3L, 4L), "c0 * c1 + c2")
    // numpy: "repeated axis in `axes` argument" — extents pair up (3,3)
    // so only the distinctness check can catch this
    assert(intercept[IllegalArgumentException](
      a.tensordot(b, Seq(0, 0), Seq(0, 1))).getMessage.contains("axesA"))
    assert(intercept[IllegalArgumentException](
      a.tensordot(b, Seq(0, 1), Seq(1, 1))).getMessage.contains("axesB"))
    assert(intercept[IllegalArgumentException](
      a.tensordot(b, Seq(3), Seq(0))).getMessage.contains("axesA"))
    assert(intercept[IllegalArgumentException](
      a.tensordot(b, Seq(0), Seq(-1))).getMessage.contains("axesB"))
  }

  test("cumAxis: blocked carry matches a direct per-line scan (sum/min/max)") {
    val a = NdArray.tabulate(spark, Seq(2L, 7L, 3L), "((c0*11 + c1*5 + c2*3) % 9) - 4")
    // tiny blocks force the carry path; direct = single-window reference
    def direct(op: String): Seq[Double] = {
      val agg = op match {
        case "sum" => "sum(v)"; case "min" => "min(v)"; case "max" => "max(v)"
      }
      a.df.selectExpr("c0", "c1", "c2",
        s"$agg OVER (PARTITION BY c0, c2 ORDER BY c1 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v")
        .selectExpr("c0 * 21 + c1 * 3 + c2 AS idx", "CAST(v AS DOUBLE) AS v")
        .orderBy("idx").collect().map(_.getDouble(1)).toSeq
    }
    for (op <- Seq("sum", "min", "max"))
      assert(values(a.cumAxis(1, op, blockSize = 2L)) == direct(op), op)
  }

  test("diffAxis shrinks the axis and matches elementwise differences") {
    val a = NdArray.tabulate(spark, Seq(3L, 4L, 5L), "(c0*7 + c1*3 + c2) % 11")
    val d = a.diffAxis(2)
    assert(d.shape == Seq(3L, 4L, 4L))
    val base = values(a) // row-major: c2 fastest
    val exp = for {
      i <- 0 until 12; j <- 0 until 4
    } yield base(i * 5 + j + 1) - base(i * 5 + j)
    assert(values(d) == exp)
  }

  test("padAxis: zero pads are coordinate shifts, constant pads concatenate") {
    val a = NdArray.tabulate(spark, Seq(2L, 3L), "(c0*3 + c1) % 5 + 1") // no zeros
    val p = a.padAxis(1, 2, 1, cv = 9.0)
    assert(p.shape == Seq(2L, 6L))
    assert(values(p) == Seq(
      9.0, 9.0, 1.0, 2.0, 3.0, 9.0,
      9.0, 9.0, 4.0, 5.0, 1.0, 9.0))
    // zero fill: the element table holds ONLY the shifted originals —
    // implicit zeros stay unmaterialized, coordinates move by `before`
    val z = a.padAxis(0, 1, 1, cv = 0.0)
    assert(z.shape == Seq(4L, 3L))
    val cells = z.elements.orderBy("c0", "c1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cells.toSeq == Seq(
      (1L, 0L, 1.0), (1L, 1L, 2.0), (1L, 2L, 3.0),
      (2L, 0L, 4.0), (2L, 1L, 5.0), (2L, 2L, 1.0)))
  }

  test("broadcastAxis expands a size-1 axis; zip against the broadcast works") {
    val row = NdArray.tabulate(spark, Seq(1L, 4L), "c1 + 1") // (1,4): 1 2 3 4
    val b = row.broadcastAxis(0, 3)
    assert(b.shape == Seq(3L, 4L))
    assert(values(b) == Seq(1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0))
    // the classic broadcast-add: (3,4) + broadcast (1,4) row
    val m = NdArray.tabulate(spark, Seq(3L, 4L), "c0 * 10")
    assert(values(m.zip(b, "v1 + v2")) ==
      (for (i <- 0 until 3; j <- 0 until 4) yield i * 10.0 + j + 1))
  }

  test("broadcastArrays expands both operands to the numpy common shape") {
    // (3,1) against (4): ranks align right, common shape (3,4)
    val colV = NdArray.tabulate(spark, Seq(3L, 1L), "c0 * 10")
    val rowV = NdArray.tabulate(spark, Seq(4L), "c0 + 1")
    val (a, b) = NdArray.broadcastArrays(colV, rowV)
    assert(a.shape == Seq(3L, 4L) && b.shape == Seq(3L, 4L))
    assert(values(a.zip(b, "v1 + v2")) ==
      (for (i <- 0 until 3; j <- 0 until 4) yield i * 10.0 + j + 1))
    // already-common shapes pass through unchanged
    val (c, d) = NdArray.broadcastArrays(a, b)
    assert(c.shape == Seq(3L, 4L) && d.shape == Seq(3L, 4L))
    // incompatible extents fail loudly
    val bad = NdArray.tabulate(spark, Seq(5L), "c0")
    intercept[IllegalArgumentException] { NdArray.broadcastArrays(colV.squeeze(1), bad) }
  }

  test("zip honors the implicit-zero convention on gapped element tables") {
    val s = spark // stable identifier for the implicits import
    import s.implicits._
    // dense 2x3 of ones vs a gapped table holding only positions 0 and 4
    val dense = NdArray.tabulate(spark, Seq(2L, 3L), "1")
    val gapped = NdArray.fromFlat(
      Seq((0L, 10.0), (4L, 40.0)).toDF("idx", "v"), Seq(2L, 3L))
    val sum = dense.zip(gapped, "v1 + v2")
    // absent gapped cells combine as zero — NOT dropped
    assert(values(sum) == Seq(11.0, 1.0, 1.0, 1.0, 41.0, 1.0))
    // symmetric: gapped on the left
    assert(values(gapped.zip(dense, "v1 + v2")) == Seq(11.0, 1.0, 1.0, 1.0, 41.0, 1.0))
    // both sides gapped, disjoint keys — union of positions survives
    val g2 = NdArray.fromFlat(Seq((1L, 2.0)).toDF("idx", "v"), Seq(2L, 3L))
    val s2 = gapped.zip(g2, "v1 + v2")
    val cells = s2.ravel.orderBy("idx").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(cells.toSeq == Seq((0L, 10.0), (1L, 2.0), (4L, 40.0)))
  }

  test("stack/vstack/hstack/dstack match numpy's promote-then-concat shapes") {
    val a = NdArray.tabulate(spark, Seq(4L), "c0 + 1")        // [1,2,3,4]
    val b = NdArray.tabulate(spark, Seq(4L), "10 * (c0 + 1)") // [10,20,30,40]
    // stack axis 0: (2,4), rows a then b
    val st0 = NdArray.stack(Seq(a, b), 0)
    assert(st0.shape == Seq(2L, 4L))
    assert(values(st0) == Seq(1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0))
    // stack axis 1: (4,2), interleaved columns
    val st1 = NdArray.stack(Seq(a, b), 1)
    assert(st1.shape == Seq(4L, 2L))
    assert(values(st1) == Seq(1.0, 10.0, 2.0, 20.0, 3.0, 30.0, 4.0, 40.0))
    // vstack of 1-d: (2,4) like stack axis 0
    assert(values(NdArray.vstack(Seq(a, b))) == values(st0))
    // hstack of 1-d concatenates: (8)
    val h = NdArray.hstack(Seq(a, b))
    assert(h.shape == Seq(8L))
    assert(values(h) == Seq(1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0))
    // dstack of 1-d: (1,4,2)
    val d = NdArray.dstack(Seq(a, b))
    assert(d.shape == Seq(1L, 4L, 2L))
    assert(values(d) == Seq(1.0, 10.0, 2.0, 20.0, 3.0, 30.0, 4.0, 40.0))
    // 2-d vstack/hstack concat on axis 0/1
    val m = NdArray.tabulate(spark, Seq(2L, 3L), "c0 * 3 + c1")
    assert(NdArray.vstack(Seq(m, m)).shape == Seq(4L, 3L))
    assert(NdArray.hstack(Seq(m, m)).shape == Seq(2L, 6L))
    assert(NdArray.dstack(Seq(m, m)).shape == Seq(2L, 3L, 2L))
  }

  test("atleast2d/atleast3d use numpy's exact axis placement") {
    val a = NdArray.tabulate(spark, Seq(4L), "c0")
    assert(a.atleast2d.shape == Seq(1L, 4L))
    assert(a.atleast3d.shape == Seq(1L, 4L, 1L))
    val m = NdArray.tabulate(spark, Seq(2L, 3L), "c0 + c1")
    assert(m.atleast2d.shape == Seq(2L, 3L))
    assert(m.atleast3d.shape == Seq(2L, 3L, 1L))
    assert(values(m.atleast3d) == values(m))
  }

  test("rollaxis matches numpy's before-start placement rule") {
    val a = NdArray.tabulate(spark, Seq(3L, 4L, 5L, 6L), "c0 + c1 * 2 + c2 * 3 + c3")
    // np.rollaxis(a, 3, 0).shape == (6,3,4,5)
    assert(a.rollaxis(3, 0).shape == Seq(6L, 3L, 4L, 5L))
    // np.rollaxis(a, 0, 4).shape == (4,5,6,3)
    assert(a.rollaxis(0, 4).shape == Seq(4L, 5L, 6L, 3L))
    // np.rollaxis(a, 1, 4).shape == (3,5,6,4)
    assert(a.rollaxis(1, 4).shape == Seq(3L, 5L, 6L, 4L))
    // rolling to its own position is the identity
    assert(values(a.rollaxis(2, 2)) == values(a))
    assert(values(a.rollaxis(3, 0)) == values(a.moveaxis(3, 0)))
  }

  test("stencilSum matches a local oracle under all three boundary modes") {
    val shape = Seq(5L, 6L, 4L)
    def f(c: Seq[Long]): Double = ((c(0) * 7 + c(1) * 3 + c(2) * 5) % 11 - 3).toDouble
    val a = NdArray.tabulate(spark, shape, "(c0*7 + c1*3 + c2*5) % 11 - 3")
    val taps = Seq(
      (Seq(0L, 0L, 0L), -6.0),
      (Seq(1L, 0L, 0L), 1.0), (Seq(-1L, 0L, 0L), 1.0),
      (Seq(0L, 1L, 0L), 1.0), (Seq(0L, -1L, 0L), 1.0),
      (Seq(0L, 0L, 1L), 1.0), (Seq(0L, 0L, -1L), 1.0))
    def bound(mode: String)(t: Long, n: Long): Option[Long] = mode match {
      case "constant" => if (t < 0 || t >= n) None else Some(t)
      case "reflect"  => Some(if (t < 0) -t - 1 else if (t >= n) 2 * n - 1 - t else t)
      case "wrap"     => Some(((t % n) + n) % n)
    }
    for (mode <- Seq("constant", "reflect", "wrap")) {
      val got = a.stencilSum(taps, mode).elements
        .orderBy("c0", "c1", "c2").collect()
        .map(r => (Seq(r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3)))
        .toMap
      for (i <- 0L until 5L; j <- 0L until 6L; k <- 0L until 4L) {
        val want = taps.map { case (off, w) =>
          val src = Seq(i + off(0), j + off(1), k + off(2))
          val read = src.zip(shape).map { case (t, n) => bound(mode)(t, n) }
          if (read.exists(_.isEmpty)) 0.0 else w * f(read.map(_.get))
        }.sum
        val gotV = got.getOrElse(Seq(i, j, k), 0.0) // implicit zero
        assert(gotV == want, s"$mode ($i,$j,$k): $gotV != $want")
      }
    }
  }

  test("stencilAgg: median filter matches a local oracle; constant edges shrink the neighborhood") {
    val shape = Seq(6L, 5L)
    def f(i: Long, j: Long): Double = ((i * 7 + j * 3) % 9 + 1).toDouble
    val a = NdArray.tabulate(spark, shape, "(c0*7 + c1*3) % 9 + 1")
    val offs = for (di <- -1L to 1L; dj <- -1L to 1L) yield Seq(di, dj)
    def localMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    val got = a.stencilAgg(offs, "percentile(v, 0.5)", "constant").elements
      .orderBy("c0", "c1").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (i <- 0L until 6L; j <- 0L until 5L) {
      // constant mode: out-of-domain neighbors are absent from the agg
      val nbrs = offs.map(o => (i + o(0), j + o(1)))
        .filter { case (x, y) => x >= 0 && x < 6 && y >= 0 && y < 5 }
        .map { case (x, y) => f(x, y) }
      assert(math.abs(got((i, j)) - localMedian(nbrs)) < 1e-12,
        s"($i,$j): ${got((i, j))} != ${localMedian(nbrs)}")
    }
    // wrap mode gives every cell the full 9-neighborhood: dilation (max)
    val mx = a.stencilAgg(offs, "max(v)", "wrap").elements.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (i <- 0L until 6L; j <- 0L until 5L) {
      val want = offs.map(o => f((i + o(0) + 6) % 6, (j + o(1) + 5) % 5)).max
      assert(mx((i, j)) == want)
    }
  }

  test("coarsen: trim_excess matches a local oracle; strict mode requires divisibility") {
    val shape = Seq(5L, 7L)
    def f(i: Long, j: Long): Double = ((i * 4 + j * 9) % 13).toDouble
    val a = NdArray.tabulate(spark, shape, "(c0*4 + c1*9) % 13")
    val got = a.coarsen(Seq(2L, 3L), "sum(v)", trimExcess = true)
      .elements.orderBy("c0", "c1").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (i <- 0L until 2L; j <- 0L until 2L) {
      val want = (for (di <- 0L until 2L; dj <- 0L until 3L)
        yield f(i * 2 + di, j * 3 + dj)).sum
      assert(got.getOrElse((i, j), 0.0) == want, s"($i,$j)")
    }
    // strict mode: 5 % 2 != 0 must refuse loudly, not silently trim
    val e = intercept[IllegalArgumentException](a.coarsen(Seq(2L, 3L), "sum(v)"))
    assert(e.getMessage.contains("trimExcess"))
    // exact division needs no flag
    assert(a.coarsen(Seq(5L, 7L), "max(v)").shape == Seq(1L, 1L))
    // a factor larger than its extent leaves nothing even after trimming —
    // refuse with the real reason, not a slice bounds error
    val e2 = intercept[IllegalArgumentException](
      a.coarsen(Seq(6L, 3L), "sum(v)", trimExcess = true))
    assert(e2.getMessage.contains("exceed"))
  }

  test("padAxisMode: edge pads any width; wrap/reflect refuse past-period pads") {
    val a = NdArray.tabulate(spark, Seq(3L, 2L), "c0 * 2 + c1")
    val p = a.padAxisMode(0, 5, 0, "edge") // wider than the axis — legal (numpy)
    assert(p.shape == Seq(8L, 2L))
    val top = p.elements.where("c0 < 5").orderBy("c0", "c1").collect()
    assert(top.forall(r => r.getDouble(2) == r.getLong(1).toDouble)) // row 0 repeated
    intercept[IllegalArgumentException](a.padAxisMode(0, 4, 0, "wrap"))
  }

  test("stencilSum plans ONE shuffle and ONE scan of the extended input") {
    val a = NdArray.tabulate(spark, Seq(8L, 8L, 8L), "(c0 + c1 + c2) % 5")
    val taps = Seq((Seq(0L, 0L, 0L), 2.0), (Seq(1L, 1L, 1L), 1.0), (Seq(-1L, 0L, 1L), 1.0))
    val plan = a.stencilSum(taps, "reflect").elements
      .queryExecution.executedPlan.toString
    // taps ride a BroadcastExchange; the groupBy is the only SHUFFLE
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length +
      "Exchange rangepartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"expected at most one shuffle, got $shuffles:\n$plan")
    // one scan per ghost branch (3^rank max), NOT per tap: with a per-tap
    // union the 27-branch ghost union would appear |taps| times over
    val ranges = "Range \\(0".r.findAllIn(plan).length
    assert(ranges <= 27, s"extended input scanned per tap? $ranges Range scans")
  }
}
