package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzzing of random N-d op chains against an in-process local
  * oracle — the rank-generic counterpart of FuzzSpec (which covers the
  * 1-d VecExpr surface). The local model is a flat row-major
  * Vector[Double] plus a shape; every NdArray op must agree elementwise
  * after ravel. */
class NdFuzzSpec extends AnyFunSuite {
  import TestSpark.spark

  // ---- local model ---------------------------------------------------------
  private case class L(shape: List[Int], v: Vector[Double]) {
    def strides: List[Int] = shape.scanRight(1)(_ * _).tail
    def idx(c: List[Int]): Int = c.zip(strides).map { case (a, s) => a * s }.sum
    def coords(i: Int): List[Int] =
      shape.zip(strides).map { case (sh, st) => (i / st) % sh }
  }

  sealed private trait Op
  private case class Transpose(seed: Int) extends Op
  private case class FlipAx(seed: Int) extends Op
  private case class RollAx(seed: Int, s: Int) extends Op
  private case class SliceAx(seed: Int, loF: Double, hiF: Double) extends Op
  private case class PadAx(seed: Int, b: Int, a: Int, cv: Int) extends Op
  private case class Reshape2(seed: Int) extends Op
  private case class MapAffine(a: Int, b: Int) extends Op

  private def permOf(rank: Int, seed: Int): List[Int] = {
    // deterministic pseudo-random permutation from the seed
    val base = (0 until rank).toList
    val r = new scala.util.Random(seed)
    r.shuffle(base)
  }

  private def applyLocal(l: L, op: Op): L = op match {
    case MapAffine(a, b) => l.copy(v = l.v.map(x => x * a + b))
    case Transpose(seed) =>
      val p = permOf(l.shape.length, seed)
      val ns = p.map(l.shape)
      val out = L(ns, Vector.fill(l.v.length)(0.0))
      L(ns, Vector.tabulate(l.v.length) { i =>
        val nc = out.coords(i)              // coords in the new layout
        val oc = Array.fill(l.shape.length)(0)
        p.zipWithIndex.foreach { case (src, dst) => oc(src) = nc(dst) }
        l.v(l.idx(oc.toList))
      })
    case FlipAx(seed) =>
      val ax = math.abs(seed) % l.shape.length
      L(l.shape, Vector.tabulate(l.v.length) { i =>
        val c = l.coords(i).zipWithIndex.map { case (x, a) =>
          if (a == ax) l.shape(a) - 1 - x else x
        }
        l.v(l.idx(c))
      })
    case RollAx(seed, s) =>
      val ax = math.abs(seed) % l.shape.length
      val n = l.shape(ax)
      L(l.shape, Vector.tabulate(l.v.length) { i =>
        val c = l.coords(i).zipWithIndex.map { case (x, a) =>
          if (a == ax) (((x - s) % n) + n) % n else x
        }
        l.v(l.idx(c))
      })
    case SliceAx(seed, loF, hiF) =>
      val ax = math.abs(seed) % l.shape.length
      val n = l.shape(ax)
      val lo = (loF * n).toInt
      val hi = math.max(lo + 1, (hiF * n).toInt) // keep nonempty
      val ns = l.shape.updated(ax, hi - lo)
      val out = L(ns, Vector.empty)
      L(ns, Vector.tabulate(ns.product) { i =>
        val c = out.coords(i).zipWithIndex.map { case (x, a) =>
          if (a == ax) x + lo else x
        }
        l.v(l.idx(c))
      })
    case PadAx(seed, b, a0, cv) =>
      val ax = math.abs(seed) % l.shape.length
      val ns = l.shape.updated(ax, l.shape(ax) + b + a0)
      val out = L(ns, Vector.empty)
      L(ns, Vector.tabulate(ns.product) { i =>
        val c = out.coords(i)
        val x = c(ax) - b
        if (x < 0 || x >= l.shape(ax)) cv.toDouble
        else l.v(l.idx(c.updated(ax, x)))
      })
    case Reshape2(seed) =>
      // re-split the flat order into a fresh 2-or-3-axis factorization
      val n = l.v.length
      val d = (2 + math.abs(seed) % 2)
      val f1 = (1 to n).filter(n % _ == 0)
      val a = f1(math.abs(seed * 31) % f1.length)
      val rest = n / a
      val ns = if (d == 2) List(a, rest) else {
        val f2 = (1 to rest).filter(rest % _ == 0)
        val b = f2(math.abs(seed * 17) % f2.length)
        List(a, b, rest / b)
      }
      L(ns, l.v)
  }

  private def applyEngine(nd: NdArray, l: L, op: Op): NdArray = op match {
    case MapAffine(a, b)  => nd.map(s"v * $a + $b")
    case Transpose(seed)  => nd.transpose(permOf(l.shape.length, seed))
    case FlipAx(seed)     => nd.flip(math.abs(seed) % l.shape.length)
    case RollAx(seed, s)  => nd.roll(math.abs(seed) % l.shape.length, s)
    case SliceAx(seed, loF, hiF) =>
      val ax = math.abs(seed) % l.shape.length
      val n = l.shape(ax)
      val lo = (loF * n).toInt
      val hi = math.max(lo + 1, (hiF * n).toInt)
      nd.slice(l.shape.indices.map { a =>
        if (a == ax) (lo.toLong, hi.toLong) else (0L, l.shape(a).toLong)
      })
    case PadAx(seed, b, a0, cv) =>
      nd.padAxis(math.abs(seed) % l.shape.length, b, a0, cv.toDouble)
    case Reshape2(seed) =>
      val after = applyLocal(l, op) // shapes must agree; reuse the local factorization
      nd.reshape(after.shape.map(_.toLong))
  }

  private val genOp: Gen[Op] = Gen.oneOf(
    Gen.choose(0, 1000).map(Transpose(_)),
    Gen.choose(0, 1000).map(FlipAx(_)),
    for { s <- Gen.choose(0, 1000); r <- Gen.choose(-4, 4) } yield RollAx(s, r),
    for { s <- Gen.choose(0, 1000); lo <- Gen.choose(0.0, 0.5); hi <- Gen.choose(0.5, 1.0) } yield SliceAx(s, lo, hi),
    for { s <- Gen.choose(0, 1000); b <- Gen.choose(0, 2); a <- Gen.choose(0, 2); c <- Gen.choose(-3, 3) } yield PadAx(s, b, a, c),
    Gen.choose(0, 1000).map(Reshape2(_)),
    for { a <- Gen.choose(-3, 3); b <- Gen.choose(-5, 5) } yield MapAffine(a, b))

  private val genCase: Gen[(List[Int], List[Op])] = for {
    rank <- Gen.choose(2, 4)
    dims <- Gen.listOfN(rank, Gen.choose(2, 5))
    ops <- Gen.listOfN(3, genOp)
  } yield (dims, ops)

  test("random N-d op chains match the local row-major oracle") {
    val prop = Prop.forAll(genCase) { case (dims, ops) =>
      val n = dims.product
      val start = L(dims, Vector.tabulate(n)(i => (i * 7 % 23).toDouble))
      val nd0 = NdArray.fromFlat(
        { val sp = spark; import sp.implicits._
          (0 until n).map(i => (i.toLong, (i * 7 % 23).toDouble)).toDF("idx", "v") },
        dims.map(_.toLong))
      val (ndF, lF) = ops.foldLeft((nd0, start)) { case ((nd, l), op) =>
        (applyEngine(nd, l, op), applyLocal(l, op))
      }
      val got = ndF.ravel.orderBy("idx").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toVector
      val wantDense = lF.v
      val shapeOk = ndF.shape == lF.shape.map(_.toLong)
      // the engine's element table is sparse (implicit zeros) — compare
      // against the dense oracle with absent cells read as 0
      val gotMap = got.toMap
      val valsOk = (0 until wantDense.length).forall { i =>
        math.abs(gotMap.getOrElse(i.toLong, 0.0) - wantDense(i)) < 1e-9
      }
      if (!(shapeOk && valsOk))
        println(s"ND FUZZ FAIL dims=$dims ops=$ops\n got=$got\n want=$wantDense shape ${ndF.shape} vs ${lF.shape}")
      shapeOk && valsOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60)
      .withInitialSeed(org.scalacheck.rng.Seed(20260815L)), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- stencil fuzz (covers the single-scan ghost-image path) -------------
  private val genStencil: Gen[(List[Int], List[(List[Long], Double)], String)] = for {
    rank <- Gen.choose(2, 3)
    dims <- Gen.listOfN(rank, Gen.choose(2, 5))
    nTaps <- Gen.choose(1, 5)
    taps <- Gen.listOfN(nTaps, for {
      off <- Gen.listOfN(rank, Gen.choose(-2L, 2L))
      w <- Gen.choose(-3, 3)
    } yield (off, w.toDouble))
    bnd <- Gen.oneOf("constant", "reflect", "wrap")
  } yield (dims, taps, bnd)

  test("random stencils match the local boundary oracle") {
    def bIdx(q: Long, n: Int, mode: String): Option[Int] = mode match {
      case "constant" => if (q >= 0 && q < n) Some(q.toInt) else None
      case "reflect" =>
        // one mirror step (halo <= n by construction)
        if (q < 0) Some((-q - 1).toInt)
        else if (q >= n) Some((2 * n - 1 - q).toInt) else Some(q.toInt)
      case "wrap" => Some((((q % n) + n) % n).toInt)
    }
    val prop = Prop.forAll(genStencil) { case (dims, taps0, bnd) =>
      // halo must fit the axis under reflect/wrap (the engine requires
      // h <= n); clamp offending tap components instead of discarding
      val taps = taps0.map { case (off, w) =>
        (off.zip(dims).map { case (o, n) => math.max(-n.toLong, math.min(n.toLong, o)) }, w)
      }
      val n = dims.product
      val x = Vector.tabulate(n)(i => ((i * 11) % 17 - 8).toDouble)
      val local = L(dims, x)
      val want = Vector.tabulate(n) { i =>
        val c = local.coords(i)
        taps.map { case (off, w) =>
          val src = c.zip(off).zip(dims).map { case ((ci, o), d) => bIdx(ci + o, d, bnd) }
          if (src.forall(_.isDefined)) w * x(local.idx(src.map(_.get))) else 0.0
        }.sum
      }
      val sp = spark
      import sp.implicits._
      val nd0 = NdArray.fromFlat(
        (0 until n).map(i => (i.toLong, x(i))).toDF("idx", "v"),
        dims.map(_.toLong))
      val got = nd0.stencilSum(taps.map { case (o, w) => (o.toSeq, w) }, bnd)
        .ravel.orderBy("idx").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val ok = (0 until n).forall(i => got.getOrElse(i.toLong, 0.0) == want(i))
      if (!ok) println(s"STENCIL FUZZ FAIL dims=$dims taps=$taps bnd=$bnd\n got=$got\n want=$want")
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40)
      .withInitialSeed(org.scalacheck.rng.Seed(20260816L)), prop)
    assert(res.passed, res.status.toString)
  }
}
