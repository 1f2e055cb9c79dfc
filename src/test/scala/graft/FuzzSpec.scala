package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Property-based fuzzing of random operator chains against an in-process
  * Scala oracle — the port of the reference's hypothesis suite
  * (`tests/test_fuzz_optimize.py`): arange-based distinct values so index
  * bugs change results; checks value parity, shape preservation, optimizer
  * convergence, and content-addressed name stability. */
class FuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // ---- op model ------------------------------------------------------------
  sealed trait Op
  case class MapAffine(a: Int, b: Int) extends Op
  case class Slice(loFrac: Double, hiFrac: Double) extends Op
  case object Flip extends Op
  case class Roll(s: Int) extends Op
  case class Repeat(k: Int) extends Op
  case class Diff(n: Int) extends Op
  case object Cumsum extends Op
  case class SlidingMax(w: Int) extends Op
  case class Rechunk(b: Int) extends Op
  case class Boundary(depth: Int, mode: String) extends Op
  case class ZipShift(off: Int) extends Op // x[0:n-off] + x[off:n] — offset-zip fusion path
  case class Stride(step: Int) extends Op
  case class SetIdx(frac: Double, value: Int) extends Op // point update — setitem pushdown path
  case class PiecewiseFz(t1: Int, t2: Int) extends Op // sequential assignment: LAST match wins
  case class SelectFz(t1: Int, t2: Int) extends Op    // np.select: FIRST match wins
  case object ChooseFz extends Op                      // parity selector over two derived choices
  // ma surface through fusion: each composite is a TOTAL function (no
  // NULL escapes), but the intermediate kernel carries NULLs — the
  // fusion engine must substitute NULL-producing fragments correctly
  case class MaskedFill(t: Int, c: Int) extends Op    // masked_where(v>t) → filled(c)
  case class GetMaskFz(t: Int) extends Op             // masked_where(v>t) → getmask
  case class MaskedZip(t: Int) extends Op             // zip(masked, self, coalesce(v1,0)+v2)
  case class CoarsenSum(k: Int) extends Op            // block-local downsample — slice-through-coarsen path
  case object GradientOp extends Op                   // central difference — slice-through-gradient path
  case class MapOverlapFz(dep: Int) extends Op        // generic stencil, periodic boundary — slice-through-stencil path

  private def applyLocal(v: Vector[Double], op: Op): Vector[Double] = op match {
    case MapAffine(a, b) => v.map(x => x * a + b)
    case Slice(lf, hf) =>
      val lo = (lf * v.length).toInt
      val hi = math.max(lo, (hf * v.length).toInt)
      v.slice(lo, hi)
    case Flip => v.reverse
    case Roll(s) =>
      val n = v.length
      if (n == 0) v else Vector.tabulate(n)(j => v((((j - s) % n) + n) % n))
    case Repeat(k) => v.flatMap(x => Vector.fill(k)(x))
    case Diff(n) =>
      if (v.length <= n) Vector.empty
      else (n until v.length).map(i => v(i) - v(i - n)).toVector
    case Cumsum => v.scanLeft(0.0)(_ + _).tail
    case SlidingMax(w) =>
      v.indices.map(i => v.slice(math.max(0, i - w + 1), i + 1).max).toVector
    case Rechunk(_) => v // grid change never changes values
    case Boundary(d0, mode) =>
      if (v.isEmpty) v
      else {
        val d = math.min(d0, v.length)
        val left = mode match {
          case "constant" => Vector.fill(d)(0.0)
          case "periodic" => v.takeRight(d)
          case "reflect"  => v.take(d).reverse
          case "nearest"  => Vector.fill(d)(v.head)
        }
        val right = mode match {
          case "constant" => Vector.fill(d)(0.0)
          case "periodic" => v.take(d)
          case "reflect"  => v.takeRight(d).reverse
          case "nearest"  => Vector.fill(d)(v.last)
        }
        left ++ v ++ right
      }
    case ZipShift(off) =>
      if (v.length <= off) Vector.empty
      else (0 until v.length - off).map(i => v(i) + v(i + off)).toVector
    case Stride(step) => v.indices.collect { case i if i % step == 0 => v(i) }.toVector
    case SetIdx(frac, value) =>
      if (v.isEmpty) v else v.updated((frac * v.length).toInt, value.toDouble)
    case PiecewiseFz(t1, t2) =>
      v.map { x =>
        var r = 0.0
        if (x < t1) r = x + 1
        if (x < t2) r = x - 1 // sequential: overwrites where both hold
        r
      }
    case SelectFz(t1, t2) =>
      v.map(x => if (x < t1) x + 1 else if (x < t2) x - 1 else 0.0)
    case ChooseFz =>
      v.map(x => if (math.abs(x).toLong % 2 == 0) x * 2 else x + 10)
    case MaskedFill(t, c) => v.map(x => if (x > t) c.toDouble else x)
    case GetMaskFz(t)     => v.map(x => if (x > t) 1.0 else 0.0)
    case MaskedZip(t)     => v.map(x => (if (x > t) 0.0 else x) + x)
    case CoarsenSum(k)    => v.grouped(k).map(_.sum).toVector
    case GradientOp =>
      val n = v.length
      if (n < 2) v
      else Vector.tabulate(n) { i =>
        if (i == 0) v(1) - v(0)
        else if (i == n - 1) v(n - 1) - v(n - 2)
        else (v(i + 1) - v(i - 1)) / 2.0
      }
    case MapOverlapFz(dep) =>
      val n = v.length
      if (n <= dep) v
      else Vector.tabulate(n) { i =>
        (-dep to dep).foldLeft(0.0)((acc, j) => acc + v((((i + j) % n) + n) % n))
      }
  }

  private def applyEngine(d: DArray, op: Op, len: Long): DArray = op match {
    case MapAffine(a, b) => d.map(s"v * $a + $b")
    case Slice(lf, hf) =>
      val lo = (lf * len).toInt
      val hi = math.max(lo, (hf * len).toInt)
      d.slice(lo, hi)
    case Flip      => d.flip
    case Roll(s)   => d.roll(s)
    case Repeat(k) => d.repeatEach(k)
    case Diff(n)   => d.diff(n)
    case Cumsum    => d.cumsum
    case SlidingMax(w) => d.sliding(w, "max")
    case Rechunk(b) => d.rechunk(b)
    case Boundary(d0, mode) =>
      if (len == 0) d else d.boundary(math.min(d0, len.toInt), mode)
    case ZipShift(off) =>
      if (len <= off) d.slice(0, 0)
      else d.slice(0, len - off).zip(d.slice(off, len), "v1 + v2")
    case Stride(step) => d.slice(0, len, step)
    case SetIdx(frac, value) =>
      if (len == 0) d
      else d.setItems(Seq(((frac * len).toLong, value.toDouble)))
    case PiecewiseFz(t1, t2) =>
      d.piecewise(Seq(s"v < $t1", s"v < $t2"), Seq("v + 1", "v - 1"))
    case SelectFz(t1, t2) =>
      d.select(Seq(s"v < $t1", s"v < $t2"), Seq("v + 1", "v - 1"))
    case ChooseFz =>
      d.map("CAST(abs(v) AS BIGINT) % 2").choose(Seq(d * 2.0, d + 10.0))
    case MaskedFill(t, c) => d.maskedWhere(s"v > $t").filled(c)
    case GetMaskFz(t)     => d.maskedWhere(s"v > $t").getmask
    case MaskedZip(t)     => d.maskedWhere(s"v > $t").zip(d, "coalesce(v1, 0) + v2")
    case CoarsenSum(k)    => d.coarsen(k, "sum")
    case GradientOp       => if (len < 2) d else d.gradient
    case MapOverlapFz(dep) =>
      if (len <= dep) d
      else {
        // same left-assoc addition order as the local fold
        val taps = (-dep to dep).map(j =>
          if (j < 0) s"v_m${-j}" else if (j > 0) s"v_p$j" else "v")
        d.mapOverlap(dep, taps.reduce((a, b) => s"($a + $b)"), "periodic")
      }
  }

  private val genOp: Gen[Op] = Gen.oneOf(
    for { a <- Gen.choose(-3, 3); b <- Gen.choose(-5, 5) } yield MapAffine(a, b),
    for { l <- Gen.choose(0.0, 0.6); h <- Gen.choose(0.4, 1.0) } yield Slice(l, h),
    Gen.const(Flip),
    Gen.choose(1, 7).map(Roll(_)),
    Gen.choose(2, 3).map(Repeat(_)),
    Gen.choose(1, 2).map(Diff(_)),
    Gen.const(Cumsum),
    Gen.choose(2, 9).map(SlidingMax(_)),
    Gen.oneOf(17, 50, 64, 100).map(Rechunk(_)),
    for { d <- Gen.choose(1, 5)
          m <- Gen.oneOf("constant", "periodic", "reflect", "nearest") } yield Boundary(d, m),
    Gen.choose(1, 9).map(ZipShift(_)),
    Gen.choose(2, 5).map(Stride(_)),
    for { f <- Gen.choose(0.0, 0.99); x <- Gen.choose(-9, 9) } yield SetIdx(f, x),
    for { t1 <- Gen.choose(-50, 150); t2 <- Gen.choose(-50, 150) } yield PiecewiseFz(t1, t2),
    for { t1 <- Gen.choose(-50, 150); t2 <- Gen.choose(-50, 150) } yield SelectFz(t1, t2),
    Gen.const(ChooseFz),
    for { t <- Gen.choose(-50, 150); c <- Gen.choose(-9, 9) } yield MaskedFill(t, c),
    Gen.choose(-50, 150).map(GetMaskFz(_)),
    Gen.choose(-50, 150).map(MaskedZip(_)),
    Gen.choose(2, 5).map(CoarsenSum(_)),
    Gen.const(GradientOp),
    Gen.choose(1, 3).map(MapOverlapFz(_)))

  // sizes above the test block size (-Dgraft.block.size=64) so the
  // windowed ops' carry chains and halos run multi-block.
  // Soak knobs (deterministic defaults for CI): -Dgraft.fuzz.n=400
  // -Dgraft.fuzz.len=6 -Dgraft.fuzz.seed=... runs a longer, differently
  // seeded sweep without touching the checked-in baseline.
  private val fuzzCases = sys.props.getOrElse("graft.fuzz.n", "40").toInt
  private val fuzzLen = sys.props.getOrElse("graft.fuzz.len", "4").toInt
  private val fuzzSeed = sys.props.getOrElse("graft.fuzz.seed", "20260813").toLong
  private val genCase: Gen[(Int, List[Op])] = for {
    n <- Gen.choose(5, 200)
    ops <- Gen.listOfN(fuzzLen, genOp)
  } yield (n, ops)

  test("random op chains match the local oracle; optimizer is convergent and name-stable") {
    val prop = Prop.forAll(genCase) { case (n, ops) =>
      def build(): (DArray, Vector[Double]) =
        ops.foldLeft((DArray.arange(spark, "/unused", 0, n, 1),
            Vector.tabulate(n)(_.toDouble))) { case ((d, v), op) =>
          (applyEngine(d, op, v.length), applyLocal(v, op))
        }
      val (d1, expect) = build()
      val (d2, _) = build()

      // content-addressed determinism (reference .ai-docs/testing.md)
      val nameStable = d1.exprTree.name == d2.exprTree.name &&
        d1.optimized.name == d2.optimized.name
      // optimizer convergence: simplify(simplify(x)) == simplify(x)
      val converged = graft.expr.Simplify(d1.optimized).name == d1.optimized.name

      val got = d1.elements.orderBy("idx").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val gotDense = got.map(_._2).toVector
      val idxDense = got.map(_._1).toVector == Vector.tabulate(got.length)(_.toLong)
      val valsMatch = gotDense.length == expect.length &&
        gotDense.zip(expect).forall { case (a, b) =>
          math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)) // fp-order tolerance
        }

      if (!(nameStable && converged && idxDense && valsMatch))
        println(s"FUZZ FAIL n=$n ops=$ops\n got=$gotDense\n want=$expect " +
          s"nameStable=$nameStable converged=$converged idxDense=$idxDense")
      nameStable && converged && idxDense && valsMatch
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(fuzzCases).withWorkers(1)
        .withInitialSeed(org.scalacheck.rng.Seed(fuzzSeed)), prop)
    assert(res.passed, s"scalacheck: $res")
  }

  test("NdArray shape algebra fuzz: transpose/slice/reshape vs an in-core model") {
    // random rank-3/4 shapes: random permutation + random rectangular
    // slice + reshape-to-flat must agree with the straightforward local
    // evaluation of the same composition
    val shapeGen = Gen.choose(2, 4).flatMap(r =>
      Gen.listOfN(r, Gen.choose(1, 5)).map(_.map(_.toLong)))
    val prop = Prop.forAll(shapeGen, Gen.choose(0L, Long.MaxValue)) { (shape, seed0) =>
      val r = shape.length
      val rnd = new scala.util.Random(seed0)
      val perm = rnd.shuffle((0 until r).toList)
      val bounds = shape.indices.map { a =>
        val n = perm.map(shape)(a)
        val lo = rnd.nextInt(n.toInt)
        val hi = lo + 1 + rnd.nextInt(n.toInt - lo)
        (lo.toLong, hi.toLong)
      }
      // engine: tabulate(flat index value) → transpose → slice → ravel
      val nd = NdArray.tabulate(spark, shape,
          shape.indices.map(a => s"c$a * ${shape.drop(a + 1).product}L").mkString(" + "))
        .transpose(perm).slice(bounds)
      val got = nd.ravel.orderBy("idx").collect().map(_.getDouble(1)).toVector
      // local model over the same composition
      def coordsOf(flat: Long, sh: Seq[Long]): Seq[Long] = {
        val strides = sh.scanRight(1L)(_ * _).tail
        sh.indices.map(a => (flat / strides(a)) % sh(a))
      }
      val tShape = perm.map(shape)
      val sShape = bounds.map { case (lo, hi) => hi - lo }
      val expect = (0L until sShape.product).map { flat =>
        val sc = coordsOf(flat, sShape)
        val tc = sc.zip(bounds).map { case (c, (lo, _)) => c + lo } // unslice
        val oc = new Array[Long](r) // invert the permutation
        perm.zipWithIndex.foreach { case (src, dst) => oc(src) = tc(dst) }
        // original value = row-major flat index of oc in `shape`
        oc.toSeq.zip(shape.scanRight(1L)(_ * _).tail)
          .map { case (c, st) => c * st }.sum.toDouble
      }.toVector
      val ok = got == expect
      if (!ok) println(s"ND FUZZ FAIL shape=$shape perm=$perm bounds=$bounds\n got=$got\n want=$expect")
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25).withWorkers(1)
        .withInitialSeed(org.scalacheck.rng.Seed(20260814L)), prop)
    assert(res.passed, s"scalacheck: $res")
  }

  test("approx quantiles respect the sketch's rank guarantee vs exact") {
    val sp = spark
    import sp.implicits._
    val n = 20000
    val rnd = new scala.util.Random(7)
    val vals = Vector.fill(n)(rnd.nextDouble() * 1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("idx", "v")
    val ps = Seq(0.1, 0.5, 0.99)
    val row = graft.operators.ExactQuantile.approx(df, "v", ps, accuracy = 1000).head()
    val est = row.getSeq[Double](0)
    val exact = graft.operators.ExactQuantile.quantiles(df, "v", ps)
    val sorted = vals.sorted
    ps.indices.foreach { k =>
      val rank = sorted.count(_ <= est(k)).toDouble / n
      assert(math.abs(rank - ps(k)) <= 5.0 / 1000 + 1.0 / n,
        s"p=${ps(k)}: est rank $rank outside the sketch bound")
      // and the estimate is inside the exact neighbors' range
      assert(est(k) >= sorted.head && est(k) <= sorted.last)
      assert(math.abs(est(k) - exact(k)) <= (sorted.last - sorted.head) * 0.02,
        s"p=${ps(k)}: approx ${est(k)} far from exact ${exact(k)}")
    }
  }

  test("DSparse fuzz: gram == SpGEMM; zip/aggAll match the dense model") {
    val sp = spark
    import sp.implicits._
    // random small COO matrices (duplicates and cancellations included) +
    // a second operand on the same shape for the union-support zip
    val genCase = for {
      r <- Gen.choose(1, 8); c <- Gen.choose(1, 8)
      n1 <- Gen.choose(0, 12); n2 <- Gen.choose(0, 12)
      cell = for {
        i <- Gen.choose(0, r - 1); j <- Gen.choose(0, c - 1)
        v <- Gen.choose(-5, 5)
      } yield (i.toLong, j.toLong, v.toDouble)
      cells1 <- Gen.listOfN(n1, cell)
      cells2 <- Gen.listOfN(n2, cell)
    } yield (r, c, cells1, cells2)
    def denseOf(r: Int, c: Int, cells: List[(Long, Long, Double)]) = {
      val d = Array.ofDim[Double](r, c)
      cells.foreach { case (i, j, v) => d(i.toInt)(j.toInt) += v }
      d
    }
    def cellsOf(s: DSparse): Map[(Long, Long), Double] =
      s.df.collect().map(x => ((x.getLong(0), x.getLong(1)), x.getDouble(2))).toMap
    val prop = Prop.forAll(genCase) { case (r, c, cells1, cells2) =>
      val d1 = denseOf(r, c, cells1); val d2 = denseOf(r, c, cells2)
      val a = DSparse.fromCOO(
        if (cells1.isEmpty) Seq((0L, 0L, 0.0)).toDF("i", "j", "v")
        else cells1.toDF("i", "j", "v"), r, c)
      val b = DSparse.fromCOO(
        if (cells2.isEmpty) Seq((0L, 0L, 0.0)).toDF("i", "j", "v")
        else cells2.toDF("i", "j", "v"), r, c)
      // 1. the dense-accumulation gram equals the general join+agg SpGEMM
      val gramOk = cellsOf(a.gram) == cellsOf(a.t.matmul(a))
      // 2. union-support zip vs the dense model (absent cells read 0)
      val zModel = (for {
        i <- 0 until r; j <- 0 until c
        w = d1(i)(j) * 2 - d2(i)(j) if w != 0.0
      } yield ((i.toLong, j.toLong), w)).toMap
      val zipOk = cellsOf(a.zip(b, "v1 * 2 - v2")) == zModel
      // 3. implicit-zero-corrected aggregates vs the dense model
      val flat = (for { i <- 0 until r; j <- 0 until c } yield d1(i)(j)).toVector
      val agg = a.aggAll().collect()(0)
      val aggOk = agg.getDouble(0) == flat.sum && agg.getDouble(1) == flat.min &&
        agg.getDouble(2) == flat.max && agg.getLong(3) == flat.count(_ != 0.0)
      if (!(gramOk && zipOk && aggOk))
        println(s"DSPARSE FUZZ FAIL r=$r c=$c cells1=$cells1 cells2=$cells2 " +
          s"gramOk=$gramOk zipOk=$zipOk aggOk=$aggOk agg=$agg flat=$flat")
      gramOk && zipOk && aggOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20).withWorkers(1)
        .withInitialSeed(org.scalacheck.rng.Seed(20260814L)), prop)
    assert(res.passed, s"scalacheck: $res")
  }
}
