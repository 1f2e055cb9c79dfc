package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.linalg.FFT

class FFTSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Naive O(n²) reference DFT. */
  private def dft(xr: Array[Double], xi: Array[Double]): (Array[Double], Array[Double]) = {
    val n = xr.length
    val or = new Array[Double](n); val oi = new Array[Double](n)
    for (k <- 0 until n; j <- 0 until n) {
      val ang = -2.0 * math.Pi * k * j / n
      or(k) += xr(j) * math.cos(ang) - xi(j) * math.sin(ang)
      oi(k) += xr(j) * math.sin(ang) + xi(j) * math.cos(ang)
    }
    (or, oi)
  }

  private def testSignal(n: Int): Array[Double] =
    Array.tabulate(n)(j => ((j * 37 + 11) % 23).toDouble - 11)

  test("in-core radix-2 matches the naive DFT") {
    val n = 64
    val xr = testSignal(n); val xi = Array.tabulate(n)(j => ((j * 13) % 7).toDouble)
    val (wr, wi) = dft(xr, xi)
    val re = xr.clone(); val im = xi.clone()
    FFT.fftInPlace(re, im, inverse = false)
    for (k <- 0 until n) {
      assert(math.abs(re(k) - wr(k)) < 1e-9, s"re($k)")
      assert(math.abs(im(k) - wi(k)) < 1e-9, s"im($k)")
    }
  }

  test("distributed four-step FFT matches the naive DFT (n=256, n1*n2=16*16)") {
    val n = 256
    val xr = testSignal(n)
    val sp = spark
    import sp.implicits._
    val df = xr.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v, 0.0) }
      .toDF("idx", "re", "im")
    val got = FFT.fft(spark, df, n).orderBy("idx").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val (wr, wi) = dft(xr, new Array[Double](n))
    for (k <- 0 until n) {
      assert(math.abs(got(k)._1 - wr(k)) < 1e-8, s"re($k): ${got(k)._1} vs ${wr(k)}")
      assert(math.abs(got(k)._2 - wi(k)) < 1e-8, s"im($k)")
    }
  }

  test("non-square split (n=128 → 8*16) also matches") {
    val n = 128
    val xr = testSignal(n)
    val sp = spark
    import sp.implicits._
    val df = xr.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v, 0.0) }
      .toDF("idx", "re", "im")
    val got = FFT.fft(spark, df, n).orderBy("idx").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val (wr, wi) = dft(xr, new Array[Double](n))
    for (k <- 0 until n)
      assert(math.abs(got(k)._1 - wr(k)) < 1e-8 && math.abs(got(k)._2 - wi(k)) < 1e-8, s"k=$k")
  }

  test("ifft(fft(x)) round-trips") {
    val n = 64
    val xr = testSignal(n)
    val sp = spark
    import sp.implicits._
    val df = xr.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v, 0.0) }
      .toDF("idx", "re", "im")
    val back = FFT.fft(spark, FFT.fft(spark, df, n), n, inverse = true)
      .orderBy("idx").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    for (k <- 0 until n) {
      assert(math.abs(back(k)._1 - xr(k)) < 1e-9, s"re($k)")
      assert(math.abs(back(k)._2) < 1e-9, s"im($k)")
    }
  }

  test("irfft(rfft(x)) recovers a real signal") {
    val n = 64
    val xr = testSignal(n)
    val sp = spark
    import sp.implicits._
    val df = xr.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v) }.toDF("idx", "v")
    val back = FFT.irfft(spark, FFT.rfft(spark, df, n), n)
      .orderBy("idx").collect().map(_.getDouble(1))
    for (k <- 0 until n) assert(math.abs(back(k) - xr(k)) < 1e-9, s"k=$k")
  }

  test("hfft(ihfft(x)) recovers a real signal, scaled DFT identity holds") {
    val n = 64
    val xr = testSignal(n)
    val sp = spark
    import sp.implicits._
    val df = xr.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v) }.toDF("idx", "v")
    val back = FFT.hfft(spark, FFT.ihfft(spark, df, n), n)
      .orderBy("idx").collect().map(_.getDouble(1))
    for (k <- 0 until n) assert(math.abs(back(k) - xr(k)) < 1e-9, s"k=$k")
    // hfft of a REAL half-spectrum (im=0) equals the even extension's DFT
    // real part: spot-check bin 0 = a0 + 2*sum(interior) + a_{n/2}
    val half = (0 to n / 2).map(i => (i.toLong, (i % 5).toDouble, 0.0))
      .toDF("idx", "re", "im")
    val h = FFT.hfft(spark, half, n).orderBy("idx").collect().map(_.getDouble(1))
    val expected0 = (0 to n / 2).map { i =>
      val w = if (i == 0 || i == n / 2) 1.0 else 2.0
      w * (i % 5).toDouble
    }.sum
    assert(math.abs(h(0) - expected0) < 1e-9, s"${h(0)} vs $expected0")
  }

  test("fft2 matches the naive 2-d DFT and inverse round-trips") {
    val rows = 16; val cols = 8
    val x = Array.tabulate(rows, cols)((i, j) => ((i * 5 + j * 11 + 3) % 13).toDouble - 6)
    val sp = spark
    import sp.implicits._
    val df = (for (i <- 0 until rows; j <- 0 until cols)
      yield (i.toLong, j.toLong, x(i)(j), 0.0)).toDF("i", "j", "re", "im")
    val got = FFT.fft2(spark, df, rows, cols).orderBy("i", "j").collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    // naive 2-d DFT
    for (k1 <- 0 until rows; k2 <- 0 until cols) {
      var wr = 0.0; var wi = 0.0
      for (j1 <- 0 until rows; j2 <- 0 until cols) {
        val ang = -2.0 * math.Pi * (k1.toDouble * j1 / rows + k2.toDouble * j2 / cols)
        wr += x(j1)(j2) * math.cos(ang)
        wi += x(j1)(j2) * math.sin(ang)
      }
      val (gr, gi) = got(k1 * cols + k2)
      assert(math.abs(gr - wr) < 1e-8 && math.abs(gi - wi) < 1e-8, s"($k1,$k2)")
    }
    val back = FFT.fft2(spark, FFT.fft2(spark, df, rows, cols), rows, cols, inverse = true)
      .orderBy("i", "j").collect().map(_.getDouble(2))
    for (k <- 0 until rows * cols)
      assert(math.abs(back(k) - x(k / cols)(k % cols)) < 1e-9, s"roundtrip $k")
  }

  test("fftn: rank-2 agrees with fft2; rank-3 inverse round-trips and Parseval holds") {
    val sp = spark
    import sp.implicits._
    // rank 2: fftn agrees with fft2 to fp noise (same per-line kernel;
    // the axis ORDER differs — fft2 transforms axis 1 first, fftn axis 0
    // — so the sums associate differently and last-ulp drift is expected)
    val (rows, cols) = (8, 16)
    val df2 = (for (i <- 0 until rows; j <- 0 until cols)
      yield (i.toLong, j.toLong, ((i * 3 + j * 7 + 1) % 11).toDouble - 5, 0.0))
      .toDF("c0", "c1", "re", "im")
    val viaN = FFT.fftn(spark, df2, Seq(rows, cols)).orderBy("c0", "c1").collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    val via2 = FFT.fft2(spark,
        df2.toDF("i", "j", "re", "im"), rows, cols).orderBy("i", "j").collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    viaN.zip(via2).zipWithIndex.foreach { case (((ar, ai), (br, bi)), k) =>
      assert(math.abs(ar - br) < 1e-9 && math.abs(ai - bi) < 1e-9,
        s"fftn vs fft2 cell $k")
    }
    // rank 3: ifftn(fftn(x)) == x and Parseval
    val shape = Seq(4L, 8L, 4L)
    val n = shape.product.toInt
    val vals = Array.tabulate(n)(k => ((k * 7 + 3) % 13).toDouble - 6)
    val df3 = (0 until n).map { k =>
      (k / 32L, (k / 4L) % 8L, k % 4L, vals(k), 0.0)
    }.toDF("c0", "c1", "c2", "re", "im")
    val spec = FFT.fftn(spark, df3, shape)
    val energy = spec.selectExpr(s"sum(re*re + im*im) / $n AS e").collect()(0).getDouble(0)
    val direct = vals.map(v => v * v).sum
    assert(math.abs(energy - direct) < 1e-6, s"parseval $energy vs $direct")
    val back = FFT.fftn(spark, spec, shape, inverse = true)
      .orderBy("c0", "c1", "c2").collect().map(_.getDouble(3))
    for (k <- 0 until n)
      assert(math.abs(back(k) - vals(k)) < 1e-9, s"roundtrip $k")
  }

  test("Bluestein: arbitrary lengths match the naive DFT (composite and prime)") {
    // exhaustive small-n sweep (primes, prime powers, composites, pow2)
    for (n <- (2 to 40) ++ Seq(45, 63, 100)) {
      val xr = Array.tabulate(n)(k => ((k * 7 + 2) % 9).toDouble - 4)
      val xi = Array.tabulate(n)(k => ((k * 3 + 1) % 5).toDouble - 2)
      val re = xr.clone(); val im = xi.clone()
      FFT.fftInPlace(re, im, inverse = false)
      for (k <- 0 until n) {
        var wr = 0.0; var wi = 0.0
        for (j <- 0 until n) {
          val ang = -2.0 * math.Pi * k * j / n
          wr += xr(j) * math.cos(ang) - xi(j) * math.sin(ang)
          wi += xr(j) * math.sin(ang) + xi(j) * math.cos(ang)
        }
        assert(math.abs(re(k) - wr) < 1e-8 && math.abs(im(k) - wi) < 1e-8, s"n=$n k=$k")
      }
      // unscaled-inverse round trip (inverse sums without 1/n — scale here)
      FFT.fftInPlace(re, im, inverse = true)
      for (k <- 0 until n)
        assert(math.abs(re(k) / n - xr(k)) < 1e-9 && math.abs(im(k) / n - xi(k)) < 1e-9)
    }
  }

  test("distributed fft and fftn at non-power-of-two lengths") {
    val sp = spark
    import sp.implicits._
    // n = 96 → split (8, 12): the 12-length lines run Bluestein in-core
    val n = 96
    val vals = Array.tabulate(n)(k => ((k * 5 + 1) % 13).toDouble - 6)
    val df = (0 until n).map(k => (k.toLong, vals(k), 0.0)).toDF("idx", "re", "im")
    assert(FFT.split(96) == (8L, 12L))
    val spec = FFT.fft(spark, df, n)
    val energy = spec.selectExpr(s"sum(re*re + im*im) / $n AS e").collect()(0).getDouble(0)
    assert(math.abs(energy - vals.map(v => v * v).sum) < 1e-6, "parseval n=96")
    val back = FFT.fft(spark, spec, n, inverse = true)
      .orderBy("idx").collect().map(_.getDouble(1))
    for (k <- 0 until n) assert(math.abs(back(k) - vals(k)) < 1e-9, s"roundtrip $k")
    // rank-2 fftn with non-pow2 extents (6, 10)
    val shape = Seq(6L, 10L)
    val m = 60
    val v2 = Array.tabulate(m)(k => ((k * 11 + 4) % 7).toDouble - 3)
    val df2 = (0 until m).map(k => (k / 10L, k % 10L, v2(k), 0.0)).toDF("c0", "c1", "re", "im")
    val s2 = FFT.fftn(spark, df2, shape)
    val e2 = s2.selectExpr(s"sum(re*re + im*im) / $m AS e").collect()(0).getDouble(0)
    assert(math.abs(e2 - v2.map(v => v * v).sum) < 1e-6, "parseval (6,10)")
    val b2 = FFT.fftn(spark, s2, shape, inverse = true)
      .orderBy("c0", "c1").collect().map(_.getDouble(2))
    for (k <- 0 until m) assert(math.abs(b2(k) - v2(k)) < 1e-9, s"nd roundtrip $k")
  }

  test("rfftn keeps the fftn half-spectrum; irfftn recovers the real signal") {
    val sp = spark
    import sp.implicits._
    val shape = Seq(4L, 8L)
    val n = shape.product.toInt
    val vals = Array.tabulate(n)(k => ((k * 5 + 2) % 11).toDouble - 5)
    val df = (0 until n).map(k => (k / 8L, k % 8L, vals(k), 0.0))
      .toDF("c0", "c1", "re", "im")
    // rfftn == fftn restricted to the last-axis half
    val half = FFT.rfftn(spark, df, shape).orderBy("c0", "c1").collect()
    assert(half.length == 4 * (8 / 2 + 1))
    val full = FFT.fftn(spark, df, shape).where("c1 <= 4").orderBy("c0", "c1").collect()
    half.zip(full).foreach { case (h, f) =>
      assert(h.getDouble(2) == f.getDouble(2) && h.getDouble(3) == f.getDouble(3))
    }
    // inverse round trip back to the real signal
    val back = FFT.irfftn(spark, FFT.rfftn(spark, df, shape), shape)
      .orderBy("c0", "c1").collect().map(_.getDouble(2))
    for (k <- 0 until n)
      assert(math.abs(back(k) - vals(k)) < 1e-9, s"roundtrip $k")
  }

  test("fftfreq and fftshift index math") {
    val f = FFT.fftfreq(spark, 8, d = 0.5).orderBy("idx").collect().map(_.getDouble(1))
    assert(f.toSeq == Seq(0.0, 0.25, 0.5, 0.75, -1.0, -0.75, -0.5, -0.25))
    val sp = spark
    import sp.implicits._
    val df = (0 until 8).map(i => (i.toLong, i.toDouble, 0.0)).toDF("idx", "re", "im")
    val sh = FFT.fftshift(df, 8).orderBy("idx").collect().map(_.getDouble(1))
    assert(sh.toSeq == Seq(4.0, 5, 6, 7, 0, 1, 2, 3))
    // odd n: numpy roll(x, n//2) puts the zero bin at floor(n/2)
    val df5 = (0 until 5).map(i => (i.toLong, i.toDouble, 0.0)).toDF("idx", "re", "im")
    val sh5 = FFT.fftshift(df5, 5).orderBy("idx").collect().map(_.getDouble(1))
    assert(sh5.toSeq == Seq(3.0, 4, 0, 1, 2), sh5.toSeq.toString)
  }

  test("rfftfreq and ifftshift match numpy's grids (odd and even n)") {
    val s = TestSpark.spark
    // np.fft.rfftfreq(8, d=0.5) = [0, .25, .5, .75, 1.0]
    val rf = graft.linalg.FFT.rfftfreq(s, 8, 0.5).orderBy("idx")
      .collect().map(_.getDouble(1)).toSeq
    assert(rf == Seq(0.0, 0.25, 0.5, 0.75, 1.0))
    // ifftshift inverts fftshift for odd n: roll ceil(n/2) after floor(n/2)
    for (n <- Seq(6L, 7L)) {
      val base = s.range(n).selectExpr("id AS idx", "CAST(id AS DOUBLE) AS v")
      val round2 = graft.linalg.FFT.ifftshift(graft.linalg.FFT.fftshift(base, n), n)
        .orderBy("idx").collect().map(_.getDouble(1)).toSeq
      assert(round2 == (0L until n).map(_.toDouble), s"n=$n: $round2")
    }
  }
}
