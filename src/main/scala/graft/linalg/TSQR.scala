package graft.linalg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DMatrix

/** Tall-skinny QR and SVD (reference `dask_array/linalg/_qr.py:560` tsqr,
  * `linalg/_svd.py:170`): the classic two-level TSQR —
  *
  *  1. rows are grouped into blocks of [[defaultBlockRows]]; each block
  *     gets an in-core Householder QR (`mapGroups`, one task per block);
  *  2. the p stacked k×k R factors (tiny: O(p·k²)) are QR'd in-core on the
  *     driver — exactly the reference's `StackRFactors` → `InCoreQR` step;
  *  3. Q = Q_block · Q2_block, a block-local k×k multiply, emitted back as
  *     a distributed element table.
  *
  * Only O(p·k²) bytes ever reach the driver (the reference makes the same
  * assumption); the n×k data stays partitioned throughout. Signs are
  * normalized so diag(R) ≥ 0, making the factorization unique and
  * deterministic for full-rank inputs.
  */
object TSQR {

  val defaultBlockRows = 4096

  /** In-core thin Householder QR of row-major `a` (m×k, m ≥ k).
    * Returns (Q m×k, R k×k), both row-major. */
  def localQR(a: Array[Double], m: Int, k: Int): (Array[Double], Array[Double]) = {
    require(m >= k, s"localQR needs m >= k, got $m x $k")
    require(k <= 64, s"thin QR supports k <= 64, got $k")
    val r = a.clone() // will hold R in upper triangle, reflectors below
    val betas = new Array[Double](k)
    var j = 0
    while (j < k) {
      // Householder vector for column j
      var norm2 = 0.0
      var i = j
      while (i < m) { val x = r(i * k + j); norm2 += x * x; i += 1 }
      val norm = math.sqrt(norm2)
      val x0 = r(j * k + j)
      val alpha = if (x0 >= 0) -norm else norm
      val v0 = x0 - alpha
      val vnorm2 = norm2 - x0 * x0 + v0 * v0
      if (vnorm2 > 1e-300) {
        betas(j) = 2.0 / vnorm2
        r(j * k + j) = v0
        // apply reflector to remaining columns
        var c = j + 1
        while (c < k) {
          var dot = 0.0
          i = j
          while (i < m) { dot += r(i * k + j) * r(i * k + c); i += 1 }
          val f = betas(j) * dot
          i = j
          while (i < m) { r(i * k + c) -= f * r(i * k + j); i += 1 }
          c += 1
        }
      } else betas(j) = 0.0
      // r(j,j) now holds the reflector head; the R diagonal is alpha
      rDiag(j) = alpha
      j += 1
    }
    // extract R (k×k): upper triangle of the transformed matrix, with the
    // stashed diagonal
    val rr = new Array[Double](k * k)
    var p = 0
    while (p < k) {
      rr(p * k + p) = rDiag(p)
      var q = p + 1
      while (q < k) { rr(p * k + q) = r(p * k + q); q += 1 }
      p += 1
    }
    // build thin Q: apply reflectors (in reverse) to the first k columns
    // of I_m
    val qm = new Array[Double](m * k)
    p = 0
    while (p < k) { qm(p * k + p) = 1.0; p += 1 }
    j = k - 1
    while (j >= 0) {
      if (betas(j) != 0.0) {
        var c = 0
        while (c < k) {
          var dot = 0.0
          var i = j
          while (i < m) { dot += r(i * k + j) * qm(i * k + c); i += 1 }
          val f = betas(j) * dot
          i = j
          while (i < m) { qm(i * k + c) -= f * r(i * k + j); i += 1 }
          c += 1
        }
      }
      j -= 1
    }
    (qm, rr)
  }
  // scratch for the R diagonal during localQR (k is small; thread-local to
  // stay safe under parallel task execution)
  private val rDiagTL = new ThreadLocal[Array[Double]] {
    override def initialValue(): Array[Double] = new Array[Double](64)
  }
  private def rDiag: Array[Double] = rDiagTL.get()

  /** Row-major matmul c = a(m×n) · b(n×p). */
  def mul(a: Array[Double], b: Array[Double], m: Int, n: Int, p: Int): Array[Double] = {
    val c = new Array[Double](m * p)
    var i = 0
    while (i < m) {
      var l = 0
      while (l < n) {
        val av = a(i * n + l)
        if (av != 0.0) {
          var j = 0
          while (j < p) { c(i * p + j) += av * b(l * p + j); j += 1 }
        }
        l += 1
      }
      i += 1
    }
    c
  }

  /** Eigenvalues of a symmetric k×k matrix (cyclic Jacobi), descending. */
  def symEigvals(a0: Array[Double], n: Int): Array[Double] = {
    val a = a0.clone()
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-22) {
      off = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          off += a(p * n + q) * a(p * n + q)
          q += 1
        }
        p += 1
      }
      if (off > 1e-22) {
        p = 0
        while (p < n) {
          var q = p + 1
          while (q < n) {
            val apq = a(p * n + q)
            if (math.abs(apq) > 1e-300) {
              val theta = (a(q * n + q) - a(p * n + p)) / (2 * apq)
              val t = math.signum(theta) match {
                case 0.0 => 1.0
                case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1))
              }
              val c = 1.0 / math.sqrt(t * t + 1)
              val s = t * c
              var r = 0
              while (r < n) {
                val arp = a(r * n + p); val arq = a(r * n + q)
                a(r * n + p) = c * arp - s * arq
                a(r * n + q) = s * arp + c * arq
                r += 1
              }
              r = 0
              while (r < n) {
                val apr = a(p * n + r); val aqr = a(q * n + r)
                a(p * n + r) = c * apr - s * aqr
                a(q * n + r) = s * apr + c * aqr
                r += 1
              }
            }
            q += 1
          }
          p += 1
        }
      }
      sweep += 1
    }
    (0 until n).map(i => a(i * n + i)).sortBy(-_).toArray
  }

  /** Distributed TSQR. Returns (Q as an element-table DMatrix, R row-major
    * k×k on the driver). */
  def tsqr(s: SparkSession, mat: DMatrix, blockRows: Int = defaultBlockRows)
      : (DMatrix, Array[Double]) = {
    import s.implicits._
    val k = mat.cols.toInt
    val n = mat.rows

    // assemble dense rows (the element table stores implicit zeros
    // sparsely — place values by column index), then per-block local QR
    val rowDs = mat.df.groupBy("i")
      .agg(expr("collect_list(struct(j, v))").as("cells"))
      .as[(Long, Array[(Long, Double)])]

    val blockQR = rowDs
      .groupByKey { case (i, _) => i / blockRows }
      .mapGroups { (b, it) =>
        val rs = it.toArray.sortBy(_._1)
        val m = rs.length
        val a = new Array[Double](m * k)
        var i = 0
        while (i < m) {
          rs(i)._2.foreach { case (j, v) => a(i * k + j.toInt) = v }
          i += 1
        }
        val (q, r) = localQR(a, m, k)
        (b, rs.map(_._1), q, r)
      }
      .persist()

    // driver: QR of the stacked R factors (p·k × k — tiny)
    val rFactors = blockQR.map { case (b, _, _, r) => (b, r) }.collect().sortBy(_._1)
    val p = rFactors.length
    val stacked = new Array[Double](p * k * k)
    rFactors.zipWithIndex.foreach { case ((_, r), bi) =>
      System.arraycopy(r, 0, stacked, bi * k * k, k * k)
    }
    val (q2all, rFinal) = localQR(stacked, p * k, k)

    // normalize: diag(R) >= 0 (flip R rows + Q2 columns)
    var j = 0
    while (j < k) {
      if (rFinal(j * k + j) < 0) {
        var c = j
        while (c < k) { rFinal(j * k + c) = -rFinal(j * k + c); c += 1 }
        var i = 0
        while (i < p * k) { q2all(i * k + j) = -q2all(i * k + j); i += 1 }
      }
      j += 1
    }

    val blockIndex = rFactors.map(_._1).zipWithIndex.toMap
    val q2b = s.sparkContext.broadcast((blockIndex, q2all, k))

    // Q = Q_block · Q2_block, re-emitted as an element table
    val qDF: DataFrame = blockQR.flatMap { case (b, ids, q, _) =>
      val (bidx, q2, kk) = q2b.value
      val bi = bidx(b)
      val q2blk = java.util.Arrays.copyOfRange(q2, bi * kk * kk, (bi + 1) * kk * kk)
      val qf = mul(q, q2blk, ids.length, kk, kk)
      for (ri <- ids.indices.iterator; c <- (0 until kk).iterator)
        yield (ids(ri), c.toLong, qf(ri * kk + c))
    }.toDF("i", "j", "v")

    (new DMatrix(qDF, n, k), rFinal)
  }

  /** Least squares min ‖Ax − b‖ via TSQR (reference `lstsq`,
    * `dask_array/linalg/_solve.py:305` — QR-based): x = R⁻¹·(Qᵀb). Qᵀb is
    * one distributed mat-vec (broadcast b); the k×k back-substitution runs
    * on the driver. */
  def lstsq(s: SparkSession, mat: DMatrix, b: Array[Double]): Array[Double] = {
    require(b.length == mat.rows, "rhs length must match rows")
    val k = mat.cols.toInt
    val (q, r) = tsqr(s, mat)
    import s.implicits._
    val bdf = b.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v) }.toDF("i", "bv")
    val qtb = new Array[Double](k)
    q.elements.join(broadcast(bdf), "i")
      .groupBy("j").agg(sum(expr("v * bv")).as("s"))
      .collect().foreach(row => qtb(row.getLong(0).toInt) = row.getDouble(1))
    // back-substitute R x = Qᵀb
    val x = new Array[Double](k)
    var i = k - 1
    while (i >= 0) {
      var acc = qtb(i)
      var j = i + 1
      while (j < k) { acc -= r(i * k + j) * x(j); j += 1 }
      x(i) = acc / r(i * k + i)
      i -= 1
    }
    x
  }

  /** Singular values via TSQR: sv(A) = sv(R) = sqrt(eig(RᵀR)) (reference
    * `linalg/_svd.py:170` builds SVD from the same TSQR pieces). */
  def singularValues(s: SparkSession, mat: DMatrix): Array[Double] = {
    val k = mat.cols.toInt
    val (_, r) = tsqr(s, mat)
    val rtr = new Array[Double](k * k)
    var i = 0
    while (i < k) {
      var j = 0
      while (j < k) {
        var sum = 0.0
        var l = 0
        while (l < k) { sum += r(l * k + i) * r(l * k + j); l += 1 }
        rtr(i * k + j) = sum
        j += 1
      }
      i += 1
    }
    symEigvals(rtr, k).map(e => math.sqrt(math.max(e, 0.0)))
  }
}
