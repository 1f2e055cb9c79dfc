package graft.linalg

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.DMatrix

/** Blocked Cholesky factorization A = L·Lᵀ (reference
  * `dask_array/linalg/_cholesky.py:27` — recursive blocked algorithm with
  * driver-coordinated stages; here the right-looking panel variant):
  *
  * per block-column k — (1) the diagonal tile is factored in-core on the
  * driver, (2) the panel below it is collected (O(nb·T²) transient driver
  * bytes — one block column, the same bound the reference's sequential
  * recurrence accepts), solved against Lkkᵀ in-core, and re-distributed,
  * (3) the trailing submatrix update A[i,j] -= L[i,k]·L[j,k]ᵀ runs
  * DISTRIBUTED as a broadcast-map over the remaining tiles. The data-sized
  * work (trailing updates, O(n³) total FLOPs) never leaves the cluster;
  * only panels stream through the driver.
  */
object Cholesky {

  /** In-core lower Cholesky of row-major SPD `a` (t×t). */
  def localChol(a: Array[Double], t: Int): Array[Double] = {
    val l = new Array[Double](t * t)
    var j = 0
    while (j < t) {
      var d = a(j * t + j)
      var k = 0
      while (k < j) { d -= l(j * t + k) * l(j * t + k); k += 1 }
      require(d > 0, s"matrix not positive definite at block row $j (d=$d)")
      val ljj = math.sqrt(d)
      l(j * t + j) = ljj
      var i = j + 1
      while (i < t) {
        var s = a(i * t + j)
        k = 0
        while (k < j) { s -= l(i * t + k) * l(j * t + k); k += 1 }
        l(i * t + j) = s / ljj
        i += 1
      }
      j += 1
    }
    l
  }

  /** Solve X·Lᵀ = B in-core (B t×t row-major, L lower-triangular t×t):
    * forward substitution per row of B. */
  def localSolveXLt(b: Array[Double], l: Array[Double], t: Int): Array[Double] = {
    val x = new Array[Double](t * t)
    var i = 0
    while (i < t) {
      var j = 0
      while (j < t) {
        var s = b(i * t + j)
        var k = 0
        while (k < j) { s -= x(i * t + k) * l(j * t + k); k += 1 }
        x(i * t + j) = s / l(j * t + j)
        j += 1
      }
      i += 1
    }
    x
  }

  /** c -= a · bᵀ for t×t row-major tiles. */
  private def subMulT(c: Array[Double], a: Array[Double], b: Array[Double], t: Int): Unit = {
    var i = 0
    while (i < t) {
      var j = 0
      while (j < t) {
        var s = 0.0
        var k = 0
        while (k < t) { s += a(i * t + k) * b(j * t + k); k += 1 }
        c(i * t + j) -= s
        j += 1
      }
      i += 1
    }
  }

  /** Distributed blocked Cholesky. `a` must be symmetric positive definite;
    * only the lower triangle is read. Returns lower-triangular L. */
  def cholesky(s: SparkSession, a: DMatrix, tile: Int = 512): DMatrix = {
    require(a.rows == a.cols, "cholesky needs a square matrix")
    import s.implicits._
    val n = a.rows
    val t = tile
    val tL = t.toLong
    val nb = ((n + t - 1) / t).toInt

    // lower-triangle tiles, densified; padded diagonal cells get 1.0 so
    // partial edge tiles stay positive definite. The tile grid is
    // materialized from the FULL lower triangle of (bi, bj) — not just
    // blocks with nonzero cells — because trailing updates create fill-in:
    // an all-zero input block still receives A[i,j] -= L[i,k]·L[j,k]ᵀ and
    // dropping it would silently corrupt the factorization (e.g. an
    // arrowhead matrix whose interior blocks are zero).
    val grid = s.range(nb.toLong * nb)
      .selectExpr(s"id DIV $nb AS bi", s"id % $nb AS bj")
      .where("bi >= bj")
    val present = a.df.where(col("i") >= col("j"))
      .selectExpr(s"i DIV $tL AS bi", s"j DIV $tL AS bj",
        s"i % $tL AS ti", s"j % $tL AS tj", "v")
      .groupBy("bi", "bj")
      .agg(expr("collect_list(struct(ti, tj, v))").as("cells"))
    var cur = grid.join(present, Seq("bi", "bj"), "left")
      .selectExpr("bi", "bj",
        "coalesce(cells, CAST(array() AS ARRAY<STRUCT<ti: BIGINT, tj: BIGINT, v: DOUBLE>>)) AS cells")
      .as[(Long, Long, Array[(Long, Long, Double)])]
      .map { case (bi, bj, cells) =>
        val arr = new Array[Double](t * t)
        if (bi == bj) {
          var d = 0
          while (d < t) {
            if (bi * tL + d >= n) arr(d * t + d) = 1.0
            d += 1
          }
        }
        cells.foreach { case (ti, tj, v) => arr(ti.toInt * t + tj.toInt) = v }
        (bi, bj, arr)
      }.persist()

    val lPanels = ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    // deferred unpersist: each step's panel collect scans (and so
    // materializes) the freshly-persisted `cur`, so the PREVIOUS
    // generation can be dropped then — no standalone count() jobs
    var prevGen: org.apache.spark.sql.Dataset[(Long, Long, Array[Double])] = null

    var k = 0
    while (k < nb) {
      // (1)+(2) collect block column k, factor in-core
      val panel = cur.filter(r => r._2 == k).collect().sortBy(_._1)
      if (prevGen != null) { prevGen.unpersist(); prevGen = null }
      val akk = panel.find(_._1 == k).get._3
      val lkk = localChol(akk, t)
      val lPanel: Map[Long, Array[Double]] =
        panel.map { case (bi, _, arr) =>
          bi -> (if (bi == k) lkk else localSolveXLt(arr, lkk, t))
        }.toMap

      // emit this panel of L as distributed elements (lower triangle only)
      val kk = k
      val rows = lPanel.toSeq.flatMap { case (bi, arr) =>
        for {
          ti <- 0 until t
          tj <- 0 until t
          i = bi * tL + ti
          j = kk * tL + tj
          if i < n && j < n && i >= j && arr(ti * t + tj) != 0.0
        } yield (i, j, arr(ti * t + tj))
      }
      lPanels += s.createDataFrame(rows).toDF("i", "j", "v")

      // (3) distributed trailing update on tiles with bj > k
      if (k < nb - 1) {
        val bc = s.sparkContext.broadcast(lPanel)
        val next = cur.filter(r => r._2 > kk)
          .map { case (bi, bj, arr) =>
            val p = bc.value
            val out = arr.clone()
            (p.get(bi), p.get(bj)) match {
              case (Some(lik), Some(ljk)) => subMulT(out, lik, ljk, t)
              case _                      =>
            }
            (bi, bj, out)
          }.persist()
        prevGen = cur
        cur = next
      }
      k += 1
    }
    cur.unpersist()
    if (prevGen != null) prevGen.unpersist()

    val lDF = lPanels.reduce(_ unionByName _)
    new DMatrix(lDF, n, n)
  }

  /** In-core LU without pivoting (Doolittle; unit lower L). Suitable for
    * diagonally dominant tiles — the no-global-pivoting constraint of the
    * blocked algorithm (reference `linalg/_lu.py:27` confines pivoting to
    * per-tile scopes for the same reason). */
  def localLU(a: Array[Double], t: Int): (Array[Double], Array[Double]) = {
    val l = new Array[Double](t * t)
    val u = new Array[Double](t * t)
    var i = 0
    while (i < t) { l(i * t + i) = 1.0; i += 1 }
    var k = 0
    while (k < t) {
      var j = k
      while (j < t) { // U row k
        var s = a(k * t + j)
        var p = 0
        while (p < k) { s -= l(k * t + p) * u(p * t + j); p += 1 }
        u(k * t + j) = s
        j += 1
      }
      require(math.abs(u(k * t + k)) > 1e-12, s"zero pivot at $k (needs pivoting)")
      i = k + 1
      while (i < t) { // L column k
        var s = a(i * t + k)
        var p = 0
        while (p < k) { s -= l(i * t + p) * u(p * t + k); p += 1 }
        l(i * t + k) = s / u(k * t + k)
        i += 1
      }
      k += 1
    }
    (l, u)
  }

  /** Solve X·U = B in-core (U upper-triangular). */
  def localSolveXU(b: Array[Double], u: Array[Double], t: Int): Array[Double] = {
    val x = new Array[Double](t * t)
    var i = 0
    while (i < t) {
      var j = 0
      while (j < t) {
        var s = b(i * t + j)
        var k = 0
        while (k < j) { s -= x(i * t + k) * u(k * t + j); k += 1 }
        x(i * t + j) = s / u(j * t + j)
        j += 1
      }
      i += 1
    }
    x
  }

  /** Solve L·X = B in-core (unit lower-triangular L). */
  def localSolveLX(b: Array[Double], l: Array[Double], t: Int): Array[Double] = {
    val x = new Array[Double](t * t)
    var j = 0
    while (j < t) {
      var i = 0
      while (i < t) {
        var s = b(i * t + j)
        var k = 0
        while (k < i) { s -= l(i * t + k) * x(k * t + j); k += 1 }
        x(i * t + j) = s / l(i * t + i)
        i += 1
      }
      j += 1
    }
    x
  }

  /** c -= a · b (plain, row-major t×t). */
  private def subMul(c: Array[Double], a: Array[Double], b: Array[Double], t: Int): Unit = {
    var i = 0
    while (i < t) {
      var k = 0
      while (k < t) {
        val av = a(i * t + k)
        if (av != 0.0) {
          var j = 0
          while (j < t) { c(i * t + j) -= av * b(k * t + j); j += 1 }
        }
        k += 1
      }
      i += 1
    }
  }

  /** Distributed blocked LU A = L·U without global pivoting (reference
    * `lu`, `linalg/_lu.py:27` — same driver-panel + distributed-trailing
    * shape as [[cholesky]]). Requires a numerically safe (e.g. diagonally
    * dominant) matrix; the per-tile factorization asserts nonzero pivots. */
  def lu(s: SparkSession, a: DMatrix, tile: Int = 512): (DMatrix, DMatrix) = {
    require(a.rows == a.cols, "lu needs a square matrix")
    import s.implicits._
    val n = a.rows
    val t = tile
    val tL = t.toLong
    val nb = ((n + t - 1) / t).toInt

    // full (bi, bj) tile grid, zero-filled where the input has no cells —
    // trailing updates fill in blocks that start all-zero (see cholesky)
    val grid = s.range(nb.toLong * nb)
      .selectExpr(s"id DIV $nb AS bi", s"id % $nb AS bj")
    val present = a.df
      .selectExpr(s"i DIV $tL AS bi", s"j DIV $tL AS bj",
        s"i % $tL AS ti", s"j % $tL AS tj", "v")
      .groupBy("bi", "bj")
      .agg(expr("collect_list(struct(ti, tj, v))").as("cells"))
    var cur = grid.join(present, Seq("bi", "bj"), "left")
      .selectExpr("bi", "bj",
        "coalesce(cells, CAST(array() AS ARRAY<STRUCT<ti: BIGINT, tj: BIGINT, v: DOUBLE>>)) AS cells")
      .as[(Long, Long, Array[(Long, Long, Double)])]
      .map { case (bi, bj, cells) =>
        val arr = new Array[Double](t * t)
        if (bi == bj) { // pad diagonal beyond n for partial edge tiles
          var d = 0
          while (d < t) { if (bi * tL + d >= n) arr(d * t + d) = 1.0; d += 1 }
        }
        cells.foreach { case (ti, tj, v) => arr(ti.toInt * t + tj.toInt) = v }
        (bi, bj, arr)
      }.persist()

    val lParts = ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    val uParts = ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    var prevGen: org.apache.spark.sql.Dataset[(Long, Long, Array[Double])] = null

    def emit(buf: ArrayBuffer[org.apache.spark.sql.DataFrame],
             tiles: Seq[(Long, Long, Array[Double])], lower: Boolean): Unit = {
      val rows = tiles.flatMap { case (bi, bj, arr) =>
        for {
          ti <- 0 until t
          tj <- 0 until t
          i = bi * tL + ti
          j = bj * tL + tj
          if i < n && j < n && arr(ti * t + tj) != 0.0
          if (lower && i >= j) || (!lower && j >= i)
        } yield (i, j, arr(ti * t + tj))
      }
      buf += s.createDataFrame(rows).toDF("i", "j", "v")
    }

    var k = 0
    while (k < nb) {
      val kk = k
      // collect block row + column k
      val panel = cur.filter(r => r._1 == kk || r._2 == kk).collect()
      if (prevGen != null) { prevGen.unpersist(); prevGen = null }
      val akk = panel.find(r => r._1 == kk && r._2 == kk).get._3
      val (lkk, ukk) = localLU(akk, t)
      val lCol: Map[Long, Array[Double]] = panel.collect {
        case (bi, bj, arr) if bj == kk && bi > kk => bi -> localSolveXU(arr, ukk, t)
      }.toMap + (kk.toLong -> lkk)
      val uRow: Map[Long, Array[Double]] = panel.collect {
        case (bi, bj, arr) if bi == kk && bj > kk => bj -> localSolveLX(arr, lkk, t)
      }.toMap + (kk.toLong -> ukk)

      emit(lParts, lCol.toSeq.map { case (bi, arr) => (bi, kk.toLong, arr) }, lower = true)
      emit(uParts, uRow.toSeq.map { case (bj, arr) => (kk.toLong, bj, arr) }, lower = false)

      if (k < nb - 1) {
        val bcL = s.sparkContext.broadcast(lCol)
        val bcU = s.sparkContext.broadcast(uRow)
        val next = cur.filter(r => r._1 > kk && r._2 > kk)
          .map { case (bi, bj, arr) =>
            val out = arr.clone()
            (bcL.value.get(bi), bcU.value.get(bj)) match {
              case (Some(lik), Some(ukj)) => subMul(out, lik, ukj, t)
              case _                      =>
            }
            (bi, bj, out)
          }.persist()
        prevGen = cur
        cur = next
      }
      k += 1
    }
    cur.unpersist()
    if (prevGen != null) prevGen.unpersist()

    (new DMatrix(lParts.reduce(_ unionByName _), n, n),
      new DMatrix(uParts.reduce(_ unionByName _), n, n))
  }

  /** Solve U·X = B in-core (U upper-triangular, t×t row-major): backward
    * substitution per column of B. */
  def localSolveUX(b: Array[Double], u: Array[Double], t: Int): Array[Double] = {
    val x = new Array[Double](t * t)
    var j = 0
    while (j < t) {
      var i = t - 1
      while (i >= 0) {
        var s = b(i * t + j)
        var k = i + 1
        while (k < t) { s -= u(i * t + k) * x(k * t + j); k += 1 }
        x(i * t + j) = s / u(i * t + i)
        i -= 1
      }
      j += 1
    }
    x
  }

  /** Full zero-filled tile grid of a DMatrix (rows×cols, t×t tiles), with
    * `diagPad` on diagonal positions past the logical edge so triangular
    * tiles stay solvable. Absent input tiles materialize as zero tiles —
    * the trailing updates of the solves need them (same fill-in argument
    * as [[cholesky]]). */
  private def tileGrid(s: SparkSession, m: DMatrix, t: Int, diagPad: Boolean) = {
    import s.implicits._
    val tL = t.toLong
    val nbr = ((m.rows + t - 1) / t).toInt
    val nbc = ((m.cols + t - 1) / t).toInt
    val n = m.rows
    val grid = s.range(nbr.toLong * nbc)
      .selectExpr(s"id DIV $nbc AS bi", s"id % $nbc AS bj")
    val present = m.df
      .selectExpr(s"i DIV $tL AS bi", s"j DIV $tL AS bj",
        s"i % $tL AS ti", s"j % $tL AS tj", "v")
      .groupBy("bi", "bj")
      .agg(expr("collect_list(struct(ti, tj, v))").as("cells"))
    grid.join(present, Seq("bi", "bj"), "left")
      .selectExpr("bi", "bj",
        "coalesce(cells, CAST(array() AS ARRAY<STRUCT<ti: BIGINT, tj: BIGINT, v: DOUBLE>>)) AS cells")
      .as[(Long, Long, Array[(Long, Long, Double)])]
      .map { case (bi, bj, cells) =>
        val arr = new Array[Double](t * t)
        if (diagPad && bi == bj) {
          var d0 = 0
          while (d0 < t) { if (bi * tL + d0 >= n) arr(d0 * t + d0) = 1.0; d0 += 1 }
        }
        cells.foreach { case (ti, tj, v) => arr(ti.toInt * t + tj.toInt) = v }
        (bi, bj, arr)
      }
  }

  /** Collect one t×t tile block-column of a triangular factor to the
    * driver: O(nb·t²) transient bytes — the same panel bound the
    * factorizations accept. Diagonal tile padded to 1 past the edge. */
  private def collectColPanel(f: DMatrix, k: Int, t: Int, lower: Boolean): Map[Long, Array[Double]] = {
    val tL = t.toLong
    val n = f.rows
    val sel =
      if (lower) f.df.where(col("j") >= k * tL && col("j") < (k + 1) * tL && col("i") >= k * tL)
      else f.df.where(col("j") >= k * tL && col("j") < (k + 1) * tL && col("i") < (k + 1) * tL)
    val rows = sel.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byTile = rows.groupBy(_._1 / tL)
    byTile.map { case (bi, cs) =>
      val arr = new Array[Double](t * t)
      if (bi == k) {
        var d0 = 0
        while (d0 < t) { if (k * tL + d0 >= n) arr(d0 * t + d0) = 1.0; d0 += 1 }
      }
      cs.foreach { case (i, j, v) => arr(((i % tL) * tL + (j % tL)).toInt) = v }
      (bi, arr)
    }
  }

  /** Block forward substitution with a MATRIX right-hand side: X with
    * L·X = B, both distributed tile sets (reference `solve_triangular`,
    * `linalg/_solve.py:20` — lower=True path). Right-looking: per block
    * step, the X block-row solves distributedly under a broadcast Lkk,
    * then the trailing B rows take `B_i -= L_ik·X_k` as a broadcast map —
    * the O(n³) work never leaves the cluster; only O(nb·t²) panels
    * stream through the driver. */
  def solveLowerTiles(s: SparkSession, l: DMatrix, b: DMatrix, tile: Int = 512): DMatrix = {
    solveTriTiles(s, l, b, tile, lower = true)
  }

  /** Block backward substitution: X with U·X = B (upper path). */
  def solveUpperTiles(s: SparkSession, u: DMatrix, b: DMatrix, tile: Int = 512): DMatrix = {
    solveTriTiles(s, u, b, tile, lower = false)
  }

  private def solveTriTiles(s: SparkSession, f: DMatrix, b: DMatrix, tile: Int,
                            lower: Boolean): DMatrix = {
    require(f.rows == f.cols && f.rows == b.rows, "shape mismatch")
    import s.implicits._
    val t = tile
    val tL = t.toLong
    val n = f.rows
    val m = b.cols
    val nb = ((n + t - 1) / t).toInt
    var cur = tileGrid(s, b, t, diagPad = false).persist()
    var prevGen: org.apache.spark.sql.Dataset[(Long, Long, Array[Double])] = null
    val xParts = ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    val ks = if (lower) 0 until nb else (nb - 1) to 0 by -1
    for (k <- ks) {
      val kk = k.toLong
      val panel = collectColPanel(f, k, t, lower) // block column k of the factor
      val fkk = panel(kk)
      val bcDiag = s.sparkContext.broadcast(fkk)
      // X_k = Fkk⁻¹ B_k, one task per column tile of block row k
      val xk = cur.filter(r => r._1 == kk)
        .map { case (bi, bj, arr) =>
          val x = if (lower) localSolveLX(arr, bcDiag.value, t)
                  else localSolveUX(arr, bcDiag.value, t)
          (bi, bj, x)
        }.collect() // one block row: O(nbc·t²), the accepted panel bound
      if (prevGen != null) { prevGen.unpersist(); prevGen = null }
      val rows = xk.flatMap { case (bi, bj, arr) =>
        for {
          ti <- 0 until t; tj <- 0 until t
          i = bi * tL + ti; j = bj * tL + tj
          if i < n && j < m && arr(ti * t + tj) != 0.0
        } yield (i, j, arr(ti * t + tj))
      }
      xParts += s.createDataFrame(rows.toSeq).toDF("i", "j", "v")
      // trailing update on unsolved block rows
      val remaining = if (lower) (bi: Long) => bi > kk else (bi: Long) => bi < kk
      if (ks.last != k) {
        val bcPanel = s.sparkContext.broadcast(panel)
        val bcXk = s.sparkContext.broadcast(xk.map { case (_, bj, arr) => bj -> arr }.toMap)
        val next = cur.filter(r => remaining(r._1))
          .map { case (bi, bj, arr) =>
            (bcPanel.value.get(bi), bcXk.value.get(bj)) match {
              case (Some(fik), Some(xkj)) =>
                val out = arr.clone(); subMul(out, fik, xkj, t); (bi, bj, out)
              case _ => (bi, bj, arr)
            }
          }.persist()
        prevGen = cur
        cur = next
      }
    }
    cur.unpersist()
    if (prevGen != null) prevGen.unpersist()
    new DMatrix(xParts.reduce(_ unionByName _), n, m)
  }

  /** Matrix inverse via LU (reference `inv`, `linalg/_solve.py:225` —
    * `solve(a, eye)`): A⁻¹ = U⁻¹ L⁻¹ I by two blocked triangular solves
    * with the identity as the right-hand side. The result is dense n² by
    * nature; every heavy stage stays distributed. */
  def inv(s: SparkSession, a: DMatrix, tile: Int = 512): DMatrix = {
    require(a.rows == a.cols, "inv needs a square matrix")
    val (l, u) = lu(s, a, tile)
    val eye = DMatrix.eye(s, a.rows.toInt)
    val y = solveLowerTiles(s, l, eye, tile)
    solveUpperTiles(s, u, y, tile)
  }

  /** General (non-SPD) solve A·x = b via LU + two triangular solves
    * (reference `solve`, `linalg/_solve.py:163`). */
  def solveLU(s: SparkSession, a: DMatrix, b: Array[Double], tile: Int = 512): Array[Double] = {
    val (l, u) = lu(s, a, tile)
    val n = a.rows.toInt
    val sess = s
    import sess.implicits._
    val bdf = new DMatrix(
      b.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, 0L, v) }.toDF("i", "j", "v"), n, 1)
    val y = solveLowerTiles(s, l, bdf, tile)
    val x = solveUpperTiles(s, u, y, tile)
    val out = new Array[Double](n)
    x.df.collect().foreach(r => out(r.getLong(0).toInt) = r.getDouble(2))
    out
  }

  /** Solve L·y = b for lower-triangular L (reference `solve_triangular`,
    * `dask_array/linalg/_solve.py:20`): block forward substitution — a
    * driver loop over block rows; each step is one distributed gather of
    * the O(T) solution slice plus local substitution. Returns the dense
    * solution vector (driver-side, O(n) — the right-hand-side bound). */
  def solveLower(s: SparkSession, l: DMatrix, b: Array[Double], tile: Int = 512): Array[Double] = {
    require(l.rows == l.cols && b.length == l.rows, "shape mismatch")
    val n = l.rows.toInt
    val t = tile
    val nb = (n + t - 1) / t
    val y = b.clone()
    // collect L block-row by block-row: O(row panel) driver bytes per step
    var k = 0
    while (k < nb) {
      val r0 = k * t
      val r1 = math.min(r0 + t, n)
      val rows = l.df
        .where(col("i") >= r0 && col("i") < r1 && col("j") < r1)
        .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
      val cells = rows.groupBy(_._1)
      var i = r0
      while (i < r1) {
        var s0 = y(i)
        var dii = 0.0
        cells.getOrElse(i, Array.empty).foreach { case (_, j, v) =>
          if (j < i) s0 -= v * y(j) else if (j == i) dii = v
        }
        require(dii != 0.0, s"zero diagonal at $i")
        y(i) = s0 / dii
        i += 1
      }
      k += 1
    }
    y
  }

  /** Solve A·x = b for SPD A via Cholesky + two triangular solves
    * (reference `solve`, `linalg/_solve.py:163`). */
  def solveSPD(s: SparkSession, a: DMatrix, b: Array[Double], tile: Int = 512): Array[Double] = {
    val l = cholesky(s, a, tile)
    val y = solveLower(s, l, b, tile)
    // backward solve Lᵀ x = y  ≡  forward solve on the transpose
    val n = l.rows.toInt
    val x = y.clone()
    val lt = l.t
    val t = tile
    val nb = (n + t - 1) / t
    var k = nb - 1
    while (k >= 0) {
      val r0 = k * t
      val r1 = math.min(r0 + t, n)
      val rows = lt.df
        .where(col("i") >= r0 && col("i") < r1 && col("j") >= r0)
        .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
      val cells = rows.groupBy(_._1)
      var i = r1 - 1
      while (i >= r0) {
        var s0 = x(i)
        var dii = 0.0
        cells.getOrElse(i, Array.empty).foreach { case (_, j, v) =>
          if (j > i) s0 -= v * x(j) else if (j == i) dii = v
        }
        x(i) = s0 / dii
        i -= 1
      }
      k -= 1
    }
    x
  }
}
