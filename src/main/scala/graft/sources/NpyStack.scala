package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `.npy`-stack source/sink (reference `from_npy_stack`/`to_npy_stack`,
  * `dask_array/io/_from_npy_stack.py:13`, `io/_to_npy_stack.py:13`): a
  * directory of NPY v1 files, one per block along axis 0, named `<blk>.npy`.
  *
  * The NPY header (magic + v1.0 + LE uint16 header length + python-dict
  * literal, '<f8' little-endian float64) is emitted and parsed in pure
  * Scala. Reading follows the reference's two-phase shape: block shapes
  * come from an O(numBlocks) driver pass over the 128-byte headers (the
  * reference reads `.npy` headers eagerly the same way), the payloads are
  * decoded in one distributed `binaryFile` scan with the block-offset map
  * broadcast — data bytes never touch the driver. All store IO routes
  * through [[StoreIO]] (Hadoop FileSystem), so the stack may live on any
  * configured scheme, not just a driver-shared local filesystem. */
object NpyStack {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** Serialize a float64 1-d array as NPY v1.0 bytes. */
  def npyBytes(values: Array[Double]): Array[Byte] =
    npyBytesNd(values, Seq(values.length.toLong))

  /** Serialize a C-order float64 block of any shape as NPY v1.0 bytes
    * (numpy's `(n,)` 1-tuple form for rank 1). */
  def npyBytesNd(values: Array[Double], shape: Seq[Long]): Array[Byte] = {
    require(values.length.toLong == shape.product,
      s"${values.length} values for shape $shape")
    val shapeStr =
      if (shape.length == 1) s"(${shape.head},)" else shape.mkString("(", ", ", ")")
    val dict = s"{'descr': '<f8', 'fortran_order': False, 'shape': $shapeStr, }"
    // total header (magic+version+len+dict+pad+\n) must be 64-byte aligned
    val base = Magic.length + 2 + 2
    val pad = (64 - (base + dict.length + 1) % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val buf = ByteBuffer.allocate(base + header.length + values.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic).put(1.toByte).put(0.toByte)
    buf.putShort(header.length.toShort)
    buf.put(header.getBytes("ASCII"))
    values.foreach(buf.putDouble)
    buf.array()
  }

  /** Parse NPY v1.0 bytes → values (validates magic/dtype). */
  def parseNpy(bytes: Array[Byte]): Array[Double] = {
    require(bytes.length >= 10 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not an NPY file")
    require(bytes(6) == 1, s"unsupported NPY version ${bytes(6)}")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(8)
    val hlen = buf.getShort() & 0xffff
    val header = new String(bytes, 10, hlen, "ASCII")
    require(header.contains("'<f8'"), s"only '<f8' supported, got: $header")
    require(header.contains("False"), "fortran_order not supported")
    val n = (bytes.length - 10 - hlen) / 8
    val out = new Array[Double](n)
    buf.position(10 + hlen)
    var i = 0
    while (i < n) { out(i) = buf.getDouble(); i += 1 }
    out
  }

  /** Parse only the element count from a header prefix (first 128 bytes). */
  def parseCount(prefix: Array[Byte]): Long = parseShape(prefix).product

  /** Parse the shape tuple from a header prefix. */
  def parseShape(prefix: Array[Byte]): Seq[Long] = {
    val hlen = ((prefix(9) & 0xff) << 8) | (prefix(8) & 0xff)
    val header = new String(prefix, 10, math.min(hlen, prefix.length - 10), "ASCII")
    val m = "\\(([\\d,\\s]*)\\)".r.findFirstMatchIn(header)
      .getOrElse(throw new IllegalArgumentException(s"no shape in: $header"))
    val dims = "\\d+".r.findAllIn(m.group(1)).map(_.toLong).toSeq
    if (dims.isEmpty) throw new IllegalArgumentException(s"empty shape in: $header")
    dims
  }

  /** Write the element table as a stack of `<blk>.npy` files, `blockSize`
    * elements per file (last file ragged). One task per block.
    *
    * `n` is the logical array length: every block is densified to its
    * exact `[blk*blockSize, min((blk+1)*blockSize, n))` range with values
    * placed by `idx % blockSize` and gaps zero-filled — element tables are
    * sparse (zeros dropped), and positioning by sort order would silently
    * compact gaps and shift every subsequent value. Blocks with no
    * elements at all are emitted as all-zero files from the driver loop
    * below, so read-side offsets stay aligned. */
  def write(elements: DataFrame, dir: String, blockSize: Long, n: Long): Unit = {
    val sess = elements.sparkSession
    val (fs0, base0) = StoreIO.fsOf(dir, sess.sparkContext.hadoopConfiguration)
    fs0.mkdirs(base0)
    import sess.implicits._
    val numBlocks = ((n + blockSize - 1) / blockSize).max(0)
    // ship the DRIVER's hadoop conf (carries spark.hadoop.* credentials)
    val bconf = sess.sparkContext.broadcast(
      new SerializableHadoopConf(sess.sparkContext.hadoopConfiguration))
    val written = elements
      .where(col("idx") >= 0 && col("idx") < n)
      .selectExpr(s"idx DIV $blockSize AS blk", "idx", "v")
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (blk, it) =>
        val len = (math.min((blk + 1) * blockSize, n) - blk * blockSize).toInt
        val vals = new Array[Double](len)
        it.foreach { case (_, idx, v) => vals((idx % blockSize).toInt) = v }
        val (fs, base) = StoreIO.fsOf(dir, bconf.value.value) // driver's conf
        StoreIO.writeFile(fs, new Path(base, s"$blk.npy"), npyBytes(vals))
        (blk, len.toLong)
      }.collect() // drives the write job; returns O(numBlocks) stats
    // blocks with zero surviving elements never reach mapGroups — emit
    // their all-zero files here so the stack has no holes
    val have = written.map(_._1).toSet
    var blk = 0L
    while (blk < numBlocks) {
      if (!have.contains(blk)) {
        val len = (math.min((blk + 1) * blockSize, n) - blk * blockSize).toInt
        StoreIO.writeFile(fs0, new Path(base0, s"$blk.npy"),
          npyBytes(new Array[Double](len)))
      }
      blk += 1
    }
  }

  /** Write an N-d array as a `.npy` stack split along AXIS 0 (the
    * reference's `to_npy_stack` contract, `io/_to_npy_stack.py:13`:
    * `blockRows` rows of the leading axis per file, each file a full
    * C-order N-d block, last file ragged). One task per block; blocks
    * with no surviving elements are emitted all-zero by the driver. */
  def writeNd(nd: graft.NdArray, dir: String, blockRows: Long): Unit = {
    val shape = nd.shape
    val rank = shape.length
    val rest = shape.tail
    val restVol = rest.product
    val sess = nd.df.sparkSession
    val (fs0, base0) = StoreIO.fsOf(dir, sess.sparkContext.hadoopConfiguration)
    fs0.mkdirs(base0)
    import sess.implicits._
    val rows = shape.head
    val numBlocks = ((rows + blockRows - 1) / blockRows).max(0)
    val restStrides = rest.scanRight(1L)(_ * _).tail
    val pSql = (s"(c0 % $blockRows) * $restVol" +:
      (1 until rank).map(a => s"c$a * ${restStrides(a - 1)}L")).mkString(" + ")
    val inBounds = (0 until rank).map(a => s"c$a >= 0 AND c$a < ${shape(a)}")
      .mkString(" AND ")
    val bconf = sess.sparkContext.broadcast(
      new SerializableHadoopConf(sess.sparkContext.hadoopConfiguration))
    val written = nd.df
      .where(inBounds)
      .selectExpr(s"c0 DIV $blockRows AS b", s"($pSql) AS p", "v")
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (b, it) =>
        val len = math.min((b + 1) * blockRows, rows) - b * blockRows
        val vals = new Array[Double]((len * restVol).toInt)
        it.foreach { case (_, p, v) => vals(p.toInt) = v }
        val (fs, base) = StoreIO.fsOf(dir, bconf.value.value)
        StoreIO.writeFile(fs, new Path(base, s"$b.npy"),
          npyBytesNd(vals, len +: rest))
        b
      }.collect().toSet
    var b = 0L
    while (b < numBlocks) {
      if (!written.contains(b)) {
        val len = math.min((b + 1) * blockRows, rows) - b * blockRows
        StoreIO.writeFile(fs0, new Path(base0, s"$b.npy"),
          npyBytesNd(new Array[Double]((len * restVol).toInt), len +: rest))
      }
      b += 1
    }
  }

  /** Read an N-d `.npy` stack back as a [[graft.NdArray]]: the driver
    * reads each block's shape tuple (O(numBlocks) header prefixes, all
    * trailing extents must agree), payloads decode distributedly to flat
    * row-major positions. */
  def readNd(s: SparkSession, dir: String): graft.NdArray = {
    import s.implicits._
    val hconf = s.sparkContext.hadoopConfiguration
    val (fs, base) = StoreIO.fsOf(dir, hconf)
    val shapes = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    StoreIO.listNames(dir, hconf).foreach { name =>
      if (name.endsWith(".npy")) {
        val prefix = StoreIO.readPrefix(fs, new Path(base, name), 256)
        shapes += ((name.stripSuffix(".npy").toLong, parseShape(prefix)))
      }
    }
    require(shapes.nonEmpty, s"no .npy blocks under $dir")
    val sorted = shapes.sortBy(_._1)
    require(sorted.map(_._1) == (0L until sorted.size).toSeq,
      s"stack blocks not contiguous (got ids ${sorted.map(_._1)}) — a missing " +
        "block file would silently shift every later index")
    val rest = sorted.head._2.tail
    sorted.foreach { case (b, sh) =>
      require(sh.tail == rest, s"block $b trailing shape ${sh.tail} != $rest")
    }
    val restVol = rest.product
    val totalRows = sorted.map(_._2.head).sum
    val rowStarts: Map[Long, Long] = sorted.map(_._1).zip(
      sorted.scanLeft(0L) { case (acc, (_, sh)) => acc + sh.head }.dropRight(1)).toMap
    val bc = s.sparkContext.broadcast((rowStarts, restVol))
    // pathGlobFilter, NOT an in-path `*.npy` glob: a glob inside load()'s
    // path makes FileStreamSink.hasMetadata probe the literal glob string
    // as a file and log a WARN + stack trace on every read
    val flat = s.read.format("binaryFile").option("pathGlobFilter", "*.npy").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val (starts, rv) = bc.value
        val blk = path.split("/").last.stripSuffix(".npy").toLong
        val off = starts(blk) * rv
        parseNpy(content).iterator.zipWithIndex.map { case (v, i) => (off + i, v) }
      }.toDF("idx", "v")
    graft.NdArray.fromFlat(flat, totalRows +: rest)
  }

  /** Read a `.npy` stack back as the element table `(idx, v)`. */
  def read(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // phase 1 (driver, O(numBlocks)): block counts from 128-byte headers
    val hconf = s.sparkContext.hadoopConfiguration
    val (fs, base) = StoreIO.fsOf(dir, hconf)
    val counts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    StoreIO.listNames(dir, hconf).foreach { name =>
      if (name.endsWith(".npy")) {
        val prefix = StoreIO.readPrefix(fs, new Path(base, name), 128)
        counts += ((name.stripSuffix(".npy").toLong, parseCount(prefix)))
      }
    }
    val sorted = counts.sortBy(_._1)
    require(sorted.map(_._1) == (0L until sorted.size).toSeq,
      s"stack blocks not contiguous (got ids ${sorted.map(_._1)}) — a missing " +
        "block file would silently shift every later index")
    val starts: Map[Long, Long] = sorted.map(_._1).zip(
      sorted.scanLeft(0L) { case (acc, (_, n)) => acc + n }.dropRight(1)).toMap
    val bc = s.sparkContext.broadcast(starts)

    // phase 2 (distributed): decode payloads, emit (offset + i, v)
    s.read.format("binaryFile").option("pathGlobFilter", "*.npy").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val blk = path.split("/").last.stripSuffix(".npy").toLong
        val start = bc.value(blk)
        parseNpy(content).iterator.zipWithIndex.map { case (v, i) => (start + i, v) }
      }.toDF("idx", "v")
  }
}
