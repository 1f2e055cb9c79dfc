package graft.core

/** Chunk-grid mathematics for the block representation.
  *
  * Re-expresses the reference's chunk model (reference
  * `dask_array/_expr.py:201-239` — `chunks`/`shape`/`numblocks` derivation —
  * and `dask_array/slicing/_utils.py:279` `_slice_1d`) as pure functions used
  * by partition planning: block tables are partitioned on linearized block
  * ids, and slices prune whole blocks before trimming edges
  * (reference `.ai-docs/slicing.md`).
  */
object Chunks {

  /** Regular chunking of a dimension of length `dim` into blocks of at most
    * `target` (reference `normalize_chunks`, `dask_array/_core_utils.py`). */
  def normalize(dim: Long, target: Long): Vector[Long] = {
    require(target > 0, s"chunk target must be positive, got $target")
    if (dim <= 0) Vector.empty
    else {
      val full = (dim / target).toInt
      val rem  = dim % target
      Vector.fill(full)(target) ++ (if (rem > 0) Vector(rem) else Vector.empty)
    }
  }

  /** Prefix offsets: chunk start positions plus the total as a sentinel. */
  def offsets(chunks: Vector[Long]): Vector[Long] = chunks.scanLeft(0L)(_ + _)

  /** Block index containing global element index `i`. */
  def blockOf(chunks: Vector[Long], i: Long): Int = {
    val offs = offsets(chunks)
    require(i >= 0 && i < offs.last, s"index $i out of bounds ${offs.last}")
    var lo = 0; var hi = offs.length - 1
    while (lo < hi - 1) {
      val m = (lo + hi) >>> 1
      if (offs(m) <= i) lo = m else hi = m
    }
    lo
  }

  /** Blocks overlapped by the half-open range [lo, hi): per overlapped block
    * `(blockIdx, localLo, localHi)`. This is the whole-block-culling +
    * edge-trim planner (reference `slicing/_utils.py:279` `_slice_1d`). */
  def sliceBlocks(chunks: Vector[Long], lo: Long, hi: Long): Vector[(Int, Long, Long)] = {
    val offs = offsets(chunks)
    chunks.indices.iterator.flatMap { b =>
      val s = math.max(lo, offs(b))
      val e = math.min(hi, offs(b + 1))
      if (s < e) Iterator.single((b, s - offs(b), e - offs(b))) else Iterator.empty
    }.toVector
  }

  /** Compose two consecutive 1-d slices (reference `fuse_slice`,
    * `dask_array/slicing/_utils.py:941`): slicing [a,b) then [c,d) of the
    * result equals slicing [a+c, min(a+d, b)) of the original. */
  def fuseSlice(a: Long, b: Long, c: Long, d: Long): (Long, Long) =
    (a + c, math.min(a + d, b))

  /** Fraction of bytes that must cross block boundaries when re-gridding
    * from `from` to `to` — min-model cost kernel (reference
    * `dask_array/_expr.py:675-720` `moved_fraction`); drives the
    * coarse-unless-costly unification policy (reference `_expr.py:723-905`). */
  def movedFraction(from: Vector[Long], to: Vector[Long]): Double = {
    val total = from.sum
    if (total == 0) return 0.0
    require(total == to.sum, "grids must cover the same extent")
    // bytes that stay put = sum over target blocks fully contained in a source block
    val fromOffs = offsets(from)
    val toOffs   = offsets(to)
    var stay = 0L
    var b = 0
    while (b < to.length) {
      val s = toOffs(b); val e = toOffs(b + 1)
      // a target block needs no move iff no source boundary strictly inside it
      val srcStart = blockOf(from, s)
      if (e <= fromOffs(srcStart + 1)) stay += (e - s)
      b += 1
    }
    1.0 - stay.toDouble / total.toDouble
  }
}

/** Lazy array metadata — the reference's `(shape, chunks, dtype)` triple
  * (reference `dask_array/_expr.py:201-229`); dtype is fixed to DOUBLE in the
  * v1 numeric path, with typed columns handled at the DataFrame level. */
final case class ArrayMeta(shape: Vector[Long], chunks: Vector[Vector[Long]]) {
  require(shape.length == chunks.length, "shape/chunks rank mismatch")
  def ndim: Int          = shape.length
  def size: Long         = shape.product
  def numBlocks: Vector[Int] = chunks.map(_.length)
  def totalBlocks: Long  = numBlocks.map(_.toLong).product
}

object ArrayMeta {
  def vec(n: Long, chunk: Long = 1L << 20): ArrayMeta =
    ArrayMeta(Vector(n), Vector(Chunks.normalize(n, chunk)))
  def matrix(rows: Long, cols: Long, rChunk: Long, cChunk: Long): ArrayMeta =
    ArrayMeta(Vector(rows, cols),
      Vector(Chunks.normalize(rows, rChunk), Chunks.normalize(cols, cChunk)))
}
