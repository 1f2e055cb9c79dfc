package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Complex 1-d array handle — the typed surface over the engine's
  * two-column complex representation (reference complex64/complex128
  * dtype support: complex values flow through elemwise/reductions as a
  * first-class dtype; here a complex array IS a (re, im) pair of
  * aligned element tables, the representation the q46/f01 gates pin).
  *
  * Every operation delegates to the [[DArray]] SQL-kernel algebra, so
  * complex arithmetic inherits the whole 1-d optimizer: aligned zips
  * fuse to one scan, slices push to them, and the kernels stay inside
  * whole-stage codegen. Nothing here introduces a new execution tier.
  */
final case class DComplex(re: DArray, im: DArray) {

  def +(o: DComplex): DComplex =
    DComplex(re.zip(o.re, "v1 + v2"), im.zip(o.im, "v1 + v2"))
  def -(o: DComplex): DComplex =
    DComplex(re.zip(o.re, "v1 - v2"), im.zip(o.im, "v1 - v2"))

  /** (a+bi)(c+di) = (ac − bd) + (ad + bc)i — four aligned zips that the
    * simplifier fuses into one scan over the shared operands. */
  def *(o: DComplex): DComplex = DComplex(
    re.zip(o.re, "v1 * v2").zip(im.zip(o.im, "v1 * v2"), "v1 - v2"),
    re.zip(o.im, "v1 * v2").zip(im.zip(o.re, "v1 * v2"), "v1 + v2"))

  def conj: DComplex = DComplex(re, im.negate)
  def negate: DComplex = DComplex(re.negate, im.negate)
  def scale(k: Double): DComplex = DComplex(re * k, im * k)

  /** numpy `abs` on complex: the modulus. */
  def abs: DArray = re.zip(im, "sqrt(v1 * v1 + v2 * v2)")
  /** numpy `angle`: atan2(im, re). */
  def angle: DArray = re.zip(im, "atan2(v2, v1)")
  /** |z|² without the sqrt (z·conj(z) is real). */
  def abs2: DArray = re.zip(im, "v1 * v1 + v2 * v2")

  def slice(lo: Long, hi: Long): DComplex =
    DComplex(re.slice(lo, hi), im.slice(lo, hi))

  /** Element table `(idx, re, im)` — one aligned join of the two parts
    * (fused to a single scan when both share a source). */
  def elements: DataFrame =
    re.elements.withColumnRenamed("v", "re")
      .join(im.elements.withColumnRenamed("v", "im"), "idx")
      .select(col("idx"), col("re"), col("im"))
}

object DComplex {
  /** A real array lifted to complex (im = +0.0). NOT `v * 0.0`, which
    * would produce -0.0 for negative reals (the q107 signed-zero class)
    * and NaN for infinite ones. */
  def fromReal(a: DArray): DComplex = DComplex(a, a.map("CAST(0.0 AS DOUBLE)"))
}
