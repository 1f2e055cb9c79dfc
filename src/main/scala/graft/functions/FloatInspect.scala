package graft.functions

/** IEEE-754 float-inspection ufuncs as SQL-text kernel builders — the
  * last stragglers of the reference's ~106-name ufunc export list
  * (reference `dask_array/_ufunc.py:18`: `signbit`, `copysign`,
  * `nextafter`, `spacing`, `i0`, `ldexp`). All are pure compositions of
  * the native bit-cast expressions ([[BitsOf]]/[[FromBits]], registered
  * as `graft_bits`/`graft_from_bits`) plus arithmetic, so every kernel
  * stays inside whole-stage codegen and is shareable VERBATIM with a
  * DuckDB oracle that reconstructs the same values by integer/decimal
  * arithmetic (the q83 pattern).
  *
  * Bit facts used (finite doubles, sign-magnitude encoding):
  *  - the sign bit is the int64 sign bit, so `graft_bits(v) < 0` IS
  *    `signbit` (true for -0.0, false for +0.0 — SQL `v < 0` cannot see
  *    that);
  *  - for v > 0, the next double toward +inf is `from_bits(bits(v)+1)`;
  *    for v < 0 the magnitude DECREASES toward +inf, and because the
  *    sign bit is untouched by the ±1 the same signed arithmetic
  *    `bits(v)-1` walks it (nextafter(-1.0, inf) = from_bits(0xBFF..-1));
  *  - ±0.0 step to the minimal subnormal `from_bits(1)` of the target
  *    sign — exactly `Math.nextUp`/`nextDown` semantics.
  * Domain: finite inputs (numpy propagates NaN and pins infinities; the
  * builders here document finite-domain behavior — the oracle-gated
  * query q106 exercises finite values).
  */
object FloatInspect {

  // every builder casts its argument(s) to DOUBLE internally, so kernels
  // also accept bare SQL literals (which Spark parses as DECIMAL — a
  // DECIMAL never carries an IEEE sign bit, so e.g. the literal -0.0 is
  // plain zero; pass negZero below when the signed zero itself matters)
  private def d(v: String): String = s"CAST($v AS DOUBLE)"

  /** IEEE -0.0 as an expression (the SQL literal -0.0 is DECIMAL zero). */
  val negZero: String =
    "graft_from_bits(CAST(-9223372036854775807 AS BIGINT) - CAST(1 AS BIGINT))"

  /** numpy `signbit`: true for negatives AND -0.0 (boolean column). */
  def signbit(v: String): String = s"(graft_bits(${d(v)}) < 0)"

  /** numpy `copysign(x, y)`: |x| with y's sign bit — including y = -0.0,
    * which `sign(y)` based forms get wrong. */
  def copysign(x: String, y: String): String =
    s"(CASE WHEN graft_bits(${d(y)}) < 0 THEN -abs(${d(x)}) ELSE abs(${d(x)}) END)"

  /** Next representable double after v toward +inf (`Math.nextUp`). */
  def nextUp(v: String): String = {
    val vd = d(v)
    s"(CASE WHEN $vd = 0.0 THEN graft_from_bits(CAST(1 AS BIGINT))" +
      s" WHEN graft_bits($vd) < 0 THEN graft_from_bits(graft_bits($vd) - CAST(1 AS BIGINT))" +
      s" ELSE graft_from_bits(graft_bits($vd) + CAST(1 AS BIGINT)) END)"
  }

  /** Next representable double after v toward -inf (`Math.nextDown`). */
  def nextDown(v: String): String = {
    val vd = d(v)
    s"(CASE WHEN $vd = 0.0 THEN graft_from_bits(CAST(-9223372036854775807 AS BIGINT))" +
      s" WHEN graft_bits($vd) < 0 THEN graft_from_bits(graft_bits($vd) + CAST(1 AS BIGINT))" +
      s" ELSE graft_from_bits(graft_bits($vd) - CAST(1 AS BIGINT)) END)"
  }

  /** numpy binary `nextafter(x, y)`: per-element step toward y. When
    * x == y numpy returns Y (not x) — observable in the sign bit for the
    * (+0.0, -0.0) pair, which SQL comparison treats as equal. */
  def nextafter(x: String, y: String): String =
    s"(CASE WHEN ${d(y)} > ${d(x)} THEN ${nextUp(x)}" +
      s" WHEN ${d(y)} < ${d(x)} THEN ${nextDown(x)} ELSE ${d(y)} END)"

  /** numpy `spacing`: the signed ulp — distance to the next double away
    * from zero, carrying v's sign (spacing(-1) = -eps; spacing(±0) =
    * ±minimal subnormal). */
  def spacing(v: String): String =
    copysign(s"(${nextUp(s"abs(${d(v)})")} - abs(${d(v)}))", v)

  /** numpy `ldexp(x, n)`: x·2ⁿ — exact while 2ⁿ is a normal double. */
  def ldexp(x: String, n: String): String = s"(${d(x)} * power(2.0, $n))"

  /** Modified Bessel function of the first kind, order 0, as the nested
    * power series  i0(x) = Σ_k (x²/4)^k / (k!)²
    *             = 1 + t/1²·(1 + t/2²·(1 + t/3²·(… ))),  t = x²/4 —
    * every constant is a SMALL INTEGER literal, so the identical text
    * evaluates bit-identically in Spark and DuckDB (no decimal
    * coefficient parsing, no libm calls). `terms` = 64 converges below
    * one ulp for |x| ≲ 30 (the tail ratio t/k² < 1/4 from k ≈ 2·|x|);
    * larger |x| would want the cephes exp-scaled form the reference gets
    * from numpy — outside this series' documented domain. */
  def i0(v: String, terms: Int = 64): String = {
    val t = s"(${d(v)} * ${d(v)} / 4.0)"
    (terms to 1 by -1).foldLeft("1.0") { (acc, k) =>
      s"(1.0 + $t / ${k.toLong * k}.0 * $acc)"
    }
  }
}
