package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-gate lint — the checked-in form of the hash-fragility rules
  * learned the hard way across rounds (r7: libm rounding in q89/q95;
  * r8: signed zero in q107; standing risk: accumulation order).
  *
  * The driver compares Spark output to DuckDB output by EXACT hash, so a
  * gate is only trustworthy when every output cell is bit-identical by
  * construction. Three constructions qualify:
  *   1. integer-derived values (BIGINT casts, integer-valued doubles —
  *      exact in IEEE754 below 2^53, order-free under addition),
  *   2. explicitly quantized floats (`round(x, k)`, `floor(x * q)`),
  *   3. raw float arithmetic restricted to +,-,*,/ and comparisons
  *      (correctly rounded by both engines) with signed zero normalized
  *      (`+ 0.0`) wherever a rounding/mod kernel can produce -0.0.
  * Naked libm calls (ln/exp/cos/...) and order-sensitive float sums are
  * NOT exact across engines and must sit under a quantizer.
  *
  * These tests lint `SparkEntry.oracleSql` statically. They cannot prove
  * exactness (that is what the per-round DuckDB compare does); they stop
  * the known-fragile SHAPES from being reintroduced, and force every
  * deliberate exception to carry a written justification below. */
class GateLintSpec extends AnyFunSuite {

  private val oracles: Map[String, String] = SparkEntry.oracleSql

  /** Positions (0-based) in `sql` where `token` occurs and is NOT
    * enclosed by any of the `wrappers` call-parens (paren-aware: a stack
    * of open parens, each tagged with the identifier that opened it). */
  private def unwrapped(sql: String, token: String, wrappers: Set[String]): Seq[Int] = {
    val low = sql.toLowerCase
    val tok = token.toLowerCase
    val stack = scala.collection.mutable.Stack[Boolean]() // true = quantizer paren
    val hits = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < low.length) {
      val c = low.charAt(i)
      if (c == '(') {
        // identifier immediately before the paren
        var j = i - 1
        while (j >= 0 && (low.charAt(j).isLetterOrDigit || low.charAt(j) == '_')) j -= 1
        val ident = low.substring(j + 1, i)
        stack.push(wrappers.contains(ident))
        if (ident == tok && !stack.exists(identity)) hits += (j + 1)
      } else if (c == ')') {
        if (stack.nonEmpty) stack.pop()
      }
      i += 1
    }
    hits.toSeq
  }

  /** Paren depth of position `at` in `sql`. */
  private def depthAt(sql: String, at: Int): Int = {
    var d = 0; var i = 0
    while (i < at) {
      val c = sql.charAt(i)
      if (c == '(') d += 1 else if (c == ')') d -= 1
      i += 1
    }
    d
  }

  test("every oracle pins row order: ORDER BY, or no top-level GROUP BY") {
    // a GROUP BY inside a CTE or scalar subquery (paren depth > 0) feeds
    // a later aggregate and cannot leak row order; fragile is the FINAL
    // top-level select grouping without ordering (DuckDB and the parquet
    // dump may emit groups in different orders)
    val bad = oracles.collect {
      case (name, sql) if !sql.toUpperCase.contains("ORDER BY") &&
        "(?i)GROUP BY".r.findAllMatchIn(sql).exists(m => depthAt(sql, m.start) == 0) =>
        name
    }
    assert(bad.isEmpty,
      s"oracles whose top-level select groups without ORDER BY: $bad")
  }

  test("rounding-to-double outputs normalize signed zero (+ 0.0)") {
    // CAST(trunc|ceil|rint(...) AS DOUBLE) emits -0.0 for negative
    // fractional inputs; the q107 rule: the ENCLOSING output expression
    // must apply `+ 0.0` before its alias. (floor's output is only -0.0
    // when its input already is, so it is exempt.)
    val cast = """(?si)CAST\(\s*(?:trunc|ceil|rint)\b[^,]*?AS DOUBLE\)""".r
    val bad = oracles.collect {
      case (name, sql) if cast.findAllMatchIn(sql).exists { m =>
        // window from the construct to its alias boundary (next " AS x,"
        // or line end) must contain the normalization
        val rest = sql.substring(m.end)
        val stop = {
          val a = rest.indexOf(" AS ")
          if (a < 0) rest.length else a
        }
        !rest.substring(0, stop).contains("+ 0.0") &&
          !sql.substring(math.max(0, m.start - 16), m.start).contains("+ 0.0")
      } => name
    }
    assert(bad.isEmpty,
      s"oracles with unnormalized trunc/ceil/rint-to-DOUBLE (signed-zero fragile): $bad")
  }

  test("float modulo results normalize signed zero") {
    // `x % 7.0` is -0.0 at exact negative multiples; any oracle doing
    // float mod must carry a `+ 0.0` somewhere in the same statement
    val fmod = """%\s*\d+\.\d""".r
    val bad = oracles.collect {
      case (name, sql) if fmod.findFirstIn(sql).isDefined &&
        !sql.contains("+ 0.0") => name
    }
    assert(bad.isEmpty,
      s"oracles with float modulo but no signed-zero normalization: $bad")
  }

  /** Gates whose raw (unquantized) sums are nevertheless exact — the
    * INTEGER-VALUED class: every summed term is an integer by
    * construction (tabulate kernels `(a·i + b·j) % m`, CASE 1/0
    * indicator counts, lineitem integer quantities/keys, weights
    * `1 + id % k`), so IEEE754 addition is exact and order-free below
    * 2^53; l12 additionally takes sqrt/abs, both correctly rounded by
    * the IEEE spec and so bit-identical across engines. A NEW raw sum
    * either joins a class here WITH its proof or gets quantized. */
  private val exactSumWaivers: Set[String] = Set(
    "m01_matmul", "m02_gram", "m03_trace", "m06_triu_sum",
    "m11_matmul_chain", "m12_matmul_tiled", "m13_einsum_matmul",
    "m14_einsum_trace", "m15_einsum_dot", "m16_stencil_mean",
    "m17_batched_matmul", "m18_einsum_chain", "m22_stencil_periodic",
    "m23_integral_image", "m37_sparse_matvec", "m38_sparse_spgemm",
    "m39_sparse_elemwise", "m40_sparse_identity", "m42_cov_weighted",
    "n01_nd_axis_reduce", "n04_nd_tensordot", "n05_nd_zip_reduce",
    "n07_nd_flip_roll_concat", "n08_moveaxis_applyover", "n13_einsum_nd",
    "l12_matrix_norms", "q13_arange_dot", "q24_cumprod_sign",
    "q80_nancumprod", "q87_histogram_density",
    // t27/t28: the island prefix-sum is over 0/1 flags and span extents
    // are token positions — all integers
    "t27_exact_substr", "t28_substr_removal",
    // q113: sum over lineitem integer-valued quantities (exact,
    // order-free below 2^53); the /2 is a power-of-two scale, exact
    "q113_from_graph",
    // s03: running sum of integer token counts (exact, order pinned by
    // the window's ORDER BY on both engines); bin is integer division
    "s03_stream_packing",
    // s05: the island id is a running sum of 0/1 break flags (exact
    // integers); the value sum is BIGINT-quantized and CAST-wrapped
    "s05_stream_sessions",
  )

  /** The ORDERED-FOLD waiver class (formalized from t29, r9): a raw
    * float sum whose exactness proof is that BOTH engines evaluate the
    * same IEEE additions in the same pinned order — not that the terms
    * are integers. A gate claims this class only when all three hold:
    *   1. the sum is a RUNNING cumulative (`SUM(...) OVER (ORDER BY ...
    *      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)`), never a
    *      plain aggregate — a plain SUM's accumulation order is
    *      engine-internal and NOT reproducible;
    *   2. the fold order is pinned by an explicit deterministic sort
    *      key present in both the Spark plan and the oracle SQL;
    *   3. every term is built from correctly-rounded-by-spec ops only
    *      (+ - * / sqrt and comparisons) — one libm call (ln, exp, …)
    *      voids the proof and the gate must quantize instead.
    * The structural test below enforces requirement 1 textually; 2–3
    * are the written proof each entry must carry.
    *   - t29: running Σ√n over sources ORDER BY source; terms are
    *     sqrt of exact integer counts (correctly rounded); the Spark
    *     side folds the identical sequence via aggregate() over
    *     sort_array (same left fold, same order). */
  private val orderedFoldWaivers: Set[String] = Set(
    "t29_temperature_mix",
  )

  private val quantizers = Set("round", "floor", "cast", "min", "max",
    // min/max over a sum-list are order-free picks of one exact member;
    // count wrappers are integers by type
    "count")

  test("float sums are quantized (round/floor/CAST) or carry a written waiver") {
    val bad = oracles.collect {
      case (name, sql) if !exactSumWaivers(name) && !orderedFoldWaivers(name) &&
        unwrapped(sql, "sum", quantizers).nonEmpty => name
    }
    assert(bad.isEmpty,
      "oracles with raw float sum( — quantize it or add an exactness waiver:\n  " +
        bad.mkString("\n  "))
  }

  test("ordered-fold waivers really contain a pinned-order running fold") {
    // requirement 1 of the class: the oracle must carry the running
    // cumulative frame — a plain SUM would silently demote the proof
    // to engine-internal accumulation order
    val frame = """(?i)ROWS\s+BETWEEN\s+UNBOUNDED\s+PRECEDING\s+AND\s+CURRENT\s+ROW""".r
    val bad = orderedFoldWaivers.filter { name =>
      val sql = oracles.getOrElse(name, "")
      frame.findFirstIn(sql).isEmpty
    }
    assert(bad.isEmpty,
      s"ordered-fold waivers without a running cumulative frame in the oracle: $bad")
  }
}
