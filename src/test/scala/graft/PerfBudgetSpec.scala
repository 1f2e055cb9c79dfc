package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-query performance budgets — the checked-in regression tripwire
  * (r7 verdict ask: replace the flat total with per-query budgets).
  *
  * The spec reads the most recent `bench_detail.json` (written by
  * [[Bench]] into the repo root on every run, including the driver's
  * per-round sf0.1 run) and FAILS if any listed query's steady time
  * exceeds its budget. Budgets are ~3× the round-8 steady numbers,
  * floored at 1 s so sub-100 ms queries don't trip on scheduler noise;
  * queries without an explicit entry get the default. A missing or
  * subset bench file checks whatever it contains (SPARK_GRAFT_ONLY dev
  * runs produce partial files — still useful, never wrong). */
class PerfBudgetSpec extends AnyFunSuite {

  /** query -> budgeted steady seconds. Explicit entries only where 3× the
    * r8 steady exceeds the 1 s floor. */
  private val budgets: Map[String, Double] = PerfBudgets.budgets

  private val defaultBudget = 1.0

  test("no query drifts past its checked-in steady budget") {
    val f = new java.io.File("bench_detail.json")
    assume(f.exists, "no bench_detail.json in the working directory — run graft.Bench")
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val entry = """"([A-Za-z0-9_]+)":\{"first":([0-9.]+),"steady":([0-9.]+)\}""".r
    val steady = entry.findAllMatchIn(text)
      .map(m => m.group(1) -> m.group(3).toDouble).toMap
    assume(steady.nonEmpty, "bench_detail.json holds no per-query entries")
    val over = steady.toSeq
      .map { case (q, s) => (q, s, budgets.getOrElse(q, defaultBudget)) }
      .filter { case (_, s, b) => s > b }
      .sortBy { case (_, s, b) => b - s }
    assert(over.isEmpty,
      "steady time over budget (query, steady, budget):\n  " +
        over.map { case (q, s, b) => f"$q: $s%.2fs > $b%.1fs" }.mkString("\n  "))
  }
}
