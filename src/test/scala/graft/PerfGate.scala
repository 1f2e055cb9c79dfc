package graft

/** Pure gating logic for the perf tripwire — extracted from
  * PerfBudgetSpec (r11 verdict #2) so the rules themselves are testable
  * against synthetic bench artifacts, not just the checked-in one.
  *
  * Contention model: every gate widens by `ratio`, the factor by which
  * the bench box's measured single-thread throughput fell short of the
  * committed idle bound (Bench.scala times a fixed xorshift kernel at
  * start and end; the spec takes the worse of the two). On an idle box
  * ratio = 1 and the gates are exactly the committed budgets; on a
  * contended box every query inflates together with the probe, and a
  * tripwire that cannot tell honest contention from regression must not
  * go red on byte-identical code (the r11 failure mode: the driver's
  * contended run flagged e17/t11/q03/n17/q110/d01, all of which collapse
  * to normal on an idle box).
  *
  * A real plan regression still trips under contention: it inflates the
  * flagged query ON TOP of the ambient ratio, while the probe only
  * captures the ambient part. */
object PerfGate {

  /** `residue` is the artifact's state-store/listener gauge verdict for
    * the row (r14: bench_detail records ssp/mnt/lbq per query; r15 adds
    * thr_d, the cross-execution live-thread delta) — `None` when the
    * artifact predates the gauges (treated as "could be a leak"),
    * `Some(false)` when every residue gauge read zero. r14 ADVICE: ssp/
    * mnt are sampled AFTER the gate's own unload and read zero by
    * construction for the mechanisms they were meant to catch, so the
    * spec also folds lbq > 0 (listener backlog) and a material thread
    * delta into the verdict — see PerfBudgetSpec.parseDetail. */
  final case class Detail(first: Double, samples: Seq[Double],
                          residue: Option[Boolean] = None)

  /** Committed idle-box bound for the Bench xorshift probe: measured
    * 146-186 ms (min-of-3) on the build box at local[8]/local[32]; 250
    * allows normal scheduler jitter without widening anything. */
  val probeBoundMs = 250.0

  /** Committed idle-box bound for the PARALLEL probe (r16 verdict
    * "next" #2): one xorshift thread per processor, wall until all
    * finish, min of three — measured min 289 ms on the r17 box (whose
    * min-of-execution suite sums ran ~10% over the r16 builder's clean
    * state, so the true clean floor is a bit lower). 420 ms allows
    * scheduler jitter; the r16 contamination class (~25% parallel
    * capacity loss, single-thread probe CLEAN at 212-224 ms) lands
    * above it and widens the gates the single-thread ratio cannot.
    * Widening is the fail-safe direction: an over-eager par probe can
    * only make the tripwire more lenient, never falsely red. */
  val probeParBoundMs = 420.0

  def ratio(probeMs: Option[Double]): Double =
    probeMs.map(p => math.max(1.0, p / probeBoundMs)).getOrElse(1.0)

  /** Contention ratio from BOTH probes: the single-thread kernel sees
    * per-core slowdown, the parallel kernel sees lost multi-core
    * capacity — the r16 degradation moved only the latter. */
  def ratio(probeMs: Option[Double], probeParMs: Option[Double]): Double =
    math.max(ratio(probeMs),
      probeParMs.map(p => math.max(1.0, p / probeParBoundMs)).getOrElse(1.0))

  /** ROVING-VICTIM run classifier (r16 verdict "next" #2). The r16
    * driver/judge benches put DIFFERENT queries over budget in every
    * run of the same binary, each victim posting at least one clean
    * execution inside the very run that flagged it (q99: first 1.96 s
    * against steadies 9.8/40.6/11.8 s) — multi-second box stalls
    * landing on a roving subset of executions, invisible to the
    * single-thread probe. Signature, per query: the MEDIAN steady
    * breaches the clean-box gate, the spread max/min over ALL
    * executions (first + steadies) exceeds 3×, and the min sits INSIDE
    * the gate — i.e. the same plan ran both clean and catastrophically
    * slow in one session, which no code change can produce. Any such
    * query classifies the RUN as contaminated; the budget sweep then
    * gates every row on its min-of-executions (the statistic that
    * stayed inside the clean band in all three ~230 s r16 runs). A
    * lone FLAT breach — every execution elevated together — never
    * matches (min is outside the gate) and stays red: the r14 t07
    * specimen keeps failing. A real regression during a contaminated
    * run is masked for that run only and resurfaces on the next clean
    * run, exactly like the epoch-draw waiver; the accumulating arm
    * stays fully armed throughout. */
  def rovingVictims(details: Map[String, Detail],
                    budgets: Map[String, Double], defaultBudget: Double,
                    r: Double): Seq[String] =
    details.toSeq.collect { case (q, d) if {
      val b = budgets.getOrElse(q, defaultBudget)
      val gate = (b + noiseSlack(b)) * r
      val all = d.first +: d.samples
      val med = d.samples.sorted.apply(d.samples.size / 2)
      med > gate && all.min <= gate &&
        all.max > 3.0 * math.max(all.min, 0.05)
    } => q }.sorted

  /** Grace over a budget, SCALED to it (r8 advisory: a flat 4 s let a
    * default-budget query triple silently; r14 verdict #2: the old
    * min(4, 2×budget) formula granted t07_jaccard's 2.5 s budget a +4 s
    * window, silently absorbing a flat 5.2× regression to 3.58 s).
    *
    * Two regimes:
    *  - budget ≤ 1.5 s (incl. the 1.5 s default): sub-second queries
    *    live inside scheduler noise and the ~2 s in-suite contamination
    *    class, so the absolute window stays 2×budget floored at 2 s
    *    (≤ 3 s at the default) — these queries' REGRESSIONS are caught
    *    by the inversion / accumulating sweeps, not the absolute gate,
    *    and the r11 unprobed-contended artifact (t11 min 3.78 s on a
    *    ~1 s idle truth) pins that the default gate cannot tighten
    *    below ~4.5 s without flapping on honest contamination.
    *  - budget ≥ 2.5 s: the window is PROPORTIONAL — max(0.75,
    *    0.3×budget) capped at 2 s — so a flat >1.4× breach of a
    *    multi-second budget can never pass silently again (tightening
    *    toward 1.1× for the biggest budgets).
    *  - 1.5 s < budget < 2.5 s: LINEAR BLEND between the two regimes
    *    (3.0 at b=1.5 down to 0.75 at b=2.5). The r15 formula had a
    *    CLIFF at exactly 2.0 s — a 1.9 s budget got a +3.8 s window
    *    (~3× tolerance) while a 2.0 s budget got +0.75 s (1.375×), so
    *    a future re-derivation nudging a budget across the boundary
    *    would silently triple its allowance (r15 ADVICE #3). */
  def noiseSlack(budget: Double): Double =
    if (budget >= 2.5) math.min(2.0, math.max(0.75, 0.3 * budget))
    else if (budget <= 1.5) math.max(2.0, 2 * budget)
    else 3.0 - 2.25 * (budget - 1.5)

  /** Budget violations. The measured value depends on what the probe
    * says about the box (r12 ADVICE: taking the min over first+steadies
    * unconditionally let a single lucky execution mask a real
    * regression):
    *
    *  - PROBED CLEAN box (ratio 1): measured = MEDIAN of the steady
    *    samples — the same statistic the headline reports, so one lucky
    *    sample can't hide a regression and one GC-paused sample can't
    *    fake one.
    *  - CONTENDED box (probe above its idle bound) or an UN-PROBED
    *    pre-r12 artifact (contention unknowable): measured = MIN over
    *    every recorded execution (first + all three steadies) — box
    *    contention inflates a random subset, and r11's probe-less driver
    *    artifact had e17 at 8.95/11.36/4.68 with an idle-box truth of
    *    1.39; the min is the only order statistic of four that stayed
    *    inside the honest gate.
    *
    * Caveat (documented, not solved): the xorshift probe measures CPU
    * contention only — an IO-bound neighbor (e.g. a parallel parquet
    * writer saturating the disk) inflates scan-heavy queries without
    * moving the probe, and such a run gates at clean-box strictness.
    *
    * `harnessPaced` gates (streaming replays) measure at MIN over every
    * recorded execution even on a probed-clean box (r14): their wall is
    * micro-batch SCHEDULING, which a single-threaded CPU probe cannot
    * see — a quiesced-harness run still reproduced the r13 outlier
    * class with one replay gate at 12/33/37 s next to an 8 s first,
    * every residue gauge zero and the batch half of the suite flat. A
    * genuine plan/state regression inflates all four executions and
    * still fails the min; the median rule stays for plan queries, whose
    * samples contention inflates RANDOMLY rather than by scheduling
    * epoch. */
  def overBudget(details: Map[String, Detail],
                 budgets: Map[String, Double], defaultBudget: Double,
                 r: Double, probed: Boolean = true,
                 harnessPaced: Set[String] = Set.empty): Seq[(String, Double, Double)] =
    details.toSeq
      .map { case (q, d) =>
        val measured =
          if (r > 1.0 || !probed || harnessPaced(q)) (d.first +: d.samples).min
          else d.samples.sorted.apply(d.samples.size / 2)
        (q, measured, budgets.getOrElse(q, defaultBudget))
      }
      .filter { case (_, m, b) => m > (b + noiseSlack(b)) * r }
      .sortBy { case (_, m, b) => b - m }

  /** The 1-in-6 SCHEDULER-EPOCH draw on replay gates (r15 ADVICE #4):
    * a whole bench run occasionally lands in a box scheduling epoch
    * that inflates EVERY streaming replay's micro-batch wall together
    * (r15 battery run 4: s02 min 8.27 s vs a 1.3–2.1 s clean band,
    * all four executions elevated, every residue gauge zero, batch
    * half flat — survives the inter-gate quiesce because it is box
    * state, not harness state). Encoding that outlier into s02's
    * budget (r15: 10 s vs a 1.8 s clean steady) let a genuine ~5×
    * regression pass silently on the 5-in-6 clean runs, so the draw is
    * now detected EXPLICITLY instead: the run is an epoch draw iff at
    * least `quorum` replay gates are SIMULTANEOUSLY elevated ≥1.35×
    * over their recorded clean-band MIN with clean residue gauges
    * (min over first+steadies — the draw inflates every execution).
    * A single-gate regression on a clean run elevates one gate while
    * the others sit inside the ±15% clean band, so it can never fake
    * the quorum; a regression DURING a draw is masked for that one
    * run and resurfaces on the next clean run (5-in-6), while the
    * inversion/accumulating arms stay fully armed either way.
    * Gauge-less (pre-r15) artifacts never qualify — conservative.
    *
    * Two limits, stated honestly (r16 review): (1) the per-run waiver
    * is CAPPED by [[epochWaived]] — the draw class tops out ~4× the
    * clean band (r15 s02: 8.27 s on a 2.1 band), so a row beyond
    * 6×cleanBand stays red even during a draw; a 50× single-gate
    * regression cannot hide behind a coincident epoch. (2) a code
    * change that PERSISTENTLY slows the whole replay family ≥1.35×
    * with clean gauges is indistinguishable from a draw within one
    * artifact — the cross-run detector is the battery protocol: draws
    * are 1-in-6, so every-run "draws" on a fresh binary (4/4 in the
    * per-round battery) are a regression and the builder's battery
    * ledger in COVERAGE is the gate for that class. */
  def epochDraw(details: Map[String, Detail], harnessPaced: Set[String],
                cleanBand: Map[String, Double], quorum: Int = 4): Boolean =
    harnessPaced.toSeq.count { q =>
      (details.get(q), cleanBand.get(q)) match {
        case (Some(d), Some(c)) =>
          (d.first +: d.samples).min > 1.35 * c && d.residue.contains(false)
        case _ => false
      }
    } >= quorum

  /** Whether a replay gate's budget violation may be waived during a
    * classified epoch draw: only while its min stays inside the draw's
    * own magnitude class (≤ 6× the clean band). No cleanBand entry ⇒
    * never waived. */
  def epochWaived(q: String, details: Map[String, Detail],
                  cleanBand: Map[String, Double]): Boolean =
    (details.get(q), cleanBand.get(q)) match {
      case (Some(d), Some(c)) => (d.first +: d.samples).min <= 6.0 * c
      case _ => false
    }

  /** steady ≤ first inversions: a steady (min-of-three, post-drain) run
    * that exceeds the first by >25% AND >1 s is re-paying per-run work —
    * codegen-cache misses, plan re-analysis churn — not executing the
    * plan (the r8 q99 pathology: steady 6.99 s vs first 4.28 s, a 2.7 s
    * delta). The absolute floor is 1 s, not 0.5: a contended box can
    * triple a sub-second query's steadies while its first run got lucky
    * (r11 driver artifact: d01 first 0.26, steadies ≥0.94, idle-box
    * truth 0.26), and that class is below the multi-second severity this
    * tripwire exists for. Both bounds scale by the contention ratio —
    * steadies measured later in a contended session inflate relative to
    * an early first run. */
  /** `harnessPaced` (r13): queries whose wall time is REPLAY-HARNESS
    * scheduling — streaming gates that run a bounded file replay to
    * completion (AvailableNow no-data batches, state-store maintenance
    * ticks, watermark-commit polling). For them first-vs-steady ordering
    * is timing noise in BOTH directions (observed on byte-identical
    * binaries: s07 steadies 23.8/18.4/11.5 after a 21.4 s first in one
    * full run, 5.4 s flat in the next; s08 first 2.4 lucky vs 3.7–5.3
    * steadies) — so the inversion tripwire exempts them. The
    * ACCUMULATING detector deliberately does NOT honor the exemption:
    * a monotone cross-run ramp on a replay gate is exactly how the r11
    * s03 state-store maintenance leak surfaced, and that signal stays
    * armed for every query. */
  def inversions(details: Map[String, Detail], r: Double,
                 harnessPaced: Set[String] = Set.empty): Seq[(String, Double, Double)] =
    details.toSeq
      .filterNot { case (q, _) => harnessPaced(q) }
      .map { case (q, d) => (q, d.first, d.samples.min) }
      .filter { case (_, f, s) => s > f * 1.25 * r && s - f > 1.0 * r }
      .sortBy { case (_, f, s) => f - s }

  /** The ACCUMULATING signature (r12 verdict #6): an inversion whose
    * steady samples are STRICTLY INCREASING by a MATERIAL margin — each
    * post-warm execution of a byte-identical plan slower than the last.
    * Contention inflates a random subset of samples; re-paying-work
    * (codegen-cache misses) inflates all of them about equally; only
    * state that GROWS ACROSS RUNS — code-cache flush thrash, leaked
    * state-store maintenance, metaspace churn — produces a monotone
    * ramp. r12's e14 is the type specimen: first 7.5 s, steadies
    * 19.4 / 21.8 / 23.6 s (+22%) with a clean probe, isolated truth
    * 2.0 s; r13's q14 ramped +46%, r11's s03 +43%.
    *
    * The material-ramp floor (s3 ≥ 1.10 · s1 AND s3 − s1 > 0.5 s,
    * r14): a flat-but-elevated replay gate whose three samples happen
    * to land monotone within scheduling noise (observed: s16 at
    * 6.024/6.206/6.210 — a 3% spread with every residue gauge reading
    * zero) is the inversion/budget classes' problem, not a leak; the
    * genuine leak specimens all ramp ≥ 20% across the three samples.
    *
    * `harnessPaced` gates additionally need GAUGE CORROBORATION (r14):
    * a replay gate's ramp only classifies as accumulating when its
    * residue gauges fired (providers still loaded / maintenance still
    * running) or when the artifact predates the gauges (`residue =
    * None` — the r11 arm stays armed for old artifacts). Basis: a
    * quiesced-harness run reproduced a 12/33/37 s replay ramp with
    * EVERY gauge at zero and the batch suite flat — box scheduling
    * epochs ramp too; the r11 s03 leak would have shown loaded
    * providers + a live maintenance task, which is exactly what the
    * gauges measure. Plan queries never get the corroboration waiver.
    * Named separately so the failure message points at JVM-context
    * forensics (the bench_detail jit_ms/cc_mb/ssp/mnt/lbq gauges), not
    * at the plan. */
  def accumulating(details: Map[String, Detail], r: Double,
                   harnessPaced: Set[String] = Set.empty): Seq[(String, Double, Seq[Double])] =
    inversions(details, r).flatMap { case (q, f, _) =>
      val s = details(q).samples
      val ramp = s.size >= 3 && s.sliding(2).forall { case Seq(a, b) => b > a } &&
        s.last >= s.head * 1.10 && s.last - s.head > 0.5
      val corroborated =
        !harnessPaced(q) || details(q).residue.forall(identity)
      if (ramp && corroborated) Some((q, f, s)) else None
    }
}
