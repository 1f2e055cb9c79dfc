package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact quantiles via range-partitioned sort + rank selection.
  *
  * Spark's built-in exact `percentile` is a TypedImperativeAggregate that
  * buffers EVERY value into one final merge buffer — a single-task OOM at
  * 100 TB. The reference's scale path merges per-chunk percentile sketches
  * (reference dask_array/reductions/_percentile.py:151,256); this is the
  * exact-answer equivalent built on Spark's distributed sort:
  *
  *   1. `repartitionByRange(v)` + in-partition sort — Spark's sampled range
  *      partitioner, every partition holds a contiguous value range;
  *   2. one count pass → per-partition offsets (O(numPartitions) driver
  *      bytes, the same bound a global sort's range sampling already pays);
  *   3. one selection pass that emits ONLY the ≤ 2·|ps| global ranks the
  *      requested quantiles interpolate between.
  *
  * Interpolation matches Spark/DuckDB `percentile`(_cont_):
  * `lo + (h - floor(h)) * (hi - lo)` at `h = p * (n-1)`.
  */
object ExactQuantile {

  /** Exact p-quantiles of `df(valueCol)`; two distributed passes, driver
    * traffic bounded by O(numPartitions + |ps|). `method` selects numpy's
    * interpolation (reference `quantile(method=)`,
    * `reductions/_percentile.py`): "linear" (default, the percentile_cont
    * rule), "lower"/"higher" (bracketing order statistics), "nearest"
    * (round-half-to-even on the rank, numpy's np.around), "midpoint". */
  def quantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                method: String = "linear"): Seq[Double] =
    brackets(df, valueCol, ps).map { case (h, lo, hi) => interp(h, lo, hi, method) }

  /** One method-combination step over a bracket (h, lo, hi). */
  def interp(h: Double, lo: Double, hi: Double, method: String): Double =
    method match {
      case "linear"   => lo + (h - math.floor(h)) * (hi - lo)
      case "lower"    => lo
      case "higher"   => hi
      // numpy np.around semantics: round the rank half-to-even
      case "nearest"  => if (math.rint(h) == math.floor(h)) lo else hi
      case "midpoint" => (lo + hi) / 2
      case other => throw new IllegalArgumentException(
        s"unknown quantile method '$other' (linear/lower/higher/nearest/midpoint)")
    }

  /** The shared two-pass rank selection: for each p, the fractional rank
    * h = p·(n−1) and the order statistics at ⌊h⌋ and ⌈h⌉ — every
    * interpolation method combines these three numbers. */
  def brackets(df: DataFrame, valueCol: String, ps: Seq[Double]): Seq[(Double, Double, Double)] = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .repartitionByRange(parts, col("v"))
      .sortWithinPartitions("v")
      .persist()
    try {
      val rdd = sorted.rdd.map(_.getDouble(0))
      val counts = rdd
        .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
        .collect().sortBy(_._1).map(_._2)
      val offsets = counts.scanLeft(0L)(_ + _)
      val n = offsets.last
      require(n > 0, "quantile of empty input")
      val hs = ps.map(p => p * (n - 1))
      val targets = hs.flatMap(h => Seq(math.floor(h).toLong, math.ceil(h).toLong)).toSet
      val bc = spark.sparkContext.broadcast((offsets, targets))
      val found = rdd.mapPartitionsWithIndex { case (i, it) =>
        val (off, tg) = bc.value
        val start = off(i)
        it.zipWithIndex.collect { case (v, j) if tg.contains(start + j) => (start + j, v) }
      }.collect().toMap
      hs.map(h => (h, found(math.floor(h).toLong), found(math.ceil(h).toLong)))
    } finally { sorted.unpersist(); () }
  }

  /** Approximate quantiles via Spark's mergeable QuantileSummaries (GK)
    * sketch — `approx_percentile` — the engine's analogue of the
    * reference's merge-percentiles / t-digest scale path
    * (`reductions/_percentile.py:151,256`). ONE partial+final aggregation:
    * each partition keeps an O(accuracy) summary, summaries merge on the
    * reduce side, no value ever buffers whole. Rank error is bounded by
    * n/accuracy. Returns one row: `est` (array, one per p) and `n`. */
  /** The `approx_percentile` SQL fragment shared by the batch and
    * streaming quantile paths — one construction site so the literal
    * formatting cannot drift between them. */
  def approxPercentileExpr(valueCol: String, ps: Seq[Double], accuracy: Int): String = {
    val arr = ps.map(p => s"${p}D").mkString(", ")
    s"approx_percentile($valueCol, array($arr), $accuracy)"
  }

  def approx(df: DataFrame, valueCol: String, ps: Seq[Double],
             accuracy: Int = 10000): DataFrame =
    df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .agg(
        expr(approxPercentileExpr("v", ps, accuracy)).as("est"),
        count(col("v")).as("n"))
}
