package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.DArray

/** Array-engine queries exposed through the driver contract: each entry
  * computes through the DArray expression layer (scan → pushdown-optimized
  * element table → Catalyst) and has a DuckDB-equivalent oracle over the
  * same parquet tables.
  *
  * Determinism rules (hash-compare with the oracle):
  *   - every multi-row result is ORDER BY'd identically on both sides;
  *   - any value whose accumulation order differs between engines (sums,
  *     window aggregates, stddev) is round()ed identically on both sides;
  *   - pure elemwise IEEE arithmetic (`+ - * /`) is left unrounded — it is
  *     bit-identical across engines.
  */
object ArrayQueries {

  private def events(s: SparkSession, d: String): DArray =
    DArray.fromColumn(s, d, "events", "event_id", "value")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FromParquet → Elemwise → Reduction: the SURVEY §7.2 minimum slice.
    "q01_sum_revenue" -> ((s, d) =>
      DArray.fromColumn(s, d, "lineitem", "l_orderkey * 8 + l_linenumber",
          "l_extendedprice * (1 - l_discount)")
        .reduce("round(sum(v), 2)" -> "revenue")),

    // full reduction suite over one pass (partial+final agg in one exchange)
    "q02_stats_events" -> ((s, d) =>
      events(s, d).reduce(
        "round(sum(v), 2)" -> "s",
        "round(avg(v), 4)" -> "m",
        "round(min(v), 2)" -> "lo",
        "round(max(v), 2)" -> "hi",
        "round(stddev_samp(v), 4)" -> "sd",
        "round(var_samp(v), 4)" -> "vr",
        "count(v)" -> "n")),

    "q03_cumsum" -> ((s, d) =>
      events(s, d).cumsum.elements
        .select(col("idx"), round(col("v"), 2).as("v")).orderBy("idx")),

    "q04_diff" -> ((s, d) =>
      events(s, d).diff(1).elements
        .select(col("idx"), round(col("v"), 2).as("v")).orderBy("idx")),

    "q05_sliding_mean" -> ((s, d) =>
      events(s, d).sliding(7, "mean", minCount = 4).elements
        .select(col("idx"), round(col("v"), 4).as("v")).orderBy("idx")),

    "q06_topk" -> ((s, d) => events(s, d).topk(10)),

    "q07_mask" -> ((s, d) =>
      events(s, d).mask("v > 150").elements.orderBy("idx")),

    // slice → map: the slice is pushed into the parquet scan (region)
    "q08_slice_map" -> ((s, d) =>
      events(s, d).slice(100, 200).map("v * 2 + 1").elements.orderBy("idx")),

    "q09_setitem" -> ((s, d) =>
      events(s, d).setItems(Seq(5L -> 0.0, 10L -> 999.5)).slice(0, 20)
        .elements.orderBy("idx")),

    // creation ops: arange ++ linspace (exact-step values, bit-stable)
    "q10_concat_ranges" -> ((s, d) =>
      (DArray.arange(s, d, 0, 125, 0.25) ++ DArray.linspace(s, d, 1000, 1500, 501))
        .elements.orderBy("idx")),

    "q11_ffill" -> ((s, d) =>
      DArray.fromColumn(s, d, "events", "event_id",
          "CASE WHEN event_type = 'error' THEN NULL ELSE value END")
        .ffill.elements.orderBy("idx")),

    // x[i] + x[i+100]: the reference's `x + roll(x, s)` interleaved-alignment
    // case (reference bench/bench_rechunk_insertion.py:13-33) as a
    // position-offset self-join
    "q12_shift_add" -> ((s, d) => {
      val a = events(s, d)
      a.slice(0, 800).zip(a.slice(100, 900), "v1 + v2").elements.orderBy("idx")
    }),

    // zero-IO creation + elemwise + reduce (integers exact below 2^53)
    "q13_arange_dot" -> ((s, d) =>
      DArray.arange(s, d, 0, 100000, 1).map("v * v")
        .reduce("sum(v)" -> "s", "count(v)" -> "n")),

    "q14_cummax" -> ((s, d) =>
      events(s, d).cummax.elements.orderBy("idx")),
  )

  val oracles: Map[String, String] = Map(
    "q01_sum_revenue" ->
      "SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue FROM lineitem",

    "q02_stats_events" ->
      """SELECT round(sum(value), 2) AS s, round(avg(value), 4) AS m,
         round(min(value), 2) AS lo, round(max(value), 2) AS hi,
         round(stddev_samp(value), 4) AS sd, round(var_samp(value), 4) AS vr,
         CAST(count(value) AS BIGINT) AS n FROM events""",

    "q03_cumsum" ->
      """SELECT event_id AS idx, round(sum(value) OVER (ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS v
         FROM events ORDER BY idx""",

    "q04_diff" ->
      """SELECT event_id - 1 AS idx, round(d, 2) AS v FROM (
           SELECT event_id, value - lag(value) OVER (ORDER BY event_id) AS d
           FROM events) WHERE event_id >= 1 ORDER BY idx""",

    "q05_sliding_mean" ->
      """SELECT event_id AS idx,
         CASE WHEN count(value) OVER w >= 4
              THEN round(avg(value) OVER w, 4) END AS v
         FROM events
         WINDOW w AS (ORDER BY event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY idx""",

    "q06_topk" ->
      "SELECT event_id AS idx, value AS v FROM events ORDER BY v DESC, idx LIMIT 10",

    "q07_mask" ->
      "SELECT event_id AS idx, value AS v FROM events WHERE value > 150 ORDER BY idx",

    "q08_slice_map" ->
      """SELECT event_id - 100 AS idx, value * 2 + 1 AS v FROM events
         WHERE event_id >= 100 AND event_id < 200 ORDER BY idx""",

    "q09_setitem" ->
      """SELECT event_id AS idx,
         CASE WHEN event_id = 5 THEN 0.0 WHEN event_id = 10 THEN 999.5
              ELSE value END AS v
         FROM events WHERE event_id < 20 ORDER BY idx""",

    "q10_concat_ranges" ->
      """SELECT CAST(i AS BIGINT) AS idx, i * 0.25 AS v FROM range(500) t(i)
         UNION ALL
         SELECT CAST(500 + i AS BIGINT) AS idx, 1000.0 + i AS v FROM range(501) t(i)
         ORDER BY idx""",

    "q11_ffill" ->
      """SELECT event_id AS idx,
         last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
           OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
         FROM events ORDER BY idx""",

    "q12_shift_add" ->
      """SELECT a.event_id AS idx, a.value + b.value AS v
         FROM events a JOIN events b ON b.event_id = a.event_id + 100
         WHERE a.event_id < 800 ORDER BY idx""",

    "q13_arange_dot" ->
      """SELECT sum(CAST(i AS DOUBLE) * CAST(i AS DOUBLE)) AS s,
         CAST(count(*) AS BIGINT) AS n FROM range(100000) t(i)""",

    "q14_cummax" ->
      """SELECT event_id AS idx, max(value) OVER (ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
         FROM events ORDER BY idx""",
  )
}
