package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two range-flavored join operators the engine's equi-join surface
  * (SURVEY §2.6) did not yet name as first-class calls: backward AS-OF
  * join and bounded-interval RANGE join. Spark has no native form of
  * either; both are realized as SHAPES over existing operators (the
  * brief's preference order: compose before custom plans), and both are
  * chosen for the 100 TB case:
  *
  *  - `asof` never range-scans: it is ONE union + ONE keyed window
  *    (single shuffle on the join key; per-partition sort, no
  *    data-sized global sort, no per-row subquery, no O(n·m) pair
  *    blow-up even when many left rows share a key).
  *  - `rangeJoin` never goes per-key quadratic: the bounded width W
  *    buckets time into W-sized bands, the right side explodes to its
  *    band and the band below, and the join is a plain equi-shuffle on
  *    (key, band) + an exact residual filter — the classic banding
  *    rewrite of `l.ts <= r.ts < l.ts + W` (each qualifying pair meets
  *    exactly one band key, so no dedup pass is needed).
  */
object JoinOps {

  /** Backward as-of join: for every left row, attach the payload of the
    * most recent right row with the same `key` and `rightTs <= leftTs`
    * (NULL payloads when no right row precedes it — LEFT semantics).
    *
    * Implementation: tag right rows side=0 and left rows side=1, union,
    * and take `last(payloadStruct, ignoreNulls)` over the per-key
    * window ordered by (ts, side) — right sorts before left at equal
    * timestamps, so an exactly-simultaneous right row is visible to the
    * left row, matching the `l.ts >= r.ts` contract of DuckDB/pandas
    * ASOF. The payloads travel as ONE STRUCT so the attached values
    * always come from a single right ROW — folding `last(ignoreNulls)`
    * over each payload column separately would skip a NULL field and
    * reach back to an OLDER right row for just that column, silently
    * assembling a torn row no engine's ASOF would produce (and
    * attaching a non-NULL where the matched row says NULL). One struct
    * ⇒ one Window expression ⇒ one exchange + one sort regardless of
    * payload width.
    *
    * DETERMINISM CONTRACT: (key, ts) must be unique on the RIGHT side —
    * two simultaneous right rows would make "the most recent payload"
    * ill-defined in any engine (DuckDB's ASOF picks one arbitrarily).
    * Pre-aggregate the right side (e.g. max_by) to enforce it; the j01
    * gate does. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           payloads: Seq[String]): DataFrame = {
    val leftOthers = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val pStruct = struct(payloads.map(col): _*)
    val lu = left.select(
      Seq(col(key), col(ts).as("_ts"), lit(1).as("_side")) ++
        leftOthers.map(col) :+
        lit(null).cast(right.select(pStruct).schema.head.dataType).as("_p"): _*)
    val ru = right.select(
      Seq(col(key), col(ts).as("_ts"), lit(0).as("_side")) ++
        leftOthers.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        pStruct.as("_p"): _*)
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(Seq(col(key), col("_ts").as(ts)) ++
        leftOthers.map(col) ++ payloads.map(p => col(s"_p.$p").as(p)): _*)
  }

  /** Bounded-interval range join: all pairs (l, r) with equal `key` and
    * `r.ts` in `[l.ts, l.ts + widthUs)` (timestamps compared in epoch
    * microseconds). The banding rewrite: band = floor(us / widthUs);
    * any qualifying r lies in l's band or the one above, so exploding
    * the right side to (band, band − 1) and equi-joining on
    * (key, band) finds every pair exactly once; the exact inequality
    * then filters band-mates outside the interval. One explode (2×
    * the right side's keys only) + one hash-partitioned equi-join —
    * shuffle volume O(|l| + 2|r|), never a per-key cross. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                ts: String, widthUs: Long,
                lOut: Seq[String], rOut: Seq[String]): DataFrame = {
    val l = left.select(
      Seq(col(key), unix_micros(col(ts)).as("_lus")) ++ lOut.map(col): _*)
      .withColumn("_band", col("_lus").divide(widthUs).cast("long"))
    val r = right.select(
      Seq(col(key).as("_rk"), unix_micros(col(ts)).as("_rus")) ++ rOut.map(col): _*)
      .withColumn("_band",
        explode(array((col("_rus") / widthUs).cast("long"),
          (col("_rus") / widthUs).cast("long") - 1)))
    l.join(r, l(key) === r("_rk") && l("_band") === r("_band"))
      .where(col("_rus") >= col("_lus") &&
        col("_rus") < col("_lus") + lit(widthUs))
      .select((lOut ++ rOut).map(col) :+ col(key): _*)
  }

  /** events.parquet with its TIMESTAMP(NANOS) ts normalized to a
    * session TIMESTAMP — the parquet type surfaces as BIGINT nanos
    * under `spark.sql.legacy.parquet.nanosAsLong` or as TIMESTAMP_NTZ
    * otherwise, so every consumer must branch on the schema dtype. ONE
    * shared reader (used by j01/j02 here and the s04–s07 streaming
    * gates) so a corpus ts-encoding change can never shift timestamps
    * in only some gates. */
  private[operators] def normalizedEvents(s: SparkSession, d: String): DataFrame = {
    val base = s.read.parquet(s"$d/events.parquet")
    val tsExpr = base.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "timestamp_micros(ts DIV 1000)"
      case _ => "CAST(ts AS TIMESTAMP)"
    }
    base.selectExpr(s"$tsExpr AS ts", "user_id", "event_id", "value")
  }

  private def events(s: SparkSession, d: String): DataFrame =
    normalizedEvents(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // AS-OF JOIN under the oracle: every 10th event is a "status
    // update"; each remaining event attaches the latest status at or
    // before its own timestamp (the canonical time-series enrichment).
    // The right side pre-aggregates to unique (user, ts) via max_by so
    // the most-recent payload is well-defined in both engines; the
    // status is integer-quantized and missing statuses map to -1 (a
    // NULL-free, order-pinned output). Oracle: DuckDB's NATIVE ASOF
    // LEFT JOIN — the engine's composition must reproduce the
    // definitional operator exactly.
    "j01_asof_join" -> ((s, d) => {
      val ev = events(s, d)
      val right = ev.where("event_id % 10 = 0")
        .groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("sv"))
      val left = ev.where("event_id % 10 <> 0")
        .select("user_id", "ts", "event_id")
      asof(left, right, key = "user_id", ts = "ts", payloads = Seq("sv"))
        .selectExpr("event_id",
          "coalesce(CAST(floor(sv * 64) AS BIGINT), -1) AS status_q")
        .orderBy("event_id")
    }),

    // RANGE JOIN under the oracle: the batch form of the s07 interval
    // semantics — every same-user event pair within 6 hours — realized
    // with the banding rewrite (equi-shuffle on (user, band), exact
    // residual filter), so the batch path carries the same 100 TB
    // contract the streaming twin documents. Output = s07's pair set.
    "j02_range_join" -> ((s, d) => {
      val ev = events(s, d)
      val l = ev.selectExpr("user_id", "ts", "event_id AS a")
      val r = ev.selectExpr("user_id", "ts", "event_id AS b")
      rangeJoin(l, r, key = "user_id", ts = "ts",
          widthUs = 6L * 3600 * 1000000, lOut = Seq("a"), rOut = Seq("b"))
        .where("a <> b")
        .selectExpr("user_id AS u", "a", "b")
        .orderBy("u", "a", "b")
    })
  )

  val oracles: Map[String, String] = Map(

    // DuckDB's native ASOF LEFT JOIN is the definitional oracle
    "j01_asof_join" ->
      """WITH r AS (SELECT user_id AS u, ts, max_by(value, event_id) AS sv
                    FROM events WHERE event_id % 10 = 0 GROUP BY 1, 2),
           l AS (SELECT user_id AS u, ts, event_id
                 FROM events WHERE event_id % 10 <> 0)
         SELECT l.event_id AS event_id,
           coalesce(CAST(floor(r.sv * 64) AS BIGINT), -1) AS status_q
         FROM l ASOF LEFT JOIN r ON l.u = r.u AND l.ts >= r.ts
         ORDER BY event_id""",

    // the definitional range self-join (same SQL family as s07's)
    "j02_range_join" ->
      """WITH e AS (SELECT user_id AS u, event_id AS i, ts FROM events)
         SELECT l.u AS u, l.i AS a, r.i AS b
         FROM e l JOIN e r ON l.u = r.u AND l.i <> r.i
           AND r.ts >= l.ts AND r.ts < l.ts + INTERVAL 6 HOUR
         ORDER BY u, a, b"""
  )
}
