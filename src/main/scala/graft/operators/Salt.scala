package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins (SURVEY's "salting for skew" scale
  * tool). Spark already covers most skew at runtime: partial aggregation
  * absorbs skewed groupBy counts map-side, `count(distinct)` expands to a
  * two-phase plan, and AQE's skew-join rule splits an oversized
  * sort-merge partition — all on by default. The one case none of those
  * fix is a join whose hot key is heavy on BOTH sides, or whose build
  * side is too large to broadcast: AQE can split only one side of a pair,
  * so the hot partition runs on one task regardless.
  *
  * [[saltedJoin]] is the explicit fix: the probe row derives a
  * DETERMINISTIC salt from one of its non-key columns (no `rand()` — the
  * engine's reproducibility rule: a retried task must land its rows in
  * the same buckets), the build side replicates `saltFactor` ways, and
  * the join keys on `(key, salt)` — one hot partition becomes
  * `saltFactor` partitions at the cost of `saltFactor`× the build side's
  * shuffle volume. Worth it exactly when the hot key dominates a
  * partition; the caller chooses when.
  */
object Salt {

  /** Equi-join `probe ⋈ build` on `key`, salted `saltFactor` ways.
    * `probeSaltCol` must be a probe column (NOT the key) whose values
    * spread the hot key's rows — a row id, position, or payload column.
    * Result equals the unsalted inner join row-for-row. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltFactor: Int, probeSaltCol: String): DataFrame = {
    require(saltFactor > 1, s"saltFactor must be > 1, got $saltFactor")
    val p = probe.withColumn("__salt",
      pmod(hash(col(probeSaltCol)), lit(saltFactor)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
