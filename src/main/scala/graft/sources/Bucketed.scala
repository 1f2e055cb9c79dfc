package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location (the brief's "pre-partitioning for
  * co-located joins"): persist a table hash-bucketed on its join key so
  * every later equi-join or aggregation on that key runs WITHOUT a
  * shuffle — the scan itself satisfies the hash distribution. At 100 TB
  * this converts the dominant repeated cost (re-shuffling a fact table
  * for every join against it) into a one-time write-side sort: exactly
  * the reference's "known chunk grid" property, persisted.
  *
  * Both sides must use the SAME bucket count (Spark only elides the
  * exchange when distributions match); `sortBy` additionally lets the
  * sort-merge join skip its per-task sort. */
object Bucketed {

  /** Write `df` as a bucketed+sorted table named `name`. With `path` the
    * table is EXTERNAL (data at `path`, independent of the session's
    * static `spark.sql.warehouse.dir`); without, a managed table in the
    * warehouse. */
  def writeBucketed(df: DataFrame, name: String, key: String,
                    buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(name)
  }

  /** Equi-join two bucketed tables on their bucket key — plans with zero
    * Exchange when both were written with the same bucket count. */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
                    left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
