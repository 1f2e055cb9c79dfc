package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query/oracle pairs are contributed per operator domain (SURVEY §2
  * inventory) by the objects under `graft.operators`. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_sum_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Every query
    * runs behind session setup (native-function registration) so no
    * entry depends on another helper having run first. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = ArrayQueries.queries ++ MatrixQueries.queries ++ TextQueries.queries ++
      EmbeddingQueries.queries ++ MultimodalQueries.queries ++ NdQueries.queries ++
      StreamQueries.queries ++ DiagQueries.queries ++ JoinOps.queries
    all.map { case (name, fn) =>
      name -> ((s: SparkSession, d: String) => {
        graft.functions.GraftFunctions.register(s)
        fn(s, d)
      })
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ArrayQueries.oracles ++ MatrixQueries.oracles ++ TextQueries.oracles ++
      EmbeddingQueries.oracles ++ MultimodalQueries.oracles ++ NdQueries.oracles ++
      StreamQueries.oracles ++ DiagQueries.oracles ++ JoinOps.oracles
}
