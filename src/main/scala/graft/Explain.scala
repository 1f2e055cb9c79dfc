package graft
import org.apache.spark.sql.SparkSession

/** Diagnostics main (SURVEY §2.14): print the formatted physical plan of
  * named queries — the Spark-side counterpart of the expression layer's
  * `pprintCost`. Usage: Explain <sfDir> <queryName>... */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          println(s"\n================ $n ================")
          try println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
          catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
        case None => println(s"no such query: $n")
      }
    }
    spark.stop()
  }
}
