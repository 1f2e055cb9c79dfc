package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lazy 3-d array (batch × rows × cols) as an element table
  * `(b BIGINT, i BIGINT, j BIGINT, v DOUBLE)` — the batched-dimension
  * slice of the reference's N-d chunked array (reference batched matmul /
  * tensordot, `dask_array/linalg/_tensordot.py:194-316`: leading
  * dimensions map blockwise over both operands).
  *
  * The batch coordinate rides every key: elemwise aligns on `(b,i,j)`,
  * contraction joins on `(b,k)` and aggregates on `(b,i,j)` — so one
  * shuffle handles ALL batches at once and partitioning spreads batches
  * across the cluster (never one-job-per-batch driver looping).
  */
final class DTensor(val df: DataFrame, val batch: Long, val rows: Long, val cols: Long) {

  private def wrap(d: DataFrame): DTensor = new DTensor(d, batch, rows, cols)

  def map(sqlOverV: String): DTensor =
    wrap(df.selectExpr("b", "i", "j", s"CAST($sqlOverV AS DOUBLE) AS v"))

  /** Aligned elemwise combine on (b, i, j). */
  def zip(o: DTensor, sqlOverV1V2: String): DTensor = {
    require(batch == o.batch && rows == o.rows && cols == o.cols, "shape mismatch")
    val l = df.withColumnRenamed("v", "v1")
    val r = o.df.withColumnRenamed("v", "v2")
    wrap(l.join(r, Seq("b", "i", "j")).selectExpr("b", "i", "j", s"CAST($sqlOverV1V2 AS DOUBLE) AS v"))
  }

  /** Batched matrix multiply: for each batch b, `this[b] @ o[b]` — ONE
    * join on `(b, k)` + ONE aggregation on `(b, i, j)` covering every
    * batch (reference `matmul` batched dims, `linalg/_tensordot.py:194`). */
  def matmul(o: DTensor): DTensor = {
    require(batch == o.batch && cols == o.rows, s"batched matmul mismatch")
    val a = df.select(col("b"), col("i"), col("j").as("k"), col("v").as("va"))
    val bb = o.df.select(col("b"), col("i").as("k"), col("j"), col("v").as("vb"))
    new DTensor(
      a.join(bb, Seq("b", "k")).groupBy("b", "i", "j")
        .agg(sum(col("va") * col("vb")).as("v")),
      batch, rows, o.cols)
  }

  /** Per-batch transpose — key projection, no movement. */
  def t: DTensor = new DTensor(
    df.select(col("b"), col("j").as("i"), col("i").as("j"), col("v")), batch, cols, rows)

  /** One batch as a 2-d matrix. */
  def slice(b0: Long): DMatrix =
    new DMatrix(df.where(col("b") === b0).select(col("i"), col("j"), col("v")), rows, cols)

  /** Reduce the batch axis away (e.g. "sum" over b → 2-d). */
  def reduceBatch(sqlAggOverV: String): DMatrix =
    new DMatrix(
      df.groupBy("i", "j").agg(expr(sqlAggOverV).cast("double").as("v")), rows, cols)

  /** Per-batch trace: one row per b. */
  def traces: DataFrame =
    df.where(col("i") === col("j")).groupBy("b").agg(sum("v").as("tr"))

  /** Axis-subset reduction (reference axis tuples,
    * `reductions/_reduction.py:89-95`): groupBy the KEPT coordinates —
    * one partial-aggregated shuffle regardless of which axes collapse.
    * `keep` is any subset of "b", "i", "j". */
  def reduceAxes(keep: Seq[String], sqlAggOverV: String): DataFrame = {
    require(keep.nonEmpty && keep.forall(Set("b", "i", "j")), s"bad axes $keep")
    df.groupBy(keep.map(col): _*).agg(expr(sqlAggOverV).cast("double").as("v"))
  }

  def elements: DataFrame = df
}

object DTensor {
  /** Generator over (b, i, j) — one `spark.range` scan. */
  def tabulate(spark: SparkSession, batch: Long, rows: Long, cols: Long,
               sqlOverBIJ: String): DTensor =
    new DTensor(
      spark.range(batch * rows * cols).selectExpr(
        s"id DIV ${rows * cols} AS b",
        s"(id DIV $cols) % $rows AS i",
        s"id % $cols AS j",
        s"CAST($sqlOverBIJ AS DOUBLE) AS v"),
      batch, rows, cols)

  /** Stack matrices along a new batch axis (reference `stack`). */
  def stack(ms: Seq[DMatrix]): DTensor = {
    require(ms.nonEmpty && ms.forall(m => m.rows == ms.head.rows && m.cols == ms.head.cols))
    val dfs = ms.zipWithIndex.map { case (m, b) =>
      m.df.select(lit(b.toLong).as("b"), col("i"), col("j"), col("v"))
    }
    new DTensor(dfs.reduce(_ unionByName _), ms.length.toLong, ms.head.rows, ms.head.cols)
  }
}
