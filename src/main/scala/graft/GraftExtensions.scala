package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProduct

/** Spark-native deployment hook: register the engine's custom Catalyst
  * expressions through the official `SparkSessionExtensions` mechanism,
  * so a cluster enables them with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (no code changes, works from spark-submit/Connect/SQL-only clients).
  * The per-session `GraftFunctions.register` path stays for embedded use
  * — both routes install the same expressions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, s"graft_dot takes 2 args, got ${exprs.length}")
        DotProduct(exprs.head, exprs(1))
      }))
  }
}
