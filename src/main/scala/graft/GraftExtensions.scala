package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{BitsOf, DotProduct, FromBits}

/** Spark-native deployment hook: register the engine's custom Catalyst
  * expressions through the official `SparkSessionExtensions` mechanism,
  * so a cluster enables them with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (no code changes, works from spark-submit/Connect/SQL-only clients).
  * The per-session `GraftFunctions.register` path stays for embedded use
  * — both routes install the SAME full surface (register's idempotence
  * guard keys on graft_dot, so the two must never diverge). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, s"graft_dot takes 2 args, got ${exprs.length}")
        DotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bits"),
      new ExpressionInfo(classOf[BitsOf].getName, "graft_bits"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, s"graft_bits takes 1 arg, got ${exprs.length}")
        BitsOf(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_from_bits"),
      new ExpressionInfo(classOf[FromBits].getName, "graft_from_bits"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 1, s"graft_from_bits takes 1 arg, got ${exprs.length}")
        FromBits(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 3,
          s"graft_bloom_agg takes (key, expectedItems, numBits), got ${exprs.length}")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_might"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_might"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2,
          s"graft_bloom_might takes (bloom, key), got ${exprs.length}")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))
      }))
  }
}
