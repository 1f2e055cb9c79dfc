package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Binary reinterpretation between float64 and int64 — the reference's
  * `view` (reference `dask_array/_collection.py` `view`: same buffer,
  * new dtype; for same-itemsize dtypes it is a zero-copy bit cast).
  * Spark SQL has no bit-cast, so these are native codegen'd expressions
  * (`Double.doubleToRawLongBits` / `longBitsToDouble` — single JVM
  * intrinsics inside whole-stage codegen). Raw bits are preserved
  * exactly, including NaN payloads and signed zeros, matching numpy's
  * buffer-reinterpret semantics rather than any value conversion. */
case class BitsOf(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bits needs a double argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bits"
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.doubleToRawLongBits($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[BitsOf]]: int64 bit pattern → the float64 it encodes. */
case class FromBits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_from_bits needs a bigint argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_from_bits"
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.longBitsToDouble(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Double.longBitsToDouble($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
