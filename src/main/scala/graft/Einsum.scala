package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** einsum over element-table matrices (reference `dask_array/_einsum.py:181`
  * — notation parser lowering to a single blockwise contraction; here the
  * lowering target is the join+agg plan of [[DMatrix.matmul]]).
  *
  * Supported: one or two 2-d operands, index letters, repeated letters
  * within an operand (diagonal extraction, `"ii->i"`), contraction over
  * any subset (`"ij,jk->ik"`, `"ij,ij->"`, `"ij->j"`), pure permutation
  * (`"ij->ji"`). Every case plans as: per-operand coordinate projection
  * (+ diagonal filter) → equi-join on shared letters → groupBy output
  * letters + sum — all Catalyst-visible, broadcast/AQE apply as usual.
  */
object Einsum {

  def apply(spec: String, ops: DMatrix*): DataFrame = {
    val Array(lhs, rhs) = spec.replace(" ", "").split("->", -1)
    val inSpecs = lhs.split(",").toSeq
    require(inSpecs.length == ops.length, s"$spec expects ${inSpecs.length} operands")
    require(ops.nonEmpty && ops.length <= 2, "einsum supports 1 or 2 operands")
    val outLetters = rhs.toSeq.map(_.toString)

    // per-operand: rename coords to letters, collapse repeated letters
    def prep(m: DMatrix, letters: String, vName: String): DataFrame = {
      require(letters.length == 2, s"operand spec '$letters' must be 2-d")
      val (a, b) = (letters(0).toString, letters(1).toString)
      if (a == b) // diagonal: "ii" → one coordinate
        m.df.where(col("i") === col("j"))
          .select(col("i").as(a), col("v").as(vName))
      else
        m.df.select(col("i").as(a), col("j").as(b), col("v").as(vName))
    }

    val prepped = inSpecs.zip(ops).zipWithIndex.map { case ((ls, m), n) =>
      (prep(m, ls, s"v$n"), ls.distinct.map(_.toString).toSet)
    }

    val (joined, product): (DataFrame, Column) = prepped match {
      case Seq((d0, _)) => (d0, col("v0"))
      case Seq((d0, l0), (d1, l1)) =>
        val shared = (l0 intersect l1).toSeq.sorted
        val j =
          if (shared.nonEmpty) d0.join(d1, shared)
          else d0.crossJoin(d1)
        (j, col("v0") * col("v1"))
    }

    val allLetters = prepped.flatMap(_._2).distinct
    val contracted = allLetters.filterNot(outLetters.contains)

    if (contracted.isEmpty && outLetters.nonEmpty)
      joined.select(outLetters.map(col) :+ product.as("v"): _*)
    else if (outLetters.isEmpty)
      joined.agg(sum(product).as("v"))
    else
      joined.groupBy(outLetters.map(col): _*)
        .agg(sum(product).as("v"))
  }
}
