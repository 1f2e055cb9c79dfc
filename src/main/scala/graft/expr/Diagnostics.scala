package graft.expr

/** Plan diagnostics beyond `pprint`/`pprintCost` — the engine's analogue
  * of the reference's `expr_flow` / `expr_table` / `trace_rewrites`
  * surface (`dask_array/diagnostics/_expr_flow.py:554`,
  * `_diagnostics.py`). Everything here is a pure driver-side walk over the
  * [[VecExpr]] DAG: no job runs, no data moves.
  *
  *  - [[exprTable]]: one row per DISTINCT node (content-addressed, so
  *    shared subtrees appear once with their consumer count) — name
  *    prefix, op token, static length, per-node and subtree transfer
  *    bytes. The reference renders the same columns into its HTML table.
  *  - [[flowDot]]: the DAG as Graphviz DOT with cost-annotated labels —
  *    the data behind the reference's expr_flow SVG, emitted as portable
  *    text (render with any dot binary; none ships in this container).
  *  - [[Simplify.trace]]: the rewrite trail — one entry per fixpoint
  *    round that changed the plan, with the before/after `pprint`.
  */
object Diagnostics {

  private def collect(root: VecExpr): Seq[VecExpr] = {
    val seen = scala.collection.mutable.LinkedHashMap[String, VecExpr]()
    def walk(e: VecExpr): Unit = {
      if (!seen.contains(e.name)) { seen(e.name) = e; e.children.foreach(walk) }
    }
    walk(root)
    seen.values.toSeq
  }

  private def consumerCounts(root: VecExpr): Map[String, Int] = {
    val acc = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val seen = scala.collection.mutable.Set[String]()
    def walk(e: VecExpr): Unit = {
      e.children.foreach { c => acc(c.name) += 1 }
      if (seen.add(e.name)) e.children.foreach(walk)
    }
    walk(root)
    acc.toMap.withDefaultValue(0)
  }

  /** Fixed-width text table over the distinct DAG nodes (the reference's
    * `expr_table`): id, op, static length, consumers, own moved bytes. */
  def exprTable(root: VecExpr): String = {
    val consumers = consumerCounts(root)
    val rows = collect(root).map { e =>
      val (lo, hi) = e.transferBytes
      val hiS = if (hi < 0) "?" else hi.toString
      (e.name.take(8), e.token, if (e.length < 0) "?" else e.length.toString,
        consumers(e.name).toString, s"$lo..$hiS")
    }
    val header = ("id", "op", "len", "uses", "moved B")
    val all = header +: rows
    def w(i: Int) = all.map(r => r.productElement(i).asInstanceOf[String].length).max
    all.map { r =>
      (0 until 5).map(i => r.productElement(i).asInstanceOf[String].padTo(w(i), ' '))
        .mkString("  ")
    }.mkString("\n")
  }

  /** Graphviz DOT of the expression DAG with transfer-cost labels (the
    * reference's expr_flow, as text). Shared subtrees collapse to one
    * node because edges key on content names. */
  def flowDot(root: VecExpr): String = {
    val nodes = collect(root)
    val ids = nodes.map(_.name).zipWithIndex.toMap
    val sb = new StringBuilder("digraph exprflow {\n  rankdir=BT;\n")
    nodes.foreach { e =>
      val (lo, hi) = e.transferBytes
      val hiS = if (hi < 0) "?" else hi.toString
      val label = e.token.replace("\\", "\\\\").replace("\"", "\\\"")
      sb ++= s"""  n${ids(e.name)} [shape=box, label="$label\\nmoved $lo..$hiS B"];\n"""
    }
    nodes.foreach { e =>
      e.children.foreach { c =>
        sb ++= s"  n${ids(c.name)} -> n${ids(e.name)};\n"
      }
    }
    sb ++= "}\n"
    sb.result()
  }
}
