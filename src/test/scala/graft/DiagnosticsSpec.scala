package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr._

/** Diagnostics surface (reference expr_flow/expr_table/trace_rewrites,
  * `diagnostics/_expr_flow.py:554`, `_diagnostics.py`): pure driver-side
  * walks — no spark session, no jobs. */
class DiagnosticsSpec extends AnyFunSuite {

  private val src = RangeVec(0, 1, 1000)

  test("exprTable: one row per DISTINCT node; shared subtree counted once") {
    val shared = MapVec(src, "v * 2")
    val tree = ZipVec(SliceVec(shared, 0, 500), SliceVec(shared, 100, 600), "v1 + v2")
    val table = Diagnostics.exprTable(tree)
    val lines = table.split("\n")
    assert(lines.head.contains("id") && lines.head.contains("moved B"))
    // nodes: zip, 2 distinct slices, ONE shared map, range = 5 (+header)
    assert(lines.length == 6, table)
    // the shared map shows both consumers
    val mapRow = lines.find(_.contains("map[")).getOrElse(fail(table))
    assert(mapRow.split("\\s{2,}")(3) == "2", s"expected 2 uses:\n$table")
  }

  test("exprTableRows: distinct parents count once; nodes below a shared subtree not double-counted") {
    // diamond PLUS a node under the shared subtree: zip(slice(map(src)),
    // slice'(map(src))) — src sits under the shared map; a per-visit
    // counter would credit it 2 uses (the d02 oracle caught exactly that).
    val shared = MapVec(src, "v * 2")
    val tree = ZipVec(SliceVec(shared, 0, 500), SliceVec(shared, 100, 600), "v1 + v2")
    val rows = Diagnostics.exprTableRows(tree).map(r => (r._1, r._3)).toMap
    assert(rows("map") == 2, rows)    // two distinct slice consumers
    assert(rows("range") == 1, rows)  // ONE consumer (the shared map), not 2
    assert(rows("zip") == 0, rows)
    // movement model rides through: zip prices two 500-row passes
    val zipRow = Diagnostics.exprTableRows(tree).find(_._1 == "zip").get
    assert(zipRow._5 == 2 * 500 * VecExpr.RowBytes, zipRow)
  }

  test("chunkReportRows: the data behind the histogram, largest layout first") {
    val shared = MapVec(src, "v * 2")
    val tree = ZipVec(SliceVec(shared, 0, 500), SliceVec(shared, 100, 600), "v1 + v2")
    val rows = tree.chunkReportRows
    assert(rows.map(r => (r._1, r._3)) == Seq((1000L, 2), (500L, 3)), rows)
    assert(rows.head._2 == Blocked.autoChunk(1000) && rows.head._4 == 1000 * VecExpr.RowBytes, rows)
    // unknown lengths group under (-1, -1) with unknown bytes
    val unk = ZipVec(FilterVec(src, "v > 3"), MapVec(FilterVec(src, "v > 3"), "v+1"), "v1+v2")
    val urows = unk.chunkReportRows
    assert(urows.exists(r => r._1 == -1L && r._2 == -1L && r._4 == -1L), urows)
  }

  test("chunkReport: layout histogram over distinct nodes, largest first") {
    val shared = MapVec(src, "v * 2")
    val tree = ZipVec(SliceVec(shared, 0, 500), SliceVec(shared, 100, 600), "v1 + v2")
    val rep = tree.chunkReport(limit = 3)
    val lines = rep.split("\n")
    // 5 distinct nodes (shared map once), 2 layouts: len=1000 and len=500
    assert(lines.head == "chunk report: 5 array nodes, 2 layouts", rep)
    assert(lines.exists(l => l.contains("len=1000") && l.trim.startsWith("2")), rep)
    assert(lines.exists(l => l.contains("len=500") && l.trim.startsWith("3")), rep)
    // largest section lists the biggest nodes first (1000-row layouts)
    val idx = lines.indexWhere(_.startsWith("largest nodes"))
    assert(idx > 0 && lines(idx + 1).contains("len=1000"), rep)
    // modeled bytes: 1000 rows * RowBytes
    assert(lines(idx + 1).contains((1000L * VecExpr.RowBytes).toString), rep)
  }

  test("flowDot: valid DOT with one node per distinct subtree, edges child->parent") {
    val shared = MapVec(src, "v * 2")
    val tree = ZipVec(shared, SliceVec(shared, 0, 500), "v1 + v2")
    val dot = Diagnostics.flowDot(tree)
    assert(dot.startsWith("digraph exprflow {") && dot.endsWith("}\n"))
    // 4 distinct nodes: zip, slice, map, range
    assert("\\[shape=box".r.findAllIn(dot).length == 4, dot)
    assert("->".r.findAllIn(dot).length == 4, dot) // range->map, map->zip, map->slice, slice->zip
    assert(dot.contains("moved"), "cost annotations missing")
  }

  test("flowSvg: standalone SVG, one box per distinct node, layered layout") {
    val shared = MapVec(src, "v * 2")
    val tree = ZipVec(SliceVec(shared, 0, 500), SliceVec(shared, 100, 600), "v1 + v2")
    val svg = Diagnostics.flowSvg(tree)
    assert(svg.startsWith("<svg xmlns=") && svg.endsWith("</svg>\n"))
    // 5 distinct nodes: zip, 2 slices, ONE shared map, range
    assert("<rect ".r.findAllIn(svg).length == 5, svg)
    // 5 edges: range->map, map->slice x2, slice->zip x2
    assert("<line ".r.findAllIn(svg).length == 5, svg)
    assert(svg.contains("moved"), "cost annotations missing")
    // layering: the range leaf sits strictly below the zip root
    val ys = """<rect x="\d+" y="(\d+)"""".r.findAllMatchIn(svg).map(_.group(1).toInt).toSeq
    assert(ys.max > ys.min, "expected distinct layers")
  }

  test("trace records the rewrite trail and lands on the same plan as apply") {
    // self-zip shape: fuses in a couple of rounds
    val tree = ZipVec(src, MapVec(src, "1 + v % 7"), "v1 * v2")
    val (simplified, steps) = Simplify.trace(tree)
    assert(simplified.name == Simplify(tree).name)
    assert(steps.nonEmpty, "expected at least one rewrite round")
    assert(steps.head.before != steps.head.after)
    assert(steps.map(_.round) == steps.map(_.round).sorted)
    // an already-simplified plan traces to an empty trail
    val (again, none) = Simplify.trace(simplified)
    assert(again.name == simplified.name && none.isEmpty)
  }
}
