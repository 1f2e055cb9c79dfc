package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    // fast path: dump the rendered oracle SQL registry WITHOUT running
    // queries (feeds scripts/lint_oracle_types.py --emit, the DuckDB
    // type sweep behind OracleLintSpec's golden manifest — r15 verdict
    // Next #1/#4: no registered oracle may ever emit HUGEINT again)
    if (args(0) == "--dump-oracles") {
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(args(1)), json)
      System.err.println(s"[verify] dumped ${SparkEntry.oracleSql.size} oracle SQLs to ${args(1)}")
      return
    }
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (dev loop only)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS): read as epoch-nano INT64
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // one codegen-cache entry per distinct stage across 235 queries —
      // the default 100 thrashes and re-janino-compiles (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // the one remaining tail polluter: SparkStringUtils logs a WARN
      // the first time a plan's string form exceeds 25 fields (the
      // linalg panel plans); raise the cap so the stdout tail stays
      // warning-free for the driver's parse window
      .config("spark.sql.debug.maxToStringFields", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a typo'd filter name silently verifies NOTHING — fail loudly so a
    // dev-loop "all green" can never mean "ran zero queries"
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty) {
        System.err.println(
          s"[verify] UNKNOWN query names in filter: ${unknown.toSeq.sorted.mkString(", ")}")
        sys.exit(2) // a typo'd --only exiting green would fake an all-pass
      }
    }
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    if (selected.isEmpty) {
      System.err.println("[verify] filter selected ZERO queries — refusing to exit green")
      sys.exit(2)
    }
    // Self-describing result manifest (r12 verdict #1: the driver round
    // recorded an empty CORRECTNESS artifact and nothing could prove
    // whether Verify ran; now every run leaves per-query evidence next
    // to the parquet it wrote, and check_oracle.py asserts the two
    // agree — an empty downstream artifact is attributable to the
    // harness, never ambiguous).
    val manifest =
      scala.collection.mutable.LinkedHashMap[String, (String, Long, String, String)]()
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // count AND canonically hash the WRITTEN files — proves the dir
        // is readable, and publishes a value hash of the exact bytes the
        // driver grades (r14 verdict "next" #1: three driver hash-reds
        // on value-exact output left nothing to compare; now a red is
        // adjudicable against this sorted-row, doubleToLongBits-
        // normalized SHA-256 — see [[CanonicalHash]] for the rules)
        val back = spark.read.parquet(s"$outDir/$name")
        // the canonical hash is INSTRUMENTATION — a hash-only failure
        // (unsupported column type, driver memory pressure on a large
        // collect) must not flip an otherwise-correct query red in the
        // manifest (r15 ADVICE #2). Fall back to count() + an errored
        // canon marker and keep status "ok": the driver's DuckDB compare
        // is the correctness authority, the hash is forensics.
        val (rows, canon) =
          try {
            val r = back.collect()
            (r.length.toLong, CanonicalHash.ofRows(r, back.schema))
          } catch {
            // NonFatal only: an OOM/LinkageError must kill the run, not
            // leave the JVM limping through the remaining queries
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[verify] $name: canon-hash failed " +
                s"(query output kept, status ok): ${e.getMessage}")
              (back.count(), s"hash-error:${e.getClass.getSimpleName}")
          }
        manifest(name) = ("ok", rows, canon, "")
        // replay gates: mirror the hash into the gate's replay-diag
        // artifact so cross-round forensics can compare answers without
        // re-running (r14 verdict "next" #8)
        if (operators.StreamQueries.queries.contains(name))
          operators.StreamQueries.attachSinkHash(name, canon)
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        manifest(name) =
          ("failed", -1L, "", Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val ok = manifest.count(_._2._1 == "ok")
    val failed = manifest.size - ok
    val mJson = "{" +
      s""""registered":${SparkEntry.queries.size},"selected":${selected.size},""" +
      s""""ok":$ok,"failed":$failed,"sf_dir":${jq(sfDir)},"queries":{""" +
      manifest.map { case (k, (st, rows, canon, err)) =>
        s"${jq(k)}:{" + s""""status":${jq(st)},"rows":$rows""" +
          (if (canon.nonEmpty) s""","canon_sha256":${jq(canon)}""" else "") +
          (if (err.nonEmpty) s""","error":${jq(err)}""" else "") + "}"
      }.mkString(",") + "}}"
    Files.writeString(Paths.get(s"$outDir/verify_manifest.json"), mJson)
    System.err.println(s"[verify] manifest: $ok ok, $failed failed, " +
      s"${selected.size} selected of ${SparkEntry.queries.size} registered")
    spark.stop()
    // zero successful queries can NEVER exit green — the r12 driver
    // round's `{}` correctness artifact must be impossible to reproduce
    // from a healthy harness
    if (ok == 0) sys.exit(3)
  }
}
