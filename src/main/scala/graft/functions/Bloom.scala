package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Decontamination against an eval set that is too large to broadcast
  * exactly — the 100 TB-scale version of the broadcast anti-join
  * (reference decontamination flow; cf. `TextQueries` t14).
  *
  * The exact anti-join shuffles the full training corpus on the join
  * key. At 100 TB that shuffle IS the job. Here the eval keys are
  * folded into ONE Bloom-filter blob (Spark's own
  * `BloomFilterAggregate` sketch — the engine's runtime-filter
  * machinery, exposed as `graft_bloom_agg`/`graft_bloom_might`), the
  * blob ships to every scan as a LITERAL predicate, and only the
  * might-contain sliver (fpp of the corpus + the truly contaminated
  * rows) reaches the exact confirm join. Shuffle volume drops from
  * O(|train|) to O(fpp·|train| + |eval| + |contaminated|) while the
  * RESULT stays exact — false positives are re-checked, false
  * negatives don't exist.
  *
  * Cost trade, stated plainly: the clean/confirm branches are two
  * consumers of `train`, so the corpus is SCANNED twice (the blob
  * predicate is not parquet-pushable — it filters post-scan). Two scans
  * for near-zero shuffle is the right trade when the join shuffle
  * dominates (the 100 TB decontamination case); when scan I/O dominates
  * and the eval set fits a broadcast, prefer the single-scan broadcast
  * anti-join (`TextQueries` t14 / `StreamOps.filterContaminated`).
  *
  * Driver traffic is the blob itself: ~1.2 MB per million eval keys at
  * 1% fpp (documented O(sketch), same class as the linalg panels). */
object Bloom {

  /** Fold `keyCol`'s xxhash64 keys into a serialized Bloom filter.
    * Returns None for an empty eval set (nothing to filter). */
  def buildBlob(eval: DataFrame, keyCol: String, expectedItems: Long,
                fpp: Double = 0.01): Option[Array[Byte]] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1), got $expectedItems / $fpp")
    // standard Bloom sizing: m = -n ln(p) / (ln 2)^2
    val bits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    GraftFunctions.register(eval.sparkSession)
    // xxhash64 is NON-nullable (a NULL input leaves the fold at its
    // seed), so feed the agg NULL for NULL keys: they must not enter the
    // sketch — a NULL key never matches anything (SQL join semantics),
    // and an all-NULL eval must yield None, not a one-entry blob
    val row = eval
      .selectExpr(s"graft_bloom_agg(CASE WHEN $keyCol IS NULL THEN NULL ELSE xxhash64($keyCol) END, CAST($expectedItems AS BIGINT), CAST($bits AS BIGINT)) AS bf")
      .head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Rows of `train` whose `keyCol` does NOT appear in `eval` — with the
    * scale shape described above: branch 1 keeps the definite negatives
    * with NO join (the blob literal is a scan-side filter), branch 2
    * confirms only the might-contain sliver.
    *
    * The confirm join is keyed on a 128-BIT HASH PAIR of the key — two
    * genuinely independent xxhash64 seeds, `xxhash64(k)` and
    * `xxhash64('graft2', k)` (constant FIRST, so the fold runs under a
    * distinct effective seed) — never the raw key column: a document
    * key is the document text here, and an exchange carrying it would
    * move ~corpus bytes where the pair moves 16 bytes/row (the same
    * keying contract as the ExactSubstr family, QuerySpec-linted).
    * Collision cost: a clean row is wrongly dropped only if its text
    * agrees with some eval text on BOTH hashes — P ≈ |sliver|·|eval|/2¹²⁸,
    * ~10⁻²⁰ at 10¹⁰×10⁸ — and the DuckDB gate compares exact text
    * results, so any collision-induced divergence fails the round. */
  def decontaminate(train: DataFrame, eval: DataFrame, keyCol: String,
                    expectedEval: Long, fpp: Double = 0.01): DataFrame =
    buildBlob(eval, keyCol, expectedEval, fpp) match {
      case None => train // empty eval set: everything is clean
      case Some(blob) =>
        val key = col(keyCol)
        val might =
          call_function("graft_bloom_might", lit(blob), xxhash64(key))
        val h1 = xxhash64(key)
        val h2 = xxhash64(lit("graft2"), key)
        // NULL keys: xxhash64 is non-nullable, so a NULL train key and a
        // NULL eval key would hash EQUAL and the pair join would drop
        // rows that raw-key anti-join semantics keep (NULL never equals
        // NULL). Route NULL train keys straight to the clean branch and
        // keep NULL eval keys out of the confirm set.
        val clean = train.where(key.isNull || !might)
        val confirmed = train.where(key.isNotNull && might)
          .withColumn("_gbh1", h1).withColumn("_gbh2", h2)
          .join(eval.where(key.isNotNull)
            .select(h1.as("_gbh1"), h2.as("_gbh2")).distinct(),
            Seq("_gbh1", "_gbh2"), "left_anti")
          .drop("_gbh1", "_gbh2")
        clean.unionByName(confirmed)
    }
}
