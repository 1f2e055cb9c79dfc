package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[CanonicalHash]] — the adjudication hash the r14 verdict mandated
  * (three s03 driver hash-reds on value-exact output). These pins are
  * the contract: if any of them changes, cross-round hash comparisons
  * silently break, so a deliberate change must bump them knowingly. */
class CanonicalHashSpec extends AnyFunSuite {
  import TestSpark.spark

  private def df(pairs: (Long, Double)*) = {
    val sp = spark
    import sp.implicits._
    pairs.toDF("idx", "v")
  }

  test("row order and partitioning never change the hash") {
    val a = df((1L, 1.5), (2L, 2.5), (3L, -7.0))
    val b = df((3L, -7.0), (1L, 1.5), (2L, 2.5)).repartition(3)
    assert(CanonicalHash.of(a) == CanonicalHash.of(b))
  }

  test("columns digest in NAME order — select order is irrelevant, names are not") {
    val a = df((1L, 1.5))
    assert(CanonicalHash.of(a.select("idx", "v")) ==
      CanonicalHash.of(a.select("v", "idx")),
      "the driver sorts columns by name before hashing; ours must too")
    // names themselves are NOT digested (the driver hashes values after
    // the name sort; schema agreement is its separate check) — but a
    // rename that changes the SORT ORDER reorders the digested values
    assert(CanonicalHash.of(a) ==
      CanonicalHash.of(a.withColumnRenamed("v", "w")),
      "v->w keeps the idx-first order: same value sequence, same hash")
    assert(CanonicalHash.of(a) !=
      CanonicalHash.of(a.withColumnRenamed("v", "a")),
      "v->a flips the column order: different value sequence")
  }

  test("float normalization: every NaN collapses, -0.0 stays distinct, NULL != 0") {
    val sp = spark
    import sp.implicits._
    val qnan = java.lang.Double.longBitsToDouble(0x7ff8000000000000L)
    val snan = java.lang.Double.longBitsToDouble(0x7ff0000000000001L)
    assert(CanonicalHash.of(Seq(Tuple1(qnan)).toDF("v")) ==
      CanonicalHash.of(Seq(Tuple1(snan)).toDF("v")),
      "doubleToLongBits must canonicalize NaN payloads")
    assert(CanonicalHash.of(Seq(Tuple1(0.0)).toDF("v")) !=
      CanonicalHash.of(Seq(Tuple1(-0.0)).toDF("v")),
      "the driver hash is signed-zero-sensitive; ours must be too")
    assert(CanonicalHash.of(Seq(Tuple1(Option(0.0))).toDF("v")) !=
      CanonicalHash.of(Seq(Tuple1(Option.empty[Double])).toDF("v")),
      "NULL must never alias 0.0")
  }

  test("row multiplicity counts; prefix encoding defeats boundary collisions") {
    val sp = spark
    import sp.implicits._
    assert(CanonicalHash.of(Seq("a", "a").toDF("s")) !=
      CanonicalHash.of(Seq("a").toDF("s")))
    // "ab"+"c" vs "a"+"bc" — identical concatenated bytes, different rows
    assert(CanonicalHash.of(Seq(("ab", "c")).toDF("x", "y")) !=
      CanonicalHash.of(Seq(("a", "bc")).toDF("x", "y")))
  }

  test("arrays, timestamps, dates, decimals, binary all hash deterministically") {
    val sp = spark
    import sp.implicits._
    val a = Seq((Seq(1.0, 2.0), java.sql.Timestamp.valueOf("2026-01-02 03:04:05.000006"),
      java.sql.Date.valueOf("2026-01-02"), BigDecimal("12.340"),
      Array[Byte](1, 2, 3))).toDF("arr", "ts", "d", "dec", "bin")
    val h1 = CanonicalHash.of(a)
    val h2 = CanonicalHash.of(a)
    assert(h1 == h2 && h1.length == 64)
    // trailing-zero scale is significant for decimals (toPlainString)
    val d1 = Seq(Tuple1(BigDecimal("12.34"))).toDF("dec")
    assert(CanonicalHash.of(d1) != h1)
  }

  test("the hash survives a parquet round trip (what Verify actually hashes)") {
    val a = df((1L, 1.5), (2L, -0.0), (3L, Double.NaN))
    val dir = java.nio.file.Files.createTempDirectory("canon").toString
    a.coalesce(1).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(CanonicalHash.of(back) == CanonicalHash.of(a),
      "parquet container bytes must not affect the value hash")
  }
}
