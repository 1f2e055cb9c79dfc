package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Hdf5]] — byte-level format checks plus the distributed stack
  * round trip (reference `to_hdf5` / h5py ingest, `io/_store.py:331`). */
class Hdf5Spec extends AnyFunSuite {
  import TestSpark.spark

  test("h5Bytes -> datasets/parseData round-trips names, shapes, values") {
    val xs = Array.tabulate(37)(i => i * 1.5 - 3)
    val ys = Array.tabulate(12)(i => (i % 5).toDouble)
    val bytes = Hdf5.h5Bytes(Seq(("beta", xs, Seq(37L)), ("alpha", ys, Seq(3L, 4L))))
    val ds = Hdf5.datasets(bytes).sortBy(_.name)
    assert(ds.map(_.name) == Seq("alpha", "beta"))
    assert(ds(0).shape == Seq(3L, 4L) && ds(1).shape == Seq(37L))
    assert(ds.forall(_.dtype == "f8"))
    assert(Hdf5.parseData(bytes, ds(0)).toSeq == ys.toSeq)
    assert(Hdf5.parseData(bytes, ds(1)).toSeq == xs.toSeq)
  }

  test("format invariants: signature, superblock v0, EOF address") {
    val bytes = Hdf5.h5Bytes(Seq(("d", Array(1.0, 2.0), Seq(2L))))
    assert((bytes(0) & 0xff) == 0x89 && new String(bytes.slice(1, 4)) == "HDF")
    assert(bytes(8) == 0) // superblock version 0
    val eof = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .getLong(40)
    assert(eof == bytes.length.toLong, s"EOF address $eof != ${bytes.length}")
  }

  test("stack round trip: distributed write + header-manifest read") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-h5").toString
    val n = 1000L
    // sparse input (gaps must densify to zero in the written blocks)
    val el = s.range(n).selectExpr("id AS idx", "CAST(id * 3 % 17 AS DOUBLE) AS v")
      .where("idx % 7 <> 0")
    Hdf5.writeStack(el, dir, blockSize = 256, n = n)
    assert(new java.io.File(dir).listFiles.count(_.getName.endsWith(".h5")) == 4)
    val back = Hdf5.readStack(s, dir).orderBy("idx").collect()
    assert(back.length == n)
    back.foreach { r =>
      val idx = r.getLong(0)
      val want = if (idx % 7 == 0) 0.0 else (idx * 3 % 17).toDouble
      assert(r.getDouble(1) == want, s"idx $idx")
    }
  }

  test("chunked layout is rejected loudly, not silently misread") {
    val bytes = Hdf5.h5Bytes(Seq(("d", Array.tabulate(8)(_.toDouble), Seq(8L))))
    // locate the layout message (version 3, class 1) and flip the class
    // byte to 2 (chunked) — the reader must refuse with guidance
    var patched: Array[Byte] = null
    var i = 0
    while (patched == null && i < bytes.length - 1) {
      if (bytes(i) == 3 && bytes(i + 1) == 1 &&
          java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            .getLong(i + 2) > 0 && i > 200) {
        val c = bytes.clone(); c(i + 1) = 2; patched = c
      }
      i += 1
    }
    assert(patched != null, "layout message not found to patch")
    val e = intercept[IllegalArgumentException](Hdf5.datasets(patched))
    assert(e.getMessage.contains("chunked"))
  }
}
