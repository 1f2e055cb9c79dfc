package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Canonical VALUE hash of a query result (r14 verdict "next" #1: after
  * three driver-side hash reds on `s03_stream_packing` whose graded
  * bytes were proven value- and order-exact against the oracle, the
  * engine must publish a hash of its own answer so the next divergence
  * is adjudicable hash-to-hash instead of a bare mismatch).
  *
  * Definition — deterministic by construction, independent of row
  * order, partitioning, and parquet container bytes:
  *
  *   hash = SHA-256( rowCount:8B-BE ++ sortedRows.map(r => len(r):4B-BE ++ r) )
  *
  * where each row encodes its columns IN COLUMN-NAME SORT ORDER (the
  * driver's compare sorts columns by name before hashing — mirrored
  * here so both hashes digest the same value sequence) and the encoded
  * rows sort as unsigned byte strings.
  *
  * Normalization rules (documented per the verdict ask):
  *  - NULL → single byte 0x00; present → 0x01 ++ value encoding
  *  - DOUBLE → 8-byte big-endian `Double.doubleToLongBits`: every NaN
  *    canonicalizes to 0x7ff8000000000000; −0.0 (0x8000000000000000)
  *    stays DISTINCT from +0.0 — bit-sensitive exactly like the
  *    driver's compare (see the signed-zero gotcha in the verify skill)
  *  - FLOAT → 4-byte `Float.floatToIntBits`, same NaN/−0.0 rules
  *  - BIGINT/INT/SMALLINT/TINYINT → fixed-width big-endian two's
  *    complement (8/4/4/4 bytes; sub-int types sign-extend to 4)
  *  - BOOLEAN → one byte 0x00/0x01
  *  - STRING → 4-byte length prefix ++ UTF-8 bytes
  *  - BINARY → 4-byte length prefix ++ raw bytes
  *  - DATE → 8-byte epoch day; TIMESTAMP / TIMESTAMP_NTZ → 8-byte
  *    epoch MICROseconds (NTZ interpreted at UTC)
  *  - DECIMAL → `toPlainString` as a length-prefixed UTF-8 string
  *    (scale-preserving, never scientific notation)
  *  - ARRAY → 4-byte element count ++ element encodings; STRUCT →
  *    field encodings in declared order (nested NULLs per the rule
  *    above)
  *
  * Row and string length prefixes make the encoding prefix-free, so no
  * two distinct row multisets can collide by boundary ambiguity.
  *
  * Scale note: this hashes VERIFY-GATE outputs (sf0.01, hundreds to a
  * few thousand rows per query) on the driver — it is forensic
  * instrumentation for the correctness gate, not a production operator.
  */
object CanonicalHash {

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }
  private def writeLong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeInt(out, (v >>> 32).toInt); writeInt(out, v.toInt)
  }
  private def writeStr(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8); writeInt(out, b.length); out.write(b, 0, b.length)
  }

  private def put(out: java.io.ByteArrayOutputStream, v: Any, dt: DataType): Unit = {
    if (v == null) { out.write(0); return }
    out.write(1)
    dt match {
      case DoubleType =>
        writeLong(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case FloatType =>
        writeInt(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
      case LongType    => writeLong(out, v.asInstanceOf[Long])
      case IntegerType => writeInt(out, v.asInstanceOf[Int])
      case ShortType   => writeInt(out, v.asInstanceOf[Short].toInt)
      case ByteType    => writeInt(out, v.asInstanceOf[Byte].toInt)
      case BooleanType => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case StringType  => writeStr(out, v.toString)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        writeInt(out, b.length); out.write(b, 0, b.length)
      case DateType => v match {
        case d: java.sql.Date       => writeLong(out, d.toLocalDate.toEpochDay)
        case d: java.time.LocalDate => writeLong(out, d.toEpochDay)
        case other => sys.error(s"canonical hash: date as ${other.getClass}")
      }
      case TimestampType | TimestampNTZType => v match {
        case t: java.sql.Timestamp =>
          writeLong(out, Math.floorDiv(t.getTime, 1000L) * 1000000L +
            t.getNanos / 1000L)
        case i: java.time.Instant =>
          writeLong(out, i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case l: java.time.LocalDateTime =>
          val i = l.toInstant(java.time.ZoneOffset.UTC)
          writeLong(out, i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case other => sys.error(s"canonical hash: timestamp as ${other.getClass}")
      }
      case _: DecimalType => v match {
        case d: java.math.BigDecimal => writeStr(out, d.toPlainString)
        case d: scala.math.BigDecimal => writeStr(out, d.bigDecimal.toPlainString)
        case other => sys.error(s"canonical hash: decimal as ${other.getClass}")
      }
      case ArrayType(et, _) =>
        val xs = v.asInstanceOf[scala.collection.Seq[Any]]
        writeInt(out, xs.size)
        xs.foreach(put(out, _, et))
      case StructType(fields) =>
        val r = v.asInstanceOf[Row]
        var i = 0
        while (i < fields.length) { put(out, r.get(i), fields(i).dataType); i += 1 }
      case other => sys.error(s"canonical hash: unsupported type $other")
    }
  }

  /** Encode one external-representation row over `cols` (pre-sorted
    * (index, dataType) pairs in column-name order). */
  private def rowBytes(r: Row, cols: Array[(Int, DataType)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(64)
    cols.foreach { case (i, dt) => put(out, r.get(i), dt) }
    out.toByteArray
  }

  /** Canonical hash of already-collected rows (hex SHA-256). */
  def ofRows(rows: Array[Row], schema: StructType): String = {
    val cols = schema.fields.zipWithIndex
      .sortBy(_._1.name).map { case (f, i) => (i, f.dataType) }
    val enc = rows.map(rowBytes(_, cols))
    java.util.Arrays.sort(enc, (a: Array[Byte], b: Array[Byte]) =>
      java.util.Arrays.compareUnsigned(a, b))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val cnt = new java.io.ByteArrayOutputStream(12)
    writeLong(cnt, rows.length.toLong)
    md.update(cnt.toByteArray)
    enc.foreach { e =>
      val len = new java.io.ByteArrayOutputStream(4)
      writeInt(len, e.length)
      md.update(len.toByteArray); md.update(e)
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Canonical hash of a DataFrame (collects — verify-gate scale only). */
  def of(df: DataFrame): String = ofRows(df.collect(), df.schema)
}
