package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `BINARY` payloads with typed
  * metadata, decoded/feature-extracted via batched `mapPartitions` over a
  * typed Dataset — the Spark-side pipeline a real image/audio corpus needs.
  *
  * The decode step is STUBBED with a deterministic fake (this container has
  * no media codecs): features are modular byte-bucket sums. Everything
  * around the stub is real and tested — the binary+metadata schema, the
  * typed Encoder boundary, partition-local batched iteration (no
  * per-element closure dispatch, batches of [[BATCH]]), and the fact that
  * the operator is a narrow per-partition map: at 100 TB this runs one
  * stage, no shuffle, each task decoding its partition's blobs.
  *
  * The fake decode is arithmetic over bytes, so the DuckDB oracle can
  * reproduce it from the source text (`payload = utf8(text)`).
  */
object MultimodalQueries {

  /** One media row: payload + typed metadata (the schema a real pipeline
    * would carry; kind/width/height/sampleRate are synthesized here). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            kind: String, width: Int, height: Int)
  final case class FeatRow(doc_id: Long, f0: Long, f1: Long, f2: Long, f3: Long,
                           f4: Long, f5: Long, f6: Long, f7: Long)
  final case class FrameRow(doc_id: Long, n_frames: Long, frame_sum: Long)

  private val BATCH = 32
  private val M = 997L

  /** documents → media table: binary payload + synthesized typed metadata. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet").selectExpr(
      "doc_id",
      "encode(text, 'UTF-8') AS payload",
      "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind",
      "CAST(32 + doc_id % 64 AS INT) AS width",
      "CAST(32 + doc_id % 48 AS INT) AS height")

  /** STUB decoder: 8 modular byte-bucket sums standing in for a real
    * feature extractor. Deterministic, byte-order dependent — the contract
    * a real `decode(payload): Array[Float]` would also satisfy. */
  private def fakeDecode(payload: Array[Byte]): Array[Long] = {
    val f = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += payload(i) & 0xffL
      i += 1
    }
    f.map(_ % M)
  }

  /** Batched partition-local feature extraction over the typed boundary. */
  def extractFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BATCH).flatMap { batch => // batch-shaped, like mapInPandas
          batch.iterator.map { case (id, payload) =>
            val f = fakeDecode(payload)
            FeatRow(id, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
          }
        }
      }.toDF()
  }

  /** Frame sampling: every 16th byte is a "frame"; per-doc frame count +
    * modular frame checksum — the video-path shape (sample, then reduce). */
  def sampleFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          var sum = 0L; var n = 0L; var i = 0
          while (i < payload.length) { sum += payload(i) & 0xffL; n += 1; i += 16 }
          FrameRow(id, n, sum % M)
        }
      }.toDF()
  }

  final case class ResizeRow(doc_id: Long, p0: Long, p1: Long, p2: Long, p3: Long,
                             p4: Long, p5: Long, p6: Long, p7: Long)

  /** Resize: nearest-neighbor downsample of the decoded payload to a fixed
    * 8-wide grid — the image-resize kernel shape (pure index remap per
    * element, batched partition-local, no shuffle). Source position for
    * output cell k is `floor(k * len / 8)`. */
  def resizeTo8(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BATCH).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val n = payload.length
            val p = Array.tabulate(8) { k =>
              if (n == 0) 0L else payload((k * n / 8).toInt) & 0xffL
            }
            ResizeRow(id, p(0), p(1), p(2), p(3), p(4), p(5), p(6), p(7))
          }
        }
      }.toDF()
  }

  final case class WinRow(doc_id: Long, win: Long, energy: Long)

  /** Audio-framing shape: payload bytes as samples, fixed 64-sample
    * windows, per-window energy (modular sum of squares) — decode →
    * frame → per-frame feature in ONE narrow pass; frames emit grouped
    * with their source row, no shuffle, fan-out bounded by payload/64. */
  def windowEnergy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          payload.grouped(64).zipWithIndex.map { case (w, k) =>
            var e = 0L; var i = 0
            while (i < w.length) { val b = w(i) & 0xffL; e += b * b; i += 1 }
            WinRow(id, k.toLong, e % M)
          }
        }
      }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // audio-path framing: per-window energy over the sample stream
    "mm05_window_energy" -> ((s, d) =>
      windowEnergy(s, d).where("doc_id < 30").orderBy("doc_id", "win")),

    "mm01_features" -> ((s, d) =>
      extractFeatures(s, d).where("doc_id < 100").orderBy("doc_id")),

    // resize plumbing: fixed-grid nearest-neighbor sampling per payload
    "mm04_resize" -> ((s, d) =>
      resizeTo8(s, d).where("doc_id < 100").orderBy("doc_id")),

    "mm02_frame_sample" -> ((s, d) =>
      sampleFrames(s, d).where("doc_id < 100").orderBy("doc_id")),

    // metadata-typed aggregation over the media table (pure relational)
    "mm03_media_stats" -> ((s, d) =>
      mediaTable(s, d).groupBy("kind")
        .agg(expr("CAST(count(*) AS BIGINT)").as("n"),
          expr("CAST(sum(length(payload)) AS BIGINT)").as("bytes"),
          expr("CAST(sum(width * height) AS BIGINT)").as("pixels"))
        .orderBy("kind")),
  )

  private def duckFeat(k: Int): String =
    s"""(CAST(list_sum([CASE WHEN (i - 1) % 8 = $k THEN ascii(substring(text, i, 1)) ELSE 0 END
        for i in generate_series(1, length(text))]) AS BIGINT) % $M)"""

  val oracles: Map[String, String] = Map(
    "mm05_window_energy" ->
      s"""WITH w AS (
            SELECT doc_id, text,
              unnest(generate_series(0, (length(text) - 1) // 64)) AS win
            FROM documents WHERE doc_id < 30)
          SELECT doc_id, win,
            CAST(list_sum([ascii(substring(text, i, 1)) * ascii(substring(text, i, 1))
              for i in generate_series(win * 64 + 1, least((win + 1) * 64, length(text)))]) AS BIGINT) % $M AS energy
          FROM w ORDER BY doc_id, win""",

    "mm04_resize" ->
      s"""SELECT doc_id,
          ${(0 until 8).map(k =>
            s"CAST(ascii(substring(text, ($k * length(text)) // 8 + 1, 1)) AS BIGINT) AS p$k")
            .mkString(", ")}
          FROM documents WHERE doc_id < 100 ORDER BY doc_id""",

    "mm01_features" ->
      s"""SELECT doc_id, ${(0 until 8).map(k => s"${duckFeat(k)} AS f$k").mkString(", ")}
          FROM documents WHERE doc_id < 100 ORDER BY doc_id""",

    "mm02_frame_sample" ->
      s"""SELECT doc_id,
          CAST((length(text) + 15) // 16 AS BIGINT) AS n_frames,
          CAST(list_sum([ascii(substring(text, i, 1))
            for i in generate_series(1, length(text), 16)]) AS BIGINT) % $M AS frame_sum
          FROM documents WHERE doc_id < 100 ORDER BY doc_id""",

    "mm03_media_stats" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(length(text)) AS BIGINT) AS bytes,
         CAST(sum((32 + doc_id % 64) * (32 + doc_id % 48)) AS BIGINT) AS pixels
         FROM documents GROUP BY 1 ORDER BY kind""",
  )
}
