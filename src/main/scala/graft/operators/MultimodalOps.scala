package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (builder mandate): treat media as opaque
  * binary columns + typed metadata structs. The decode step is a STUB —
  * no image/audio libraries exist in this container — but the Spark-side
  * plumbing is real: a typed Dataset boundary, per-partition batch
  * processing via mapPartitions (the Scala analogue of arrow-batched
  * mapInPandas), a deterministic fake decoder, and a struct-typed result
  * schema.
  *
  * 100 TB notes: mapPartitions keeps the decode batched per partition —
  * one decoder init per partition, not per row (the pattern a real
  * libjpeg/ffmpeg UDF needs); binary payloads stay columnar in parquet
  * and are never collected to the driver.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Input row at the typed boundary: id + opaque bytes. */
  case class MediaIn(doc_id: Long, payload: Array[Byte])

  /** Decoded metadata (the stub "decode" output). */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       frames: Int, format: String)

  /** Deterministic fake decoder — stands in for an image/video header
    * parse. Pure function of the payload bytes, so it is SQL-expressible
    * and oracle-checkable while exercising the real typed plumbing. */
  private val formats = Array("png", "jpeg", "webp")

  def decodeStub(in: MediaIn): MediaMeta = {
    val n = in.payload.length
    MediaMeta(in.doc_id, n,
      width = 64 + n % 512,
      height = 64 + (n * 7) % 512,
      frames = 1 + n % 30,
      format = formats(n % 3))
  }

  /** mm_decode_meta: documents.text → binary payload → per-partition
    * batched stub decode → flat metadata. */
  def mmDecodeMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
      .mapPartitions { rows =>
        // one "decoder" per partition (stub: nothing to init)
        rows.map(decodeStub)
      }
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "mm_decode_meta" -> (mmDecodeMeta _),
  )

  val oracles: Map[String, String] = Map(
    "mm_decode_meta" ->
      "SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width, CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS height, CAST(1 + octet_length(encode(text)) % 30 AS INTEGER) AS frames, CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format FROM documents ORDER BY doc_id",
  )
}
