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

  /** THE media input projection — one copy for all five mm_* ops, so a
    * payload-derivation change (e.g. a real media column replacing the
    * text stand-in) cannot silently reach only some of them. */
  private def mediaIn(s: SparkSession, d: String): org.apache.spark.sql.Dataset[MediaIn] = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaIn]
  }

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
    mediaIn(s, d)
      .mapPartitions { rows =>
        // one "decoder" per partition (stub: nothing to init)
        rows.map(decodeStub)
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Resized metadata (the stub "resize" output): cap the long edge at
    * 256, preserve aspect ratio with pure integer arithmetic. */
  case class MediaResized(doc_id: Long, width: Int, height: Int,
                          out_w: Int, out_h: Int, out_bytes: Long)

  def resizeStub(m: MediaMeta): MediaResized = {
    // cap the LONG edge (the earlier width-only cap let portrait inputs
    // exceed 256 on the height, contradicting this scaladoc); all
    // arithmetic stays integer-floor so the oracle mirrors it exactly
    val longEdge = math.max(m.width, m.height)
    val (outW, outH) =
      if (longEdge <= 256) (m.width, m.height)
      else ((m.width.toLong * 256 / longEdge).toInt,
        (m.height.toLong * 256 / longEdge).toInt)
    MediaResized(m.doc_id, m.width, m.height, outW, outH, outW.toLong * outH * 3L)
  }

  /** mm_resize_stub: decode → resize as two typed mapPartitions stages —
    * the shape of a real thumbnailing pipeline (decoder and scaler
    * initialized once per partition, rows streamed through both). */
  def mmResizeStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaIn(s, d)
      .mapPartitions(_.map(decodeStub))
      .mapPartitions(_.map(resizeStub))
      .toDF()
      .orderBy("doc_id")
  }

  /** Feature vector stub: 4 floats derived from the payload's md5 — the
    * per-partition "embedding model" shape. Each feature is a 32-bit
    * integer over 2^32, an exact dyadic rational, so no rounding is
    * needed for the oracle. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int,
                           f0: Double, f1: Double, f2: Double, f3: Double)

  def mmFeatureExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaIn(s, d)
      .mapPartitions { rows =>
        // one digest instance per partition, reset per row by digest()
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { in =>
          val hex = md.digest(in.payload).map("%02x".format(_)).mkString
          def f(i: Int): Double =
            java.lang.Long.parseLong(hex.substring(i * 8, i * 8 + 8), 16).toDouble / 4294967296.0
          MediaFeatures(in.doc_id, in.payload.length, f(0), f(1), f(2), f(3))
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** mm_frame_sample: every 5th frame of each "video" payload, with a
    * 25 fps timestamp and a per-frame content fingerprint. Generator op:
    * one row per sampled frame. */
  def mmFrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaIn(s, d)
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .select(col("doc_id"), explode(expr("sequence(0, frames - 1, 5)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * 40).as("t_ms"),
        md5(concat_ws(":", col("doc_id"), col("frame_idx")).cast("binary")).as("frame_fp"))
      .orderBy("doc_id", "frame_idx")
  }

  /** mm_binary_source: the media-ingest path — write the corpus as raw
    * files, re-ingest them via the binaryFile data source (path + opaque
    * content bytes). Graded on order-free byte totals: Σ(bytes) over the
    * ingested files equals Σ(octet_length(text) + 1 newline) over docs. */
  def mmBinarySource(s: SparkSession, d: String): DataFrame = {
    val tmp = graft.TempDirs.cached("bin", d) { dir =>
      Tables.load(s, d, "documents").select("text").write.mode("overwrite").text(dir)
    }
    s.read.format("binaryFile").option("pathGlobFilter", "part-*").load(tmp)
      .agg(sum(length(col("content"))).as("total_bytes"))
  }

  /** Stub-decoded 8×8 luminance grid: cell i accumulates the payload
    * bytes at positions ≡ i (mod 64) — a deterministic stand-in for a
    * downscaled grayscale image that preserves content locality (similar
    * payloads → similar grids), which is exactly what average-hash
    * needs. Real decode would land in the same per-partition stage. */
  case class MediaSketch(doc_id: Long, sh64: Long)

  /** Grid + threshold in ONE typed pass: building the 64-cell grid and
    * immediately folding it to the aHash bits keeps the whole sketch
    * inside this mapPartitions stage — the first draft carried the grid
    * as an array column and folded it with an `aggregate(sequence(0,63),
    * ...)` higher-order function, which is interpreted (CodegenFallback)
    * and re-walked 64 elements per row: 4.05 s at sf0.1, the slowest key
    * in the registry; this form is one arithmetic pass per payload byte. */
  def ahashSketch(in: MediaIn): MediaSketch = {
    val cells = new Array[Long](64)
    var p = 0
    while (p < in.payload.length) {
      cells(p % 64) += (in.payload(p) & 0xffL); p += 1
    }
    var total = 0L
    var i = 0
    while (i < 64) { total += cells(i); i += 1 }
    var sh = 0L
    i = 0
    while (i < 64) {
      if (cells(i) * 64 > total) sh |= 1L << i
      i += 1
    }
    MediaSketch(in.doc_id, sh)
  }

  /** Quantized DCT-II basis for the pHash sketch: T(u,r) =
    * floor(1e4·cos(π·(2r+1)·u/32) + 0.5), u ∈ [0,8), r ∈ [0,16).
    * Computed ONCE here and inlined into the DuckDB oracle as literal
    * VALUES — neither engine evaluates cos() at query time, so there is
    * no cross-engine libm surface at all; every downstream coefficient
    * is exact int64 arithmetic (|coef| ≤ 16·1e4·(16·765·1e4) ≈ 2e13). */
  private[graft] val DctT: Array[Array[Long]] = Array.tabulate(8, 16) { (u, r) =>
    math.floor(1e4 * math.cos(math.Pi * (2 * r + 1) * u / 32.0) + 0.5).toLong
  }

  /** pHash sketch row: 64-bit hash as a '0'/'1' bitstring (bit 63 first —
    * the SimHash-oracle representation trick) + its popcount. */
  case class MediaPhash(doc_id: Long, ph_bits: String, n_ones: Int)

  /** DCT perceptual hash of one payload: fold bytes into a 16×16 grid
    * (byte p → cell p mod 256, the aHash folding at 4× resolution), take
    * the top-left 8×8 of the unnormalized 2D DCT-II, threshold each
    * coefficient against the coefficient median — the classic pHash
    * recipe (aHash thresholds raw cells on the mean; pHash thresholds
    * FREQUENCY components on the median, which survives brightness and
    * local-noise edits that flip aHash bits). Median is carried as
    * med2 = a₍₃₁₎+a₍₃₂₎ so the bit test 2·coef > med2 stays in exact
    * integers. One arithmetic pass per payload byte plus a fixed
    * 128-multiply-per-cell DCT — O(bytes) per row, map-only. */
  def phashSketch(in: MediaIn): MediaPhash = {
    val g = new Array[Long](256)
    var p = 0
    while (p < in.payload.length) { g(p % 256) += (in.payload(p) & 0xffL); p += 1 }
    // row pass: part(r)(v) = Σ_c g(r,c)·T(v,c), then column pass on top
    val part = Array.ofDim[Long](16, 8)
    var r = 0
    while (r < 16) {
      var v = 0
      while (v < 8) {
        var sum = 0L; var c = 0
        while (c < 16) { sum += g(r * 16 + c) * DctT(v)(c); c += 1 }
        part(r)(v) = sum; v += 1
      }
      r += 1
    }
    val coef = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0L; var rr = 0
        while (rr < 16) { sum += DctT(u)(rr) * part(rr)(v); rr += 1 }
        coef(u * 8 + v) = sum; v += 1
      }
      u += 1
    }
    val sorted = coef.sorted
    val med2 = sorted(31) + sorted(32)
    val sb = new java.lang.StringBuilder(64)
    var i = 63
    while (i >= 0) { sb.append(if (2 * coef(i) > med2) '1' else '0'); i -= 1 }
    val bits = sb.toString
    MediaPhash(in.doc_id, bits, bits.count(_ == '1'))
  }

  /** mm_phash_dct: the DCT perceptual hash per document — the industry-
    * standard pHash next to [[mmAhashDedup]]'s average-hash (same opaque-
    * payload plumbing, same per-partition batch stage a real decoder
    * would occupy; the downstream banded-LSH pair join is shared with
    * the aHash/SimHash family, so this key grades the HASH itself). */
  def mmPhashDct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaIn(s, d)
      .mapPartitions(_.map(phashSketch))
      .toDF()
      .orderBy("doc_id")
  }

  /** mm_ahash_dedup: perceptual near-dup detection for media columns —
    * the image-side analogue of SimHash dedup. Average-hash over the
    * stub-decoded grid (bit i set iff cell i is strictly above the grid
    * mean, integer-exact as 64·cellᵢ > Σcells), then the SAME banded
    * 4×16 LSH + exact-Hamming verify as the text SimHash family
    * ([[LlmTextOps.simhashBandedPairs]]): at 100 TB the band key is the
    * shuffle key and candidate generation never goes all-pairs. */
  def mmAhashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sketched = mediaIn(s, d)
      .mapPartitions(_.map(ahashSketch))
      .toDF()
    LlmTextOps.simhashBandedPairs(sketched, maxHamming = 8)
      .orderBy("a_id", "b_id")
  }

  val queries: Map[String, Q] = Map(
    "mm_decode_meta" -> (mmDecodeMeta _),
    "mm_binary_source" -> (mmBinarySource _),
    "mm_resize_stub" -> (mmResizeStub _),
    "mm_feature_extract" -> (mmFeatureExtract _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_ahash_dedup" -> (mmAhashDedup _),
    "mm_phash_dct" -> (mmPhashDct _),
  )

  private val nBytes = "octet_length(encode(text))"

  val oracles: Map[String, String] = Map(
    "mm_binary_source" ->
      s"SELECT CAST(sum($nBytes + 1) AS BIGINT) AS total_bytes FROM documents",
    "mm_decode_meta" ->
      s"SELECT doc_id, CAST($nBytes AS INTEGER) AS n_bytes, CAST(64 + $nBytes % 512 AS INTEGER) AS width, CAST(64 + ($nBytes * 7) % 512 AS INTEGER) AS height, CAST(1 + $nBytes % 30 AS INTEGER) AS frames, CASE $nBytes % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format FROM documents ORDER BY doc_id",
    "mm_resize_stub" ->
      (s"WITH m AS (SELECT doc_id, 64 + $nBytes % 512 AS width, 64 + ($nBytes * 7) % 512 AS height FROM documents), " +
        "r AS (SELECT doc_id, width, height, " +
        "CASE WHEN greatest(width, height) <= 256 THEN width ELSE (width * 256) // greatest(width, height) END AS out_w, " +
        "CASE WHEN greatest(width, height) <= 256 THEN height ELSE (height * 256) // greatest(width, height) END AS out_h FROM m) " +
        "SELECT doc_id, CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height, CAST(out_w AS INTEGER) AS out_w, CAST(out_h AS INTEGER) AS out_h, CAST(out_w * out_h * 3 AS BIGINT) AS out_bytes FROM r ORDER BY doc_id"),
    "mm_feature_extract" ->
      (s"SELECT doc_id, CAST($nBytes AS INTEGER) AS n_bytes, " +
        "CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) / 4294967296.0 AS f0, " +
        "CAST('0x' || substr(md5(text), 9, 8) AS BIGINT) / 4294967296.0 AS f1, " +
        "CAST('0x' || substr(md5(text), 17, 8) AS BIGINT) / 4294967296.0 AS f2, " +
        "CAST('0x' || substr(md5(text), 25, 8) AS BIGINT) / 4294967296.0 AS f3 " +
        "FROM documents ORDER BY doc_id"),
    "mm_frame_sample" ->
      (s"WITH m AS (SELECT doc_id, 1 + $nBytes % 30 AS frames FROM documents), " +
        "fr AS (SELECT doc_id, unnest(generate_series(0, frames - 1, 5)) AS frame_idx FROM m) " +
        "SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx, CAST(frame_idx * 40 AS INTEGER) AS t_ms, md5(concat_ws(':', doc_id, frame_idx)) AS frame_fp FROM fr ORDER BY doc_id, frame_idx"),
    "mm_ahash_dedup" -> ahashDedupOracle,
    "mm_phash_dct" -> phashOracle,
  )

  /** DuckDB twin of the pHash: the [[DctT]] table rides in as literal
    * VALUES (no cos() in either engine), the grid is reconstructed from
    * text codepoints (ASCII canary, as in [[ahashDedupOracle]]), and the
    * two DCT passes are integer join+group-by sums. med2 = a₍₃₁₎+a₍₃₂₎
    * of the per-doc coefficient sort, so the bit test is exact. */
  private def phashOracle: String = {
    val values = (for (u <- 0 until 8; r <- 0 until 16)
      yield s"($u, $r, ${DctT(u)(r)})").mkString(", ")
    s"WITH ct(u, r, t) AS (VALUES $values), " +
      "cellv AS (SELECT doc_id, (p - 1) % 256 AS cell, unicode(substr(text, CAST(p AS INTEGER), 1)) AS v " +
      "FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS p FROM documents)), " +
      "cellsums AS (SELECT doc_id, cell, CAST(sum(v) AS BIGINT) AS g FROM cellv GROUP BY 1, 2), " +
      "grid AS (SELECT d.doc_id, gc.cell, coalesce(cs.g, 0) AS g " +
      "FROM (SELECT doc_id FROM documents) d " +
      "CROSS JOIN (SELECT unnest(range(0, 256)) AS cell) gc " +
      "LEFT JOIN cellsums cs ON cs.doc_id = d.doc_id AND cs.cell = gc.cell), " +
      "part AS (SELECT doc_id, cell // 16 AS r, tv.u AS v, CAST(sum(g * tv.t) AS BIGINT) AS pv " +
      "FROM grid JOIN ct tv ON tv.r = cell % 16 GROUP BY 1, 2, 3), " +
      "coef AS (SELECT doc_id, tu.u AS u, part.v AS v, CAST(sum(tu.t * pv) AS BIGINT) AS cf " +
      "FROM part JOIN ct tu ON tu.r = part.r GROUP BY 1, 2, 3), " +
      "med AS (SELECT doc_id, CAST(sum(cf) AS BIGINT) AS med2 FROM " +
      "(SELECT doc_id, cf, row_number() OVER (PARTITION BY doc_id ORDER BY cf) AS rn FROM coef) " +
      "WHERE rn IN (32, 33) GROUP BY doc_id), " +
      "bits AS (SELECT c.doc_id, string_agg(CASE WHEN 2 * cf > med2 THEN '1' ELSE '0' END, '' ORDER BY u * 8 + v DESC) AS ph_bits " +
      "FROM coef c JOIN med USING (doc_id) GROUP BY c.doc_id) " +
      "SELECT doc_id, ph_bits, CAST(length(replace(ph_bits, '0', '')) AS INTEGER) AS n_ones " +
      "FROM bits ORDER BY doc_id"
  }

  /** DuckDB twin of the aHash near-dup. The grid is reconstructed from
    * the text codepoints (fixture payloads are ASCII, so byte ≡
    * codepoint; FixtureSchemaCanarySpec would catch a fixture drift),
    * with absent cells (texts shorter than 64 chars) zero-filled. The
    * sketch is carried as a 64-char '0'/'1' string — the same
    * representation trick as the SimHash pairs oracle — so banding is a
    * substring and Hamming a character compare; band b of Spark's
    * `(sh64 >> 16b) & 0xffff` is `substr(s, 49 - 16b, 16)`. */
  private def ahashDedupOracle: String = {
    val ham = "CAST(list_sum(list_transform(range(1,65), i -> " +
      "CASE WHEN substr(a_s, CAST(i AS INTEGER), 1) = substr(b_s, CAST(i AS INTEGER), 1) THEN 0 ELSE 1 END)) AS INTEGER)"
    "WITH cellv AS (SELECT doc_id, (p - 1) % 64 AS cell, unicode(substr(text, CAST(p AS INTEGER), 1)) AS v " +
      "FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS p FROM documents)), " +
      "cellsums AS (SELECT doc_id, cell, sum(v) AS cv FROM cellv GROUP BY 1, 2), " +
      "grid AS (SELECT d.doc_id, g.cell, coalesce(cs.cv, 0) AS cv " +
      "FROM (SELECT doc_id FROM documents) d " +
      "CROSS JOIN (SELECT unnest(range(0, 64)) AS cell) g " +
      "LEFT JOIN cellsums cs ON cs.doc_id = d.doc_id AND cs.cell = g.cell), " +
      "tot AS (SELECT doc_id, sum(cv) AS total FROM grid GROUP BY 1), " +
      "sk AS (SELECT g.doc_id, string_agg(CASE WHEN cv * 64 > total THEN '1' ELSE '0' END, '' ORDER BY cell DESC) AS s " +
      "FROM grid g JOIN tot USING (doc_id) GROUP BY g.doc_id), " +
      "bands AS (SELECT doc_id, s, b, substr(s, 49 - 16*CAST(b AS INTEGER), 16) AS key " +
      "FROM sk CROSS JOIN (SELECT unnest(range(0,4)) AS b)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id, a.s AS a_s, b.s AS b_s " +
      "FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id) " +
      s"SELECT a_id, b_id, hamming FROM (SELECT a_id, b_id, $ham AS hamming FROM cand) " +
      "WHERE hamming <= 8 ORDER BY a_id, b_id"
  }
}
