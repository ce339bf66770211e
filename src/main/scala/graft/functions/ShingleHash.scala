package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Imperative kernel behind the native HashedShingles expression: all
  * n-word windows of a word array, each hashed to the engine's standard
  * 60-bit shingle id.
  *
  * BIT-PARITY CONTRACT (property-tested): element i equals the SQL
  * composition `cast(conv(substring(md5(cast(concat_ws(' ',
  * slice(ws, i+1, n)) as binary)), 1, 15), 16, 10) as bigint)` —
  * including concat_ws's skip-null semantics and the empty result for
  * documents shorter than n words. The first 15 hex chars of an md5 are
  * the digest's first 60 bits, i.e. (first 8 bytes big-endian) >>> 4.
  *
  * Why it exists: the SQL form is a higher-order `transform` lambda, and
  * Spark evaluates lambda bodies INTERPRETED (per window: a slice copy, a
  * concat_ws, a hex-string materialization, a substring copy, a conv
  * parse). This kernel runs the window loop over the words' UTF-8 bytes
  * directly — one MessageDigest update pass per window, no intermediate
  * strings — and is callable from whole-stage codegen as a static method.
  */
object ShingleHash {
  @transient private lazy val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** 64-bit SimHash over a token array — per-token md5, sign-sum sketch.
    * Bit-identical to the historical UDF form (same per-token hash: md5's
    * first 8 bytes big-endian; same bit-b vote and >0 threshold), but
    * reads the tokens' UTF-8 bytes straight off the unsafe ArrayData —
    * no Seq[String] conversion per row, callable from codegen. Null
    * tokens are skipped (split() never produces them; totality for
    * arbitrary callers). */
  def simhash64(toks: ArrayData): Long = {
    val digest = md5Local.get()
    val acc = new Array[Int](64)
    val len = toks.numElements()
    var i = 0
    while (i < len) {
      if (!toks.isNullAt(i)) {
        val md = digest.digest(toks.getUTF8String(i).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (md(b) & 0xffL); b += 1 }
        b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hashWindows(ws: ArrayData, n: Int): ArrayData = {
    val len = ws.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    // one UTF-8 byte slice per word, fetched once (windows overlap n-fold)
    val words = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      words(i) = if (ws.isNullAt(i)) null else ws.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](len - n + 1)
    val digest = md5Local.get()
    var s = 0
    while (s <= len - n) {
      digest.reset()
      var first = true
      var j = s
      while (j < s + n) {
        val w = words(j)
        if (w != null) { // concat_ws skips nulls AND their separators
          if (!first) digest.update(' '.toByte)
          digest.update(w)
          first = false
        }
        j += 1
      }
      val md = digest.digest() // also resets the digest
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (md(b) & 0xffL); b += 1 }
      out(s) = h >>> 4 // first 15 hex chars = top 60 bits, unsigned
      s += 1
    }
    new GenericArrayData(out)
  }
}
