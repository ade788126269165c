package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** REAL decoders for two public trivial media formats — binary PPM (P6,
  * netpbm) and PCM WAV (RIFF) — as native Catalyst expressions.
  *
  * This replaces the round-2 decode STUB (the container has no image/
  * audio codec libraries, but PPM and WAV need none: both are plain
  * header + payload formats with public specs). The expressions parse
  * actual bytes — magic, whitespace/comment-tolerant PPM headers,
  * little-endian RIFF chunk walks — and emit integer digests (dims,
  * per-channel byte sums) that the DuckDB oracle re-derives from the
  * fixtures' closed-form pixel generator, so the decode path sits under
  * the hash gate like any relational operator.
  *
  * Codegen: each expression stays inside whole-stage codegen by emitting
  * a call to a static decode method (the `StaticInvoke` pattern Spark's
  * own object expressions use) — no iterator boundary, no Dataset
  * serialization, null-safe on malformed input. At 100 TB the decode
  * stage is a narrow map over binary columns; bytes never become a
  * join/shuffle key.
  */
object MediaCodecs {

  // ---------- PPM (P6) ----------

  /** Parse one P6 header at `off`: returns (width, height, payloadStart)
    * or null. Whitespace- and comment-tolerant per the netpbm spec
    * (`#` to end-of-line inside the header), maxval must be 255 (the
    * 1-byte-per-sample variant), header ends with exactly one
    * whitespace byte before the payload.
    */
  private def parsePpmHeader(b: Array[Byte], off: Int): Array[Int] = {
    var i = off
    def eof = i >= b.length
    if (i + 2 > b.length || b(i) != 'P' || b(i + 1) != '6') return null
    i += 2
    def skipWs(): Boolean = { // whitespace and # comments; false if none
      var any = false
      var go = true
      while (go && !eof) {
        val c = b(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') { i += 1; any = true }
        else if (c == '#') { while (!eof && b(i) != '\n') i += 1; any = true }
        else go = false
      }
      any
    }
    def readInt(): Int = {
      if (eof || b(i) < '0' || b(i) > '9') return -1
      var v = 0L
      while (!eof && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
        if (v > Int.MaxValue) return -1 // overflow-proof: reject, don't wrap
      }
      v.toInt
    }
    if (!skipWs()) return null
    val w = readInt(); if (w <= 0) return null
    if (!skipWs()) return null
    val h = readInt(); if (h <= 0) return null
    if (!skipWs()) return null
    val maxval = readInt(); if (maxval != 255) return null
    if (eof) return null
    val c = b(i)
    if (c != ' ' && c != '\t' && c != '\n' && c != '\r') return null
    i += 1 // exactly ONE whitespace byte separates header from payload
    // payload bound in LONG arithmetic: a corrupt header declaring huge
    // dims must return null, not wrap Int and index out of bounds
    if (i.toLong + w.toLong * h.toLong * 3L > b.length.toLong) return null
    Array(w, h, i)
  }

  /** Decode one P6 image → (w, h, sum_r, sum_g, sum_b) or null. */
  def decodePpm(bytes: Array[Byte]): InternalRow = {
    val hd = parsePpmHeader(bytes, 0)
    if (hd == null) return null
    val Array(w, h, p) = hd
    var sr = 0L; var sg = 0L; var sb = 0L
    val n = w * h
    var k = 0
    while (k < n) {
      val j = p + k * 3
      sr += bytes(j) & 0xff; sg += bytes(j + 1) & 0xff; sb += bytes(j + 2) & 0xff
      k += 1
    }
    new GenericInternalRow(Array[Any](w, h, sr, sg, sb))
  }

  /** Decode a concatenated-P6 stream ("raw video": successive frames) →
    * array of (frame_idx, w, h, rgb_sum), or null if byte 0 isn't a
    * valid frame. Trailing garbage after the last whole frame is
    * ignored (a real demuxer stops at the first unparseable block).
    */
  def decodePpmFrames(bytes: Array[Byte]): ArrayData = {
    var off = 0
    var idx = 0
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var hd = parsePpmHeader(bytes, off)
    if (hd == null) return null
    while (hd != null) {
      val Array(w, h, p) = hd
      var s = 0L
      val len = w * h * 3
      var j = p
      val end = p + len
      while (j < end) { s += bytes(j) & 0xff; j += 1 }
      out += new GenericInternalRow(Array[Any](idx, w, h, s))
      idx += 1
      off = end
      hd = if (off >= bytes.length) null else parsePpmHeader(bytes, off)
    }
    new GenericArrayData(out.toArray)
  }

  /** REAL 2× nearest-neighbor downsample: decode, sample
    * out(x,y,c) = in(2x, 2y, c), re-encode as P6. Null on malformed
    * input or when either output dimension would hit zero.
    */
  def resizePpmHalf(bytes: Array[Byte]): Array[Byte] = {
    val hd = parsePpmHeader(bytes, 0)
    if (hd == null) return null
    val Array(w, h, p) = hd
    val w2 = w / 2; val h2 = h / 2
    if (w2 == 0 || h2 == 0) return null
    val header = s"P6\n$w2 $h2\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w2 * h2 * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = p + ((2 * y) * w + 2 * x) * 3
        val dst = header.length + (y * w2 + x) * 3
        out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Difference-hash (dHash) of one P6 image: decode, average-pool the
    * (r+g+b) luma onto a 9×8 grid (cell (gx, gy) covers pixels with
    * x·9/w = gx, y·8/h = gy — every cell non-empty for w ≥ 9, h ≥ 8),
    * then one bit per horizontally-adjacent cell pair, row-major MSB
    * first: bit = avg(gx) > avg(gx+1), compared CROSS-MULTIPLIED
    * (sumA·cntB > sumB·cntA) so the whole hash is exact integer
    * arithmetic — no float average, no cross-engine rounding. 8 rows ×
    * 8 comparisons = a 64-bit fingerprint; null on malformed input or
    * images smaller than the grid.
    */
  def decodePpmDhash(bytes: Array[Byte]): java.lang.Long = {
    val hd = parsePpmHeader(bytes, 0)
    if (hd == null) return null
    val Array(w, h, p) = hd
    val gxN = 9; val gyN = 8
    if (w < gxN || h < gyN) return null
    val s = Array.ofDim[Long](gyN, gxN)
    val c = Array.ofDim[Long](gyN, gxN)
    var y = 0
    while (y < h) {
      val gy = y * gyN / h
      var x = 0
      while (x < w) {
        val gx = x * gxN / w
        val j = p + (y * w + x) * 3
        s(gy)(gx) += (bytes(j) & 0xff) + (bytes(j + 1) & 0xff) + (bytes(j + 2) & 0xff)
        c(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var gy = 0
    while (gy < gyN) {
      var gx = 0
      while (gx < gxN - 1) {
        bits = (bits << 1) |
          (if (s(gy)(gx) * c(gy)(gx + 1) > s(gy)(gx + 1) * c(gy)(gx)) 1L else 0L)
        gx += 1
      }
      gy += 1
    }
    java.lang.Long.valueOf(bits)
  }

  /** Per-frame payload hashes of a concatenated-P6 video stream — the
    * frame-granular companion of [[decodePpmVhash]]: one polynomial
    * rolling hash per demuxed frame (h = (h·131 + byte) mod 2³¹−1 over
    * the frame's pixel payload, header excluded), frame order
    * preserved. This is the EXACT-frame identity a subsequence
    * containment pass joins on (`dedup_vhash_contain`): two frames
    * share a hash iff their payload bytes agree (modulo the documented
    * 2³¹ collision budget — the digest discipline of every hash-keyed
    * dedup here). Accumulator stays < 2³¹ so the fold never overflows
    * a Long. Null if byte 0 isn't a valid frame.
    */
  def decodePpmFrameHashes(bytes: Array[Byte]): ArrayData = {
    val P = 2147483647L
    val B = 131L
    var hd = parsePpmHeader(bytes, 0)
    if (hd == null) return null
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    while (hd != null) {
      val Array(w, h, p) = hd
      val len = w * h * 3
      var acc = 0L
      var j = p
      val end = p + len
      while (j < end) { acc = (acc * B + (bytes(j) & 0xff)) % P; j += 1 }
      out += acc
      hd = if (end >= bytes.length) null else parsePpmHeader(bytes, end)
    }
    new GenericArrayData(out.toArray)
  }

  /** Temporal fingerprint (vHash) of a concatenated-P6 video stream —
    * the frame-SEQUENCE member of the perceptual-hash family
    * (dHash = one image, aHash = one waveform, this = one clip):
    * demux the frames with the same header walk as
    * [[decodePpmFrames]], flatten them IN FRAME ORDER into one luma
    * signal l[j] = r+g+b of the clip's j-th pixel, and fingerprint
    * that signal with the identical lag-band energy kernel as
    * [[decodeWavAhash]] (9 time windows × lags 1..8, cross-multiplied
    * window comparisons, 64 bits k-major MSB-first). Lag diffs cross
    * frame boundaries, so the hash is ORDER-SENSITIVE — reordering or
    * dropping frames moves bits, which is exactly what separates a
    * clip fingerprint from a bag-of-frame-hashes. All-integer
    * arithmetic (exact [[cmpProd]] comparison), LONG window index —
    * the hardened decodeWavAhash contract. Null when byte 0 isn't a
    * valid frame or the clip holds fewer than 81 pixels (the last
    * window must still own a full lag-8 pair).
    */
  def decodePpmVhash(bytes: Array[Byte]): java.lang.Long = {
    var hd = parsePpmHeader(bytes, 0)
    if (hd == null) return null
    val luma = new scala.collection.mutable.ArrayBuilder.ofInt
    while (hd != null) {
      val Array(w, h, p) = hd
      val np = w * h
      var k = 0
      while (k < np) {
        val j = p + k * 3
        luma += (bytes(j) & 0xff) + (bytes(j + 1) & 0xff) + (bytes(j + 2) & 0xff)
        k += 1
      }
      val off = p + np * 3
      hd = if (off >= bytes.length) null else parsePpmHeader(bytes, off)
    }
    val l = luma.result()
    val n = l.length
    if (n < 81) return null
    val e = Array.ofDim[Long](9, 8)
    val c = Array.ofDim[Long](9, 8)
    var k = 1
    while (k <= 8) {
      var j = 0
      val jEnd = n - k
      while (j < jEnd) {
        val t = (j.toLong * 9L / n).toInt
        e(t)(k - 1) += (l(j + k) - l(j)).abs
        c(t)(k - 1) += 1
        j += 1
      }
      k += 1
    }
    var fp = 0L
    k = 1
    while (k <= 8) {
      var t = 0
      while (t < 8) {
        fp = (fp << 1) |
          (if (cmpProd(e(t)(k - 1), c(t + 1)(k - 1),
                       e(t + 1)(k - 1), c(t)(k - 1)) > 0) 1L
           else 0L)
        t += 1
      }
      k += 1
    }
    java.lang.Long.valueOf(fp)
  }

  // ---------- WAV (RIFF / PCM) ----------

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    i + 4 <= b.length && b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)

  /** Decode a PCM WAV → (sample_rate, bits, n_samples, sum_samples) or
    * null. Walks the RIFF chunk list (fmt before data, unknown chunks
    * skipped — real files carry LIST/INFO etc.), 8-bit mono PCM
    * payload summed as unsigned bytes.
    */
  def decodeWav(bytes: Array[Byte]): InternalRow = {
    if (!tag(bytes, 0, "RIFF") || bytes.length < 12 || !tag(bytes, 8, "WAVE")) return null
    var i = 12
    var rate = -1; var bits = -1; var channels = -1
    while (i + 8 <= bytes.length) {
      val sz = le32(bytes, i + 4)
      // LONG bound: a declared chunk size near Int.MaxValue must not wrap
      // the cursor arithmetic negative
      if (sz < 0 || i.toLong + 8L + sz.toLong > bytes.length.toLong) return null
      if (tag(bytes, i, "fmt ")) {
        if (sz < 16 || le16(bytes, i + 8) != 1) return null // PCM only
        channels = le16(bytes, i + 10)
        rate = le32(bytes, i + 12)
        bits = le16(bytes, i + 22)
      } else if (tag(bytes, i, "data")) {
        if (rate < 0 || bits != 8 || channels != 1) return null
        var s = 0L
        var j = i + 8
        val end = j + sz
        while (j < end) { s += bytes(j) & 0xff; j += 1 }
        return new GenericInternalRow(Array[Any](rate, bits, sz, s))
      }
      i += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
    }
    null
  }

  /** Acoustic fingerprint (aHash) of one 8-bit mono PCM WAV — the
    * chromaprint-style integer band-energy hash that completes the
    * multimodal dedup ladder (dHash's audio twin). The waveform splits
    * into 9 equal-ish time windows (window of sample j = j·9/n, the
    * dHash cell rule); per window and per lag k ∈ 1..8 the "band
    * energy" e(t,k) = Σ |s[j+k] − s[j]| over pairs starting in the
    * window (lag-k difference energy — a zero-FFT integer proxy for
    * the k-th frequency band: small lags pick up high-frequency
    * content, large lags low). One bit per time-adjacent window pair
    * and lag, CROSS-MULTIPLIED (e(t)·c(t+1) > e(t+1)·c(t)) so unequal
    * window sizes never need a float average. 8 lags × 8 comparisons =
    * 64 bits, k-major MSB first. Null for anything but PCM 8-bit mono
    * or fewer than 81 samples (the last window must still own a full
    * lag-8 pair).
    */
  def decodeWavAhash(bytes: Array[Byte]): java.lang.Long = {
    if (!tag(bytes, 0, "RIFF") || bytes.length < 12 || !tag(bytes, 8, "WAVE")) return null
    var i = 12
    var rate = -1; var bits = -1; var channels = -1
    while (i + 8 <= bytes.length) {
      val sz = le32(bytes, i + 4)
      if (sz < 0 || i.toLong + 8L + sz.toLong > bytes.length.toLong) return null
      if (tag(bytes, i, "fmt ")) {
        if (sz < 16 || le16(bytes, i + 8) != 1) return null
        channels = le16(bytes, i + 10)
        rate = le32(bytes, i + 12)
        bits = le16(bytes, i + 22)
      } else if (tag(bytes, i, "data")) {
        if (rate < 0 || bits != 8 || channels != 1) return null
        val n = sz
        if (n < 81) return null
        val off = i + 8
        val e = Array.ofDim[Long](9, 8)
        val c = Array.ofDim[Long](9, 8)
        var k = 1
        while (k <= 8) {
          var j = 0
          val jEnd = n - k
          while (j < jEnd) {
            // LONG window index: j*9 wraps Int for a legal data chunk
            // >= ~239 MB, which would index negative and crash instead
            // of honoring the family's "malformed input → null, never
            // crash" contract (decodeWav's bound discipline)
            val t = (j.toLong * 9L / n).toInt
            val d = ((bytes(off + j + k) & 0xff) - (bytes(off + j) & 0xff)).abs
            e(t)(k - 1) += d
            c(t)(k - 1) += 1
            j += 1
          }
          k += 1
        }
        var fp = 0L
        k = 1
        while (k <= 8) {
          var t = 0
          while (t < 8) {
            fp = (fp << 1) |
              (if (cmpProd(e(t)(k - 1), c(t + 1)(k - 1),
                           e(t + 1)(k - 1), c(t)(k - 1)) > 0) 1L
               else 0L)
            t += 1
          }
          k += 1
        }
        return java.lang.Long.valueOf(fp)
      }
      i += 8 + sz + (sz & 1)
    }
    null
  }

  /** Per-FRAME payload hashes of one 8-bit mono PCM WAV —
    * [[decodePpmFrameHashes]]' audio twin: the waveform split into
    * fixed `frameSamples`-sample frames (64 by default — the audio
    * "frame" a trimmed-clip containment search aligns on; the tail
    * partial frame is dropped, mirroring how the video twin only
    * hashes complete frames), each hashed with the IDENTICAL
    * `(acc·131 + byte) mod 2³¹−1` fold over its unsigned samples.
    * Same fold ⇒ the frame-subsequence containment machinery
    * (rarest-hash candidates + offset-search HOF) is shared verbatim
    * across modalities. Null for anything but PCM 8-bit mono or fewer
    * than `frameSamples` samples.
    */
  def decodeWavFrameHashes(bytes: Array[Byte]): ArrayData = {
    val frameSamples = 64
    if (!tag(bytes, 0, "RIFF") || bytes.length < 12 || !tag(bytes, 8, "WAVE")) return null
    var i = 12
    var rate = -1; var bits = -1; var channels = -1
    while (i + 8 <= bytes.length) {
      val sz = le32(bytes, i + 4)
      if (sz < 0 || i.toLong + 8L + sz.toLong > bytes.length.toLong) return null
      if (tag(bytes, i, "fmt ")) {
        if (sz < 16 || le16(bytes, i + 8) != 1) return null
        channels = le16(bytes, i + 10)
        rate = le32(bytes, i + 12)
        bits = le16(bytes, i + 22)
      } else if (tag(bytes, i, "data")) {
        if (rate < 0 || bits != 8 || channels != 1) return null
        val n = sz
        val nf = n / frameSamples
        if (nf < 1) return null
        val P = 2147483647L
        val B = 131L
        val off = i + 8
        val out = new Array[Any](nf)
        var f = 0
        while (f < nf) {
          var acc = 0L
          var j = off + f * frameSamples
          val end = j + frameSamples
          while (j < end) { acc = (acc * B + (bytes(j) & 0xff)) % P; j += 1 }
          out(f) = acc
          f += 1
        }
        return new GenericArrayData(out)
      }
      i += 8 + sz + (sz & 1)
    }
    null
  }

  /** Exact sign of a·b − c·d for non-negative longs — the cross-multiplied
    * average comparison without the silent Long overflow a ~1.6 GB data
    * chunk's window energies could hit (e ≤ 255·n/9 · c ≤ n/9 exceeds
    * 2^63 for n ≳ 1.7e9). 128-bit compare via Math.multiplyHigh; the
    * spec's naive replay uses BigInt and must agree at every size.
    */
  private def cmpProd(a: Long, b: Long, c: Long, d: Long): Int = {
    val hi1 = Math.multiplyHigh(a, b); val lo1 = a * b
    val hi2 = Math.multiplyHigh(c, d); val lo2 = c * d
    if (hi1 != hi2) java.lang.Long.compare(hi1, hi2)
    else java.lang.Long.compareUnsigned(lo1, lo2)
  }

  // ---------- encoders (fixture synthesis — real container bytes) ----------

  def encodePpm(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var j = 0
    val n = w * h * 3
    while (j < n) { out(header.length + j) = pix(j).toByte; j += 1 }
    out
  }

  /** Canonical 44-byte-header PCM WAV, 8-bit mono. */
  def encodeWav(rate: Int, samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](44 + n)
    def putTag(i: Int, t: String): Unit = { var k = 0; while (k < 4) { out(i + k) = t(k).toByte; k += 1 } }
    def put32(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
      out(i + 2) = ((v >> 16) & 0xff).toByte; out(i + 3) = ((v >> 24) & 0xff).toByte
    }
    def put16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    putTag(0, "RIFF"); put32(4, 36 + n); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, 1)
    put32(24, rate); put32(28, rate); put16(32, 1); put16(34, 8)
    putTag(36, "data"); put32(40, n)
    System.arraycopy(samples, 0, out, 44, n)
    out
  }

  // ---------- Column wrappers ----------

  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def ppmDecode(c: Column): Column = toCol(PpmDecodeExpr(toExpr(c)))
  def ppmDhash(c: Column): Column = toCol(PpmDhashExpr(toExpr(c)))
  def ppmVhash(c: Column): Column = toCol(PpmVhashExpr(toExpr(c)))
  def ppmFrameHashes(c: Column): Column = toCol(PpmFrameHashesExpr(toExpr(c)))
  def ppmFrames(c: Column): Column = toCol(PpmFramesExpr(toExpr(c)))
  def ppmResizeHalf(c: Column): Column = toCol(PpmResizeExpr(toExpr(c)))
  def wavDecode(c: Column): Column = toCol(WavDecodeExpr(toExpr(c)))
  def wavAhash(c: Column): Column = toCol(WavAhashExpr(toExpr(c)))
  def wavFrameHashes(c: Column): Column = toCol(WavFrameHashesExpr(toExpr(c)))

  val ppmStruct: StructType = StructType(Seq(
    StructField("w", IntegerType), StructField("h", IntegerType),
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  val frameStruct: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType), StructField("w", IntegerType),
    StructField("h", IntegerType), StructField("rgb_sum", LongType)))

  val wavStruct: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("bits", IntegerType),
    StructField("n_samples", IntegerType), StructField("sum_samples", LongType)))
}

/** Shared shape: unary binary→T decoder that calls a static MediaCodecs
  * method from generated code and maps a Java null to SQL NULL.
  */
abstract class MediaDecodeExpr extends UnaryExpression {
  /** Fully-qualified static call target, e.g. "decodePpm". */
  protected def method: String
  /** Java type of the decode result in generated code. */
  protected def javaType: String

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = ($javaType) graft.functions.MediaCodecs.$method($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
}

case class PpmDecodeExpr(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = MediaCodecs.ppmStruct
  override def prettyName: String = "graft_ppm_decode"
  override protected def method: String = "decodePpm"
  override protected def javaType: String = "org.apache.spark.sql.catalyst.InternalRow"
  override protected def nullSafeEval(b: Any): Any =
    MediaCodecs.decodePpm(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class PpmFramesExpr(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = ArrayType(MediaCodecs.frameStruct, containsNull = false)
  override def prettyName: String = "graft_ppm_frames"
  override protected def method: String = "decodePpmFrames"
  override protected def javaType: String = "org.apache.spark.sql.catalyst.util.ArrayData"
  override protected def nullSafeEval(b: Any): Any =
    MediaCodecs.decodePpmFrames(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class PpmResizeExpr(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_ppm_resize_half"
  override protected def method: String = "resizePpmHalf"
  override protected def javaType: String = "byte[]"
  override protected def nullSafeEval(b: Any): Any =
    MediaCodecs.resizePpmHalf(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** LongType result needs its own codegen shape: `ev.value` is a
  * primitive `long` in generated code, so the boxed decode result goes
  * through a temp and unboxes only when non-null (the MediaDecodeExpr
  * template assigns object types directly).
  */
case class PpmDhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppm_dhash"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("dhash")
      s"""
         |java.lang.Long $tmp = graft.functions.MediaCodecs.decodePpmDhash($c);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();
       """.stripMargin
    })
  override protected def nullSafeEval(b: Any): Any =
    MediaCodecs.decodePpmDhash(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class PpmFrameHashesExpr(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ppm_frame_hashes"
  override protected def method: String = "decodePpmFrameHashes"
  override protected def javaType: String = "org.apache.spark.sql.catalyst.util.ArrayData"
  override protected def nullSafeEval(b: Any): Any =
    MediaCodecs.decodePpmFrameHashes(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class PpmVhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ppm_vhash"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("vhash")
      s"""
         |java.lang.Long $tmp = graft.functions.MediaCodecs.decodePpmVhash($c);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();
       """.stripMargin
    })
  override protected def nullSafeEval(b: Any): Any =
    MediaCodecs.decodePpmVhash(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class WavAhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_ahash"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("ahash")
      s"""
         |java.lang.Long $tmp = graft.functions.MediaCodecs.decodeWavAhash($c);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();
       """.stripMargin
    })
  override protected def nullSafeEval(b: Any): Any =
    MediaCodecs.decodeWavAhash(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class WavFrameHashesExpr(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_wav_frame_hashes"
  override protected def method: String = "decodeWavFrameHashes"
  override protected def javaType: String = "org.apache.spark.sql.catalyst.util.ArrayData"
  override protected def nullSafeEval(b: Any): Any =
    MediaCodecs.decodeWavFrameHashes(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

case class WavDecodeExpr(child: Expression) extends MediaDecodeExpr {
  override def dataType: DataType = MediaCodecs.wavStruct
  override def prettyName: String = "graft_wav_decode"
  override protected def method: String = "decodeWav"
  override protected def javaType: String = "org.apache.spark.sql.catalyst.InternalRow"
  override protected def nullSafeEval(b: Any): Any =
    MediaCodecs.decodeWav(b.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
