package graft

import graft.functions.MediaCodecs

/** Unit coverage for the REAL PPM/WAV parsers (graft.functions
  * .MediaCodecs) — exercised on hand-built bytes, including format
  * features the synthesizer never emits (header comments, extra RIFF
  * chunks) and malformed inputs that must return null, not throw.
  */
class MediaCodecSpec extends SparkSpec {

  private def ppm(w: Int, h: Int, pix: Int => Int): Array[Byte] =
    MediaCodecs.encodePpm(w, h, pix)

  test("ppm decode: dims and channel sums on a known image") {
    // 2x2 image, pixel bytes 0..11: R at 0,3,6,9; G at 1,4,7,10; B at 2,5,8,11
    val d = MediaCodecs.decodePpm(ppm(2, 2, j => j))
    assert(d != null)
    assert(d.getInt(0) == 2 && d.getInt(1) == 2)
    assert(d.getLong(2) == 0L + 3 + 6 + 9)
    assert(d.getLong(3) == 1L + 4 + 7 + 10)
    assert(d.getLong(4) == 2L + 5 + 8 + 11)
  }

  test("ppm decode: header comments and multi-whitespace are accepted") {
    val payload = Array.tabulate(1 * 1 * 3)(j => j.toByte)
    val bytes = "P6\n# a comment\n  1\t1 # trailing\n255\n".getBytes("US-ASCII") ++ payload
    val d = MediaCodecs.decodePpm(bytes)
    assert(d != null && d.getInt(0) == 1 && d.getInt(1) == 1)
    assert(d.getLong(2) == 0 && d.getLong(3) == 1 && d.getLong(4) == 2)
  }

  test("ppm decode: malformed inputs return null") {
    assert(MediaCodecs.decodePpm("P5\n1 1\n255\n".getBytes ++ Array[Byte](1, 2, 3)) == null) // wrong magic
    assert(MediaCodecs.decodePpm("P6\n2 2\n255\n".getBytes ++ Array[Byte](1, 2, 3)) == null) // truncated payload
    assert(MediaCodecs.decodePpm("P6\n1 1\n65535\n".getBytes ++ Array[Byte](1, 2, 3)) == null) // 2-byte maxval
    assert(MediaCodecs.decodePpm(Array[Byte]()) == null)
  }

  test("ppm frames: demuxes consecutive images, ignores trailing garbage") {
    val f0 = ppm(2, 1, j => j)      // sums 0+3, 1+4, 2+5 -> rgb 15
    val f1 = ppm(2, 1, j => j + 10) // rgb sum 15 + 6*10 = 75
    val fs = MediaCodecs.decodePpmFrames(f0 ++ f1 ++ "xx".getBytes)
    assert(fs != null && fs.numElements() == 2)
    val r0 = fs.getStruct(0, 4); val r1 = fs.getStruct(1, 4)
    assert(r0.getInt(0) == 0 && r0.getLong(3) == 15L)
    assert(r1.getInt(0) == 1 && r1.getLong(3) == 75L)
    assert(MediaCodecs.decodePpmFrames("nope".getBytes) == null)
  }

  test("ppm resize: nearest-neighbor 2x downsample samples (2x, 2y)") {
    // 4x2 -> 2x1; out(0,0)=in(0,0) bytes 0..2, out(1,0)=in(2,0) bytes 18..20
    val rz = MediaCodecs.resizePpmHalf(ppm(4, 2, j => j))
    assert(rz != null)
    val d = MediaCodecs.decodePpm(rz)
    assert(d.getInt(0) == 2 && d.getInt(1) == 1)
    assert(d.getLong(2) == 0L + 6)  // in-pixel (0,0) R=0*3? no: src=((0)*4+0)*3=0 and ((0)*4+2)*3=6
    assert(d.getLong(3) == 1L + 7)
    assert(d.getLong(4) == 2L + 8)
    // 1-wide image cannot halve
    assert(MediaCodecs.resizePpmHalf(ppm(1, 4, j => j)) == null)
  }

  test("ppm decode: overflowing declared dimensions return null, never crash") {
    // w*h*3 wraps Int positive: 1431655766 * 1 * 3 = 2^32 + 2
    assert(MediaCodecs.decodePpm(
      "P6\n1431655766 1\n255\n".getBytes ++ Array[Byte](1, 2)) == null)
    // w*h wraps to 0: 65536 * 65536
    assert(MediaCodecs.decodePpm(
      "P6\n65536 65536\n255\n".getBytes ++ Array.fill[Byte](16)(0)) == null)
    // digits overflow Int entirely
    assert(MediaCodecs.decodePpm(
      "P6\n99999999999999999999 1\n255\n".getBytes ++ Array[Byte](1)) == null)
  }

  test("ppm dhash: bit order, grid pooling and null cases match a naive replay") {
    // naive reference: float averages + double-loop grid, independent of
    // the kernel's cross-multiplied integer comparison
    def naive(w: Int, h: Int, pix: Int => Int): Long = {
      val s = Array.ofDim[Double](8, 9); val c = Array.ofDim[Long](8, 9)
      for (y <- 0 until h; x <- 0 until w) {
        val j = (y * w + x) * 3
        s(y * 8 / h)(x * 9 / w) += pix(j) + pix(j + 1) + pix(j + 2)
        c(y * 8 / h)(x * 9 / w) += 1
      }
      var bits = 0L
      for (gy <- 0 until 8; gx <- 0 until 8)
        bits = (bits << 1) | (if (s(gy)(gx) / c(gy)(gx) > s(gy)(gx + 1) / c(gy)(gx + 1)) 1L else 0L)
      bits
    }
    // the synthesis formula at a few ids, plus a gradient and a constant
    for (m <- Seq(0L, 3L, 21L, 399L)) {
      val w = (16 + m % 33).toInt; val h = (12 + m % 17).toInt
      val pix = (j: Int) => ((m * 31 + j * 7) % 256).toInt
      val got = MediaCodecs.decodePpmDhash(ppm(w, h, pix))
      assert(got != null && got.longValue() == naive(w, h, pix), s"m=$m")
    }
    // constant image: no comparison fires, hash 0
    assert(MediaCodecs.decodePpmDhash(ppm(9, 8, _ => 7)).longValue() == 0L)
    // MSB: make only cell (0,0) brighter than (1,0) on a 9x8 identity
    // grid (1 px per cell) — exactly bit 63 set
    val oneBit = ppm(9, 8, j => if (j < 3) 255 else 0)
    assert(MediaCodecs.decodePpmDhash(oneBit).longValue() == Long.MinValue)
    // smaller than the grid, or malformed → null
    assert(MediaCodecs.decodePpmDhash(ppm(8, 8, _ => 0)) == null)
    assert(MediaCodecs.decodePpmDhash(ppm(9, 7, _ => 0)) == null)
    assert(MediaCodecs.decodePpmDhash("not a ppm".getBytes) == null)
  }

  test("wav ahash: lag-band bits, window pooling and null cases match a naive replay") {
    // naive reference: BigInt cross-multiplication + straightforward
    // double loops, independent of the kernel's single-pass grid
    def naive(samples: Array[Int]): Long = {
      val n = samples.length
      val e = Array.ofDim[Long](9, 8); val c = Array.ofDim[Long](9, 8)
      for (k <- 1 to 8; j <- 0 until n - k) {
        val t = j * 9 / n
        e(t)(k - 1) += math.abs(samples(j + k) - samples(j))
        c(t)(k - 1) += 1
      }
      var bits = 0L
      for (k <- 1 to 8; t <- 0 until 8)
        bits = (bits << 1) | (if (BigInt(e(t)(k - 1)) * c(t + 1)(k - 1) >
          BigInt(e(t + 1)(k - 1)) * c(t)(k - 1)) 1L else 0L)
      bits
    }
    // the synthesis formula at a few ids (m % 3 == 1 are the audio rows)
    for (m <- Seq(1L, 4L, 22L, 400L)) {
      val n = (256 + m % 513).toInt
      val samples = Array.tabulate(n)(j => ((m * 17 + j * 5) % 256).toInt)
      val got = MediaCodecs.decodeWavAhash(MediaCodecs.encodeWav(
        (8000 + (m % 5) * 1000).toInt, samples.map(_.toByte)))
      assert(got != null && got.longValue() == naive(samples), s"m=$m")
    }
    // constant signal: every lag diff is 0, no strict comparison fires
    assert(MediaCodecs.decodeWavAhash(
      MediaCodecs.encodeWav(8000, Array.fill[Byte](100)(42))).longValue() == 0L)
    // 80 samples: the last window owns no lag-8 pair → null; junk → null
    assert(MediaCodecs.decodeWavAhash(
      MediaCodecs.encodeWav(8000, Array.fill[Byte](80)(1))) == null)
    assert(MediaCodecs.decodeWavAhash("not a wav".getBytes) == null)
  }

  test("ppm vhash: clip luma lag-band bits match a naive replay; order-sensitive; null cases") {
    // naive reference: the wav-ahash naive replay over the clip's
    // flattened luma signal (BigInt cross-multiplication, plain loops)
    def naive(l: Array[Int]): Long = {
      val n = l.length
      val e = Array.ofDim[Long](9, 8); val c = Array.ofDim[Long](9, 8)
      for (k <- 1 to 8; j <- 0 until n - k) {
        val t = j * 9 / n
        e(t)(k - 1) += math.abs(l(j + k) - l(j))
        c(t)(k - 1) += 1
      }
      var bits = 0L
      for (k <- 1 to 8; t <- 0 until 8)
        bits = (bits << 1) | (if (BigInt(e(t)(k - 1)) * c(t + 1)(k - 1) >
          BigInt(e(t + 1)(k - 1)) * c(t)(k - 1)) 1L else 0L)
      bits
    }
    // the synthesis formula at a few ids (m % 3 == 2 are the video rows)
    for (m <- Seq(2L, 5L, 17L, 401L)) {
      val w = (8 + m % 9).toInt; val h = (6 + m % 5).toInt
      val f = (2 + m % 4).toInt; val wh = w * h
      val bytes = (0 until f).toArray.flatMap(fi =>
        MediaCodecs.encodePpm(w, h, j => ((m * 31 + fi * 13 + j * 7) % 256).toInt))
      val luma = Array.tabulate(f * wh) { j =>
        val fi = j / wh; val p = j % wh
        (0 to 2).map(c => ((m * 31 + fi * 13 + (p * 3 + c) * 7) % 256).toInt).sum
      }
      val got = MediaCodecs.decodePpmVhash(bytes)
      assert(got != null && got.longValue() == naive(luma), s"m=$m")
    }
    // ORDER sensitivity — the property separating a clip fingerprint
    // from a bag of frame hashes: swapping the two frames moves bits
    val fa = MediaCodecs.encodePpm(10, 9, j => (j * 11) % 256)
    val fb = MediaCodecs.encodePpm(10, 9, j => 255 - (j * 5) % 256)
    val ab = MediaCodecs.decodePpmVhash(fa ++ fb)
    val ba = MediaCodecs.decodePpmVhash(fb ++ fa)
    assert(ab != null && ba != null && ab.longValue() != ba.longValue(),
      "frame order must move fingerprint bits")
    // null cases: junk bytes; a clip with fewer than 81 pixels
    assert(MediaCodecs.decodePpmVhash("not a ppm".getBytes) == null)
    val tiny = MediaCodecs.encodePpm(8, 5, _ => 7) // 40 px/frame
    assert(MediaCodecs.decodePpmVhash(tiny ++ tiny) == null) // 80 < 81
  }

  test("ppm frame hashes: per-frame polynomial fold matches a naive replay; null on junk") {
    def naive(payload: Array[Int]): Long =
      payload.foldLeft(0L)((a, v) => (a * 131L + v) % 2147483647L)
    val m = 5L // a video id (m % 3 == 2)
    val w = (8 + m % 9).toInt; val h = (6 + m % 5).toInt
    val f = (2 + m % 4).toInt
    val bytes = (0 until f).toArray.flatMap(fi =>
      MediaCodecs.encodePpm(w, h, j => ((m * 31 + fi * 13 + j * 7) % 256).toInt))
    val got = MediaCodecs.decodePpmFrameHashes(bytes)
    assert(got != null && got.numElements() == f)
    for (fi <- 0 until f) {
      val exp = naive(Array.tabulate(w * h * 3)(j =>
        ((m * 31 + fi * 13 + j * 7) % 256).toInt))
      assert(got.getLong(fi) == exp, s"frame $fi hash diverged")
    }
    // a hash is frame-identity: two frames with one differing byte differ
    val fa = MediaCodecs.encodePpm(9, 8, j => j % 256)
    val fb = MediaCodecs.encodePpm(9, 8, j => if (j == 0) 1 else j % 256)
    val ha = MediaCodecs.decodePpmFrameHashes(fa ++ fb)
    assert(ha.getLong(0) != ha.getLong(1))
    assert(MediaCodecs.decodePpmFrameHashes("junk".getBytes) == null)
  }

  test("wav decode: overflowing chunk sizes return null, never crash") {
    // an unknown chunk declaring size 0x7FFFFFFF: the cursor math must
    // not wrap negative and index out of bounds
    val bad = "RIFF".getBytes ++ Array[Byte](30, 0, 0, 0) ++ "WAVE".getBytes ++
      "junk".getBytes ++ Array[Byte](-1, -1, -1, 127) ++ Array.fill[Byte](10)(0)
    assert(MediaCodecs.decodeWav(bad) == null)
    // a data chunk declaring more bytes than exist
    val base = MediaCodecs.encodeWav(8000, Array[Byte](1, 2, 3))
    base(40) = 100 // data size 100 > 3 actual
    assert(MediaCodecs.decodeWav(base) == null)
  }

  test("wav decode: parses the canonical header and sums samples") {
    val samples = Array.tabulate(100)(j => (j % 256).toByte)
    val d = MediaCodecs.decodeWav(MediaCodecs.encodeWav(8000, samples))
    assert(d != null)
    assert(d.getInt(0) == 8000 && d.getInt(1) == 8 && d.getInt(2) == 100)
    assert(d.getLong(3) == (0 until 100).map(_ % 256).sum.toLong)
  }

  test("wav decode: unknown chunks before data are skipped (real RIFF walk)") {
    val base = MediaCodecs.encodeWav(9000, Array[Byte](10, 20, 30))
    // splice a LIST chunk (odd-sized -> tests 2-byte alignment) between fmt and data
    val list = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0) ++ "abc".getBytes ++ Array[Byte](0)
    val spliced = base.take(36) ++ list ++ base.drop(36)
    // fix RIFF size field (bytes 4..7 little-endian)
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte; spliced(5) = ((total >> 8) & 0xff).toByte
    val d = MediaCodecs.decodeWav(spliced)
    assert(d != null && d.getInt(0) == 9000 && d.getInt(2) == 3 && d.getLong(3) == 60L)
  }

  test("wav decode: malformed inputs return null") {
    assert(MediaCodecs.decodeWav("RIFFxxxxWAVE".getBytes) == null) // no chunks
    assert(MediaCodecs.decodeWav("OGGS".getBytes) == null)
    val stereo = MediaCodecs.encodeWav(8000, Array[Byte](1, 2))
    stereo(22) = 2 // channels=2 -> unsupported
    assert(MediaCodecs.decodeWav(stereo) == null)
  }

  test("wav frame hashes: 64-sample frame fold matches a naive replay; tail dropped; null on junk") {
    def naive(payload: Array[Int]): Long =
      payload.foldLeft(0L)((a, v) => (a * 131L + v) % 2147483647L)
    val m = 4L // an audio id (m % 3 == 1)
    val n = (256 + m % 513).toInt
    val samples = Array.tabulate(n)(j => ((m * 17 + j * 5) % 256).toByte)
    val bytes = MediaCodecs.encodeWav((8000 + (m % 5) * 1000).toInt, samples)
    val got = MediaCodecs.decodeWavFrameHashes(bytes)
    val nf = n / 64
    assert(got != null && got.numElements() == nf,
      s"expected $nf full frames (tail of ${n % 64} samples dropped)")
    for (fi <- 0 until nf) {
      val exp = naive(Array.tabulate(64)(j => samples(fi * 64 + j) & 0xff))
      assert(got.getLong(fi) == exp, s"frame $fi hash diverged")
    }
    // identity: one differing sample inside a frame moves its hash only
    val s2 = samples.clone(); s2(3) = (s2(3) + 1).toByte
    val g2 = MediaCodecs.decodeWavFrameHashes(MediaCodecs.encodeWav(8000, s2))
    assert(g2.getLong(0) != got.getLong(0))
    for (fi <- 1 until nf) assert(g2.getLong(fi) == got.getLong(fi))
    assert(MediaCodecs.decodeWavFrameHashes("junk".getBytes) == null)
    assert(MediaCodecs.decodeWavFrameHashes(
      MediaCodecs.encodeWav(8000, Array.fill(63)(1.toByte))) == null)
  }

  test("containment candidates: rarest-hash generator finds the identical verified pairs") {
    // the lossless-by-pigeonhole claim, pinned on the real fixture:
    // rarest-frame-only candidate generation must verify to exactly
    // the pairs the exhaustive any-shared-hash generator verifies —
    // for BOTH modalities that share frameSeqContainment
    import graft.operators.Multimodal
    val media = Multimodal.synthesizeMedia(spark, "/root/testdata/sf0.001").toDF()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("media_a", "media_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
          r.getInt(4))).toSeq
    val rare = pairs(Multimodal.vhashContainment(media, rarestOnly = true))
    val all = pairs(Multimodal.vhashContainment(media, rarestOnly = false))
    assert(rare.nonEmpty, "fixture must exercise containment")
    assert(rare == all, "rarest-hash candidates dropped a verified pair")
  }

  test("expression form: decode round-trips through codegen on a DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, ppm(3, 2, j => j % 256)), (2L, "garbage".getBytes))
      .toDF("id", "content")
      .withColumn("d", MediaCodecs.ppmDecode(col("content")))
      .select(col("id"), col("d.w"), col("d.sum_r"))
      .orderBy("id").collect()
    assert(df(0).getInt(1) == 3)
    assert(!df(0).isNullAt(2))
    assert(df(1).isNullAt(1)) // malformed -> NULL, not an exception
  }
}
