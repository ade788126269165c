package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash-signature kernel.
  *
  * Computes, in ONE pass over the (already lowercased) text, the full
  * nHash-component MinHash signature over character n-gram shingles —
  * the values are IDENTICAL to the HOF formulation in
  * `graft.operators.Dedup.minhashSignatureNarrow` (which is also the
  * exact shape of the DuckDB oracle SQL):
  *
  *   base(sh) = toBigint(substr(md5(sh), 1, 15)) mod P
  *            = (first 8 digest bytes as big-endian u64) >>> 4  mod P
  *   h_i(doc) = min over shingles of (a_i · base + b_i) mod P
  *
  * Why native: the HOF path materializes an 800-element hash array per
  * doc and pays md5's hex-encode → substring → base-16 reparse round
  * trip per shingle. This kernel walks UTF-8 once (char-indexed shingle
  * windows, so multibyte text matches the SQL substr semantics), feeds
  * the digest the raw byte window, takes the top 60 bits of the digest
  * directly, and updates all running minima in registers.
  */
case class MinhashSignature(child: Expression, n: Int, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(t: Any): Any =
    MinhashKernel.signature(t.asInstanceOf[UTF8String], n, as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.MinhashKernel.signature($t, $n, $asRef, $bsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashKernel {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  val P: Long = 2147483647L // 2^31 − 1, same modulus as Dedup.MinhashP

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Signature array, or null when the text has fewer than n chars
    * (mirrors the HOF path's `where(length >= n)` guard — callers filter
    * first; kernel returns an empty array for sub-n docs).
    */
  def signature(t: UTF8String, n: Int, as: Array[Long], bs: Array[Long]): ArrayData = {
    val bytes = t.getBytes
    val nChars = t.numChars()
    val nHash = as.length
    if (nChars < n) return new GenericArrayData(new Array[Long](0))
    // char-index → byte-offset table (UTF-8 aware, so shingle windows
    // match SQL substr character semantics on multibyte text)
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (ci < nChars) {
      offs(ci) = bi
      val b = bytes(bi) & 0xff
      bi += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      ci += 1
    }
    offs(nChars) = bytes.length
    val mins = Array.fill(nHash)(Long.MaxValue)
    val md = mdPool.get()
    var i = 0
    while (i <= nChars - n) {
      md.reset()
      md.update(bytes, offs(i), offs(i + n) - offs(i))
      val d = md.digest()
      // first 15 hex digits of the md5 == top 60 bits of the digest
      var top: Long = 0L
      var k = 0
      while (k < 8) { top = (top << 8) | (d(k) & 0xffL); k += 1 }
      val base = (top >>> 4) % P
      var j = 0
      while (j < nHash) {
        val h = (as(j) * base + bs(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column wrapper: `graft_minhash(lower(text))` → array<long>. */
  def minhashFast(text: Column, n: Int, coeffs: Seq[(Long, Long)]): Column =
    toCol(MinhashSignature(toExpr(text), n,
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray))
}
