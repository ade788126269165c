package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash kernel.
  *
  * Computes, in ONE pass over the (already lowercased) text, the same
  * fingerprint as the expression form in `graft.operators.Dedup.simhash`
  * (whose SQL text is also the DuckDB oracle):
  *
  *   tokens  = DISTINCT of split(text, \s+) minus ""
  *   bit b of token = hex digit (1+b/4) of md5, weight 1<<(3−b%4)
  *                  = digest bit b, MSB-first over the first 8 bytes
  *   s_b     = Σ_tokens (2·bit − 1);  fp bit b set ⟺ s_b > 0
  *
  * Why native: the expression form explodes ~|tokens| rows per doc and
  * shuffles them through a 64-sum aggregate; at corpus scale the
  * fingerprint pass becomes a full (doc, token) shuffle. This kernel
  * keeps it a NARROW map — split, hash and count in registers, one row
  * in, one long out, no shuffle anywhere in the fingerprint stage.
  * Equality with the expression form is pinned in KernelSpec and by the
  * oracle gate (dedup_simhash hash-compares every fingerprint).
  *
  * Returns NULL when the doc has no non-empty token — such docs are
  * absent from the expression form's aggregate, so callers filter nulls
  * to match.
  */
case class SimhashFp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(t: Any): Any =
    SimhashKernel.fingerprint(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |Long ${ev.value}Box = graft.functions.SimhashKernel.fingerprint($t);
         |${ev.isNull} = ${ev.value}Box == null;
         |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}Box.longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashKernel {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Same split semantics as Spark's `split(text, "\\s+")` — both sides
    * are java.util.regex with limit −1.
    */
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** boxed Long fingerprint, or null when no non-empty token exists. */
  def fingerprint(t: UTF8String): java.lang.Long = {
    val toks = Ws.split(t.toString, -1)
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](64)
    val md = mdPool.get()
    var any = false
    var i = 0
    while (i < toks.length) {
      val tok = toks(i)
      if (tok.nonEmpty && seen.add(tok)) {
        any = true
        md.reset()
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < 64) {
          // digest bit b, MSB-first == the SQL's hex-digit extraction
          if (((d(b >> 3) >> (7 - (b & 7))) & 1) == 1) counts(b) += 1
          else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  /** Column wrapper: `graft_simhash(lower(text))` → bigint (nullable). */
  def simhashFast(text: Column): Column = toCol(SimhashFp(toExpr(text)))
}
