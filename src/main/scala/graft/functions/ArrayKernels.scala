package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst kernels for dense double-array math.
  *
  * Why custom Expressions (SURVEY §2.9 said "none required" — that held
  * for the k-means core, but the similarity extension changed the
  * calculus): a 64-term unrolled `element_at` chain blows past the
  * whole-stage-codegen method budget and falls back to interpreted
  * evaluation, and the `aggregate`/`zip_with` HOF form never codegens at
  * all. Measured on the sf0.1 all-pairs cosine scan: unrolled 38s, HOF
  * 31s, vs a codegen'd tight loop — these expressions emit
  * `for (i) s += a[i]*b[i]` straight into the generated stage.
  *
  * Determinism contract: ascending-index sequential accumulation —
  * exactly the left-associative order of the oracle SQL's unrolled
  * `v[1]*q[1] + v[2]*q[2] + …`, so results stay bit-identical to DuckDB.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared Euclidean distance between two double arrays: Σ (aᵢ−bᵢ)² —
  * the n-dim k-means kernel (direct difference form, NOT ‖a‖²+‖b‖²−2ab,
  * so the float result matches the HOF/SQL definition term-for-term).
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dist_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Count of common elements between two SORTED long arrays (a sorted-set
  * merge — O(n+m), no per-row hash set, no materialized intersection
  * array). `size(array_intersect(a, b))` builds a hash relation and an
  * output array per ROW; on the MinHash verify stage that is ~10⁸
  * hash-insert/probe ops across the candidate pairs. Inputs must be
  * sorted and duplicate-free (array_sort ∘ array_distinct, paid once
  * per doc, not once per pair).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  // getLong on anything but array<bigint> would silently read the wrong
  // byte width — make misuse an ANALYSIS error, like the built-ins.
  // (Null ELEMENTS are undefined behavior, as in the other kernels here;
  // the shingle-hash pipelines never produce them.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val av = x.getLong(i); val bv = y.getLong(j)
      if (av < bv) i += 1
      else if (av > bv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val av = ctx.freshName("av"); val bv = ctx.freshName("bv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  long $av = $a.getLong($i); long $bv = $b.getLong($j);
         |  if ($av < $bv) $i++;
         |  else if ($av > $bv) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ArrayKernels {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Column wrappers (classic-mode Column-from-Expression). */
  def dotFast(a: Column, b: Column): Column =
    toCol(DotProduct(toExpr(a), toExpr(b)))

  def distSqFast(a: Column, b: Column): Column =
    toCol(SquaredDistance(toExpr(a), toExpr(b)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(toExpr(a), toExpr(b)))

  /** Optional SQL registration: graft_dot / graft_dist_sq become callable
    * from spark.sql text. Idempotent per session — re-registering an
    * existing temp function emits a SimpleFunctionRegistry WARN per call,
    * which pollutes the bench stdout when a SQL-text query runs per
    * invocation, so skip when already present.
    */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_dot")))
      reg.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("graft_dist_sq")))
      reg.createOrReplaceTempFunction(
        "graft_dist_sq", exprs => SquaredDistance(exprs(0), exprs(1)), "built-in")
  }
}
