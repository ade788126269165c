package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector / distance column kernels (SURVEY §2.6 F1-F3).
  *
  * The reference duplicates a 2-D Euclidean distance in two files
  * (mapper.py:19-27, master.py:305-313) and wastes a sqrt by re-squaring
  * for the argmin (mapper.py:42 — `pow(getDistance(p,c), 2)`). We compare
  * squared distances directly (monotone-equivalent; also what MLlib does)
  * and generalize to n dimensions with built-in higher-order functions —
  * no UDFs, so everything stays inside Catalyst.
  *
  * Note on determinism: these expressions are written so the DuckDB oracle
  * can evaluate the *same* arithmetic in the *same* order, making per-row
  * results bit-identical across engines (SURVEY §7.5 float-determinism
  * risk).
  */
object VecFunctions {

  /** Squared Euclidean distance in 2-D: `(x-cx)² + (y-cy)²` as
    * multiplications (not `pow`, whose libm implementation could differ
    * across engines). Fully codegen'd.
    */
  def distSq2(x: Column, y: Column, cx: Column, cy: Column): Column =
    (x - cx) * (x - cx) + (y - cy) * (y - cy)

  /** 1-D squared difference (sequential-kmeans.py:24). */
  def distSq1(x: Column, c: Column): Column = (x - c) * (x - c)

  /** n-dim squared Euclidean distance over two `ArrayType(Double)` columns
    * via `zip_with` + `aggregate` — left-to-right fold, deterministic
    * summation order.
    */
  def distSqN(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (p, q) => (p - q) * (p - q)), lit(0.0), (acc, v) => acc + v)

  /** Dot product over two `ArrayType(Double)` columns; sequential fold =
    * deterministic order.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cast a float array (parquet `ARRAY<FLOAT>`) to a double array so all
    * arithmetic runs in float64 on both engines.
    */
  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))

  /** Unrolled fixed-dim dot product: `a[1]*b[1] + a[2]*b[2] + …` with
    * left-associative addition. Unlike the HOF form this is whole-stage
    * codegen'd, and the identical expression text runs in DuckDB, so
    * results are bit-exact across engines (same IEEE ops, same order).
    */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i) * element_at(b, i))
      .reduceLeft(_ + _)

  /** Cosine via the unrolled dot — `dot/(sqrt(aa)*sqrt(bb))`; SQL twin in
    * [[cosineUnrolledSql]] must keep the exact same operation order.
    */
  def cosineUnrolled(a: Column, b: Column, dim: Int): Column =
    dotUnrolled(a, b, dim) /
      (sqrt(dotUnrolled(a, a, dim)) * sqrt(dotUnrolled(b, b, dim)))

  /** DuckDB SQL twin of [[dotUnrolled]] (1-indexed lists both sides). */
  def dotUnrolledSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"$a[$i]*$b[$i]").mkString(" + ")

  /** DuckDB SQL twin of [[cosineUnrolled]]. */
  def cosineUnrolledSql(a: String, b: String, dim: Int): String =
    s"(${dotUnrolledSql(a, b, dim)}) / (sqrt(${dotUnrolledSql(a, a, dim)}) * sqrt(${dotUnrolledSql(b, b, dim)}))"
}
