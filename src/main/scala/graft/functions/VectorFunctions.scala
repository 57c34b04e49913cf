package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float|double>` columns, built on
  * `zip_with`/`aggregate`/`transform` higher-order functions so the math
  * is Catalyst-codegen'd — no UDF boxing on the 100 TB path.
  */
object VectorFunctions {

  /** Cast an array<float> embedding to array<double> for stable math. */
  def toDoubles(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product (deterministic summation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = l2Norm(a) * l2Norm(b)
    when(nn > 0.0, d / nn).otherwise(lit(0.0))
  }

  /** Native codegen'd cosine ([[CosineSimilarity]]) — requires a
    * session with [[graft.GraftExtensions]] installed (GraftSession
    * always installs it). Fused primitive loop, ~10× the HOF
    * [[cosine]] per pair. */
  def cosineNative(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)
}
