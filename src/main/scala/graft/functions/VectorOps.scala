package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` columns as pure column expressions
  * (`zip_with`/`aggregate` — codegen'd, no UDF). Embeddings arrive as
  * `array<float>` in parquet; cast once at the edge with
  * `col.cast("array<double>")` so all accumulation is double-precision. */
object VectorOps {

  /** Left-to-right dot product (deterministic summation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; null on zero-norm input rather than dividing by 0. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm2(a) * norm2(b), lit(0.0))

  /** Pre-normalized variant: when one side is L2-normalized ahead of a join,
    * cosine degenerates to a dot product — at 100 TB, normalizing the corpus
    * once and storing unit vectors halves the per-pair flops and avoids
    * recomputing norms inside the join. */
  def l2Normalize(a: Column): Column = {
    val n = norm2(a)
    when(n > 0, transform(a, x => x / n))
  }

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
}
