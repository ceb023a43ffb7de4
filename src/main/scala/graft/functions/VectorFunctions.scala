package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.LongArrayDot

/** Vector math over ARRAY<FLOAT> embedding columns, built from Spark's
  * higher-order functions (codegen-capable, no UDF serialization).
  *
  * Determinism: float SUMS depend on accumulation order and float32-vs-
  * float64 accumulator width, so cross-engine comparison of a raw cosine
  * is unstable. `dotQuantized` sidesteps this: each element is promoted
  * float->double (exact), scaled to micro-units and rounded to BIGINT
  * (exact), and the dot product is then pure integer math — bit-identical
  * in any engine at any parallelism. Unit-norm embeddings make this a
  * quantized cosine (scale 1e12).
  */
object VectorFunctions {

  /** Element-wise micro-quantization: ARRAY<FLOAT> -> ARRAY<BIGINT>. */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double") * 1000000, 0).cast("long"))

  /** Exact integer dot product of two quantized vectors (scale 1e12).
    * Runs as the codegen'd LongArrayDot loop; prefer pre-quantizing each
    * side before a join so quantization cost is per-row, not per-pair. */
  def dotQuantized(a: Column, b: Column): Column =
    LongArrayDot(quantize(a), quantize(b))

  /** Double-precision dot product (fixed left-to-right fold). For ranking
    * and internal use; NOT for cross-engine equality checks. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  /** L2 norm (double). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
