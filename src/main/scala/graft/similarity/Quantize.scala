package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage-compression step
  * of a large-scale vector pipeline (4× smaller than float32, and the
  * input format int8-SIMD distance kernels expect). Row-local Column
  * expressions; the quantized corpus stays a normal parquet column
  * (`array<tinyint>` at rest via cast, `array<long>` here so the oracle
  * compares exactly).
  *
  * Determinism contract (oracle-mirrorable): per-vector scale =
  * 127 / max|x| (exact max, no FP accumulation order), elementwise
  * `round(x * scale)` (both engines round half away from zero), and the
  * reconstruction error `max|x − q/scale|` is an elementwise max —
  * every step order-free or elementwise, so DuckDB list comprehensions
  * reproduce it bit-exactly.
  */
object Quantize {

  /** 127 / max|x|; an all-zero vector gets scale 1 (quantizes to zeros
    * and reconstructs exactly).
    */
  def int8Scale(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    when(maxAbs === 0.0, lit(1.0)).otherwise(lit(127.0) / maxAbs)
  }

  /** Elementwise quantized codes in [-127, 127] (as longs — cast to
    * "array<tinyint>" at rest).
    */
  def int8Codes(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast("double") * scale).cast("long"))

  /** Max reconstruction error max|x − q/scale| — bounded by 1/(2·scale)
    * = max|x|/254 by construction.
    */
  def maxReconError(v: Column, codes: Column, scale: Column): Column =
    array_max(zip_with(v, codes,
      (x, q) => abs(x.cast("double") - q.cast("double") / scale)))
}
