package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Embedding-vector column builders (SURVEY.md §2 C5-C7). Built-in
 * higher-order functions only: `zip_with` + `aggregate` keep the math
 * inside whole-stage codegen — no UDF serialization per row.
 */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision via the codegen'd [[VectorDot]]
   * expression (a tight primitive loop; the built-in
   * `aggregate(zip_with(...))` route runs interpreted per element). */
  def dot(a: Column, b: Column): Column = VectorDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Integer-quantized copy of a float vector (`floor(x*1000)` per dim).
   * Dot products over the quantized vectors are exact integers — the
   * trick that makes ANN results bit-identical across engines for
   * oracle verification.
   */
  def quantize(a: Column, scale: Int = 1000): Column =
    transform(a, x => floor(x.cast(DoubleType) * scale).cast(LongType))

  /** Σ aᵢ·bᵢ in exact long arithmetic via the codegen'd
   * [[VectorDotLong]] (the `aggregate(zip_with(...))` formulation runs
   * interpreted per element and dominated exact-ANN rerank time). */
  def dotLong(a: Column, b: Column): Column = VectorDotLong(a, b)

  /**
   * Random-hyperplane signature bit: sign of Σ vᵢ·hᵢ where hᵢ = ±1 from
   * `xxhash64(planeSeed, dimIndex)`. Deterministic, seedable, no stored
   * plane matrix — the plane is recomputed from hashes at evaluation.
   */
  def hyperplaneBit(v: Column, plane: Int): Column = {
    val signedSum = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
        when(xxhash64(lit(plane), i) % 2 === 0, x.cast(DoubleType)).otherwise(-x.cast(DoubleType))),
      lit(0d), _ + _)
    when(signedSum >= 0, 1).otherwise(0)
  }

  /** H-bit LSH bucket id from random hyperplanes (scale path for ANN). */
  def lshBucket(v: Column, bits: Int): Column =
    (0 until bits).map(b => hyperplaneBit(v, b) * lit(1 << b)).reduce(_ + _)

  /**
   * Deterministic ±1 hyperplane weights from a tiny integer LCG over
   * (plane, 1-based dim index). Unlike the xxhash64-seeded planes these
   * are reproducible in any SQL engine with 64-bit integer arithmetic —
   * the DuckDB oracle recomputes them inline — which makes LSH-bucketed
   * ANN results exactly verifiable.
   */
  def arithPlaneWeights(plane: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      val w = (1103515245L * (plane * 1000003L + (d + 1)) + 12345L) % 2147483647L
      if (w % 2 == 0) 1.0 else -1.0
    }

  /** `bits`-bit LSH bucket from arithmetic hyperplanes. `v` must be an
   * integer-quantized vector (see [[quantize]]) so the signed sums are
   * exact (integer-valued doubles < 2^53); each plane is one codegen'd
   * [[VectorDot]] against a constant weight vector. */
  def arithLshBucket(v: Column, bits: Int, dim: Int): Column =
    (0 until bits).map { p =>
      when(VectorDot(v.cast("array<double>"), typedLit(arithPlaneWeights(p, dim))) >= 0,
        lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
}
