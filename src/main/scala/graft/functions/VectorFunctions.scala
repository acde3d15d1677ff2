package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions: dot / norm / cosine and random-
  * hyperplane LSH signatures, all built from Spark higher-order array
  * functions (`zip_with`, `aggregate`, `transform`) so they stay inside
  * codegen — no UDFs. Math is done in double regardless of the stored
  * float element type (cast once up front).
  */
object VectorFunctions {

  private def d(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via composable built-ins — reference form; hot paths use the
    * fused codegen expression [[VectorExprFunctions.cosine_fused]].
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused one-pass cosine (codegen'd); inputs cast to array<double>. */
  def cosineFused(a: Column, b: Column): Column =
    VectorExprFunctions.cosine_fused(d(a), d(b))

  /** Symmetric int8 quantization as a DataFrame transform: codes =
    * round(x / scale) with scale = max|x| / 127 — 4× smaller than float32
    * on the wire and in the ANN index. Adds `out` as struct(scale, codes).
    *
    * Two projections on purpose: the scale becomes a per-row ATTRIBUTE
    * before the codes lambda references it. Folding both into one
    * expression (see [[quantizeInt8]]) re-evaluates the O(d) max-abs fold
    * per element — O(d²)/vector, the interpreted-HOF pitfall.
    */
  def quantizeInt8Col(df: org.apache.spark.sql.DataFrame, vec: Column,
      out: String): org.apache.spark.sql.DataFrame = {
    val sCol = s"_${out}_scale"
    df.withColumn(sCol, greatest(
        aggregate(d(vec), lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0,
        lit(java.lang.Double.MIN_VALUE)))
      .withColumn(out, struct(col(sCol).as("scale"),
        transform(d(vec), x => round(x / col(sCol)).cast("tinyint")).as("codes")))
      .drop(sCol)
  }

  /** Single-Column form of [[quantizeInt8Col]] — convenient for small
    * vectors, but O(d²) per row (the scale sub-expression re-evaluates
    * inside the lambda); prefer the DataFrame form on real embeddings.
    */
  def quantizeInt8(v: Column): Column = {
    // MinPositiveValue guard: an all-zero vector quantizes to zeros
    // instead of NaN codes from 0/0
    val scale = greatest(
      aggregate(d(v), lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0,
      lit(java.lang.Double.MIN_VALUE))
    struct(scale.as("scale"),
      transform(d(v), x => round(x / scale).cast("tinyint")).as("codes"))
  }

  /** Inverse of [[quantizeInt8]]: codes * scale, back to array<double>
    * (max error scale/2 per component).
    */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  /** Deterministic pseudo-random hyperplanes: `planes(seed, nPlanes, dim)`
    * via splitmix64 mapped to [-1, 1). Generated driver-side (tiny), used
    * as a literal so the comparison is pure codegen per row.
    */
  def planes(seed: Long, nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { j =>
        val h = Hash64.mix(seed + p.toLong * 1000003L + j.toLong)
        // top 53 bits -> [0,1) -> [-1,1)
        (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }

  /** Sign-of-dot-product LSH signature: bit i = (v · plane_i) > 0, packed
    * into a long. Cosine-similar vectors collide with high probability
    * (random-hyperplane LSH, Charikar '02) — the bucketing primitive for
    * near-dup detection and ANN at corpus scale.
    */
  def hyperplaneSig(v: Column, planeLit: Seq[Seq[Double]]): Column = {
    val ps = typedlit(planeLit)
    val nDim = planeLit.head.length
    // fail fast on a dim mismatch: zip_with would null-pad the shorter
    // side, silently zeroing every signature (all vectors collapse into
    // one bucket — empty or quadratic candidate sets, no error)
    val guarded = when(size(d(v)) =!= nDim, raise_error(concat(
      lit(s"hyperplaneSig: vector length "), size(d(v)).cast("string"),
      lit(s" != plane dim $nDim")))).otherwise(d(v))
    // big-endian bit pack: acc = acc*2 + (dot > 0)
    aggregate(
      transform(ps, p => when(dot(guarded, p) > 0, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc * 2 + x)
  }
}
