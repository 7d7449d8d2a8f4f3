package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen-friendly higher-order functions (`zip_with` / `aggregate` /
  * `transform`) — no Scala UDFs in the hot path.
  *
  * Two tiers, same split as StableHash:
  *   - quantized integer forms (`qdot`, `qnorm2`): each float is
  *     floor(x * 1000) as a long; dot/norm are exact integer arithmetic,
  *     bit-identical in any engine (DuckDB oracle parity) and immune to
  *     float-summation-order drift across partitions.
  *   - double forms (`dot`, `cosine`): production similarity math.
  */
object VectorFunctions {

  /** Element-wise quantization: FLOAT -> floor(x*1000) LONG.
    * float->double widening and *1000.0 are exact IEEE ops, so every
    * engine computes the identical integer. Backed by the codegen'd
    * QuantizeFloats expression — the HOF form
    * (`transform(v, x => floor(x * scale))`) evaluates its lambda
    * interpreted per element, and quantization prefixes every vector
    * operator's hot loop.
    */
  def quantize(v: Column, scale: Int = 1000): Column =
    graft.plans.QuantizeFloats(v, scale)

  /** Integer dot product of two quantized vectors. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(quantize(a), quantize(b), _ * _), lit(0L), _ + _)

  /** Integer squared norm of a quantized vector. */
  def qnorm2(a: Column): Column =
    aggregate(transform(quantize(a), x => x * x), lit(0L), _ + _)

  /** Double dot product (production path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), _ + _)

  /** Double cosine similarity (production path). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Quantized-cosine threshold predicate: cosine(a,b) >= tau, evaluated in
    * exact decimal arithmetic on quantized integers:
    *   qdot^2 * tauDen^2 >= tauNum^2 * qnorm2(a) * qnorm2(b)  (and qdot > 0)
    * e.g. tau = 0.4 -> tauNum=4, tauDen=10. No floats anywhere, so the
    * comparison is engine-portable. DECIMAL(38,0) avoids 64-bit overflow
    * (qdot^2 can exceed Long.MaxValue).
    */
  def qcosineAtLeast(a: Column, b: Column, tauNum: Int, tauDen: Int): Column =
    qcosineGate(qdot(a, b), qnorm2(a), qnorm2(b), tauNum, tauDen)

  /** The threshold gate on precomputed dot/norms (see qcosineAtLeast). */
  def qcosineGate(d: Column, qn1: Column, qn2: Column,
                  tauNum: Int, tauDen: Int): Column = {
    val d19 = d.cast("decimal(19,0)")
    val lhs = (d19 * d19) * lit(tauDen.toLong * tauDen)
    val rhs = (qn1.cast("decimal(19,0)") * qn2.cast("decimal(19,0)")) *
      lit(tauNum.toLong * tauNum)
    d > 0 && lhs >= rhs
  }

  /** Deterministic random-hyperplane family for cosine LSH: plane `j` is
    * `dim` integers in [-1000, 1000] from a fixed affine sequence — no
    * RNG, so signatures are identical across runs, engines, and the
    * DuckDB oracle (which regenerates the family in SQL). Shared by
    * `Dedup.lshCosinePairs` and `Similarity.lshTopK`.
    */
  def hyperplane(j: Int, dim: Int): Seq[Long] = (0 until dim).map(d =>
    (1103515245L * (j * dim + d) + 12345L) % 2001L - 1000L)

  /** Per-band LSH keys for a quantized vector column: `bits` sign bits
    * (one per hyperplane) packed `bits/bands` per band into small ints.
    */
  def lshBandKeys(qv: Column, bits: Int, bands: Int, dim: Int): Seq[Column] = {
    require(bits % bands == 0, "bits must split evenly into bands")
    val perBand = bits / bands
    val bitCols = (0 until bits).map { j =>
      when(graft.plans.LongArrayDot(qv, typedLit(hyperplane(j, dim))) >= 0,
        lit(1L)).otherwise(lit(0L))
    }
    (0 until bands).map { b =>
      (0 until perBand).map(i => bitCols(b * perBand + i) * (1L << i))
        .reduce(_ + _)
    }
  }

  /** Data-sized banding for the hyperplane-LSH family: total `bits`
    * such that per-band-bucket occupancy n / 2^(bits/bands) stays near
    * `targetBucket` as the corpus grows. At a FIXED bits the candidate
    * count is ~n²/2^(bits/bands) — quadratic; sizing bits/band =
    * ceil(log2(n / targetBucket)) returns it to ~n·targetBucket —
    * linear. Measured (PLANS.md, sf3 sweep, 60k vectors): autoBits
    * gives 24, the sweep's best point — lshCosinePairs 252.9s at the
    * fixed default vs 32.7s at 24. Capped at 24 bits/band (16M
    * buckets/band ≈ 10^10 vectors at targetBucket=1024) — band keys
    * stay well inside one Long per band.
    */
  def autoBits(n: Long, targetBucket: Int = 1024, bands: Int = 4): Int = {
    require(n >= 0, s"corpus size must be non-negative, got $n")
    require(targetBucket > 0, s"targetBucket must be positive, got $targetBucket")
    require(bands > 0, s"bands must be positive, got $bands")
    // n == 0: min banding (1 bit/band) — an empty corpus yields an
    // empty result either way; throwing here would make the default
    // path stricter than any fixed-bits call
    if (n == 0) return bands
    val perBand = math.ceil(
      math.log(n.toDouble / targetBucket) / math.log(2.0)).toInt
    bands * math.min(math.max(perBand, 1), 24)
  }
}
