package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash utilities for dedup / fingerprinting.
  *
  * Two tiers:
  *   - `stableHash60`: md5-based 60-bit hash, bit-identical in any engine
  *     that has md5 (DuckDB oracle: `CAST('0x'||substr(md5(x),1,15) AS
  *     BIGINT)`). Used in oracle-checked queries.
  *   - `fastHash`: Spark's codegen'd xxhash64 — the production hot path
  *     (no md5 byte-array allocation, stays inside whole-stage codegen).
  *     Same distributional properties; not cross-engine stable.
  *
  * Both are deterministic across runs/partitions (no seeds from time or
  * randomness), which MinHash/SimHash require for reproducible signatures.
  */
object StableHash {

  /** 60-bit stable hash of a string column: first 15 hex chars of md5,
    * parsed base-16. Positive, < 2^60.
    */
  def stableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Production-path hash (codegen'd, no cross-engine guarantee). */
  def fastHash(c: Column): Column = xxhash64(c)

  /** Driver-side twin of [[stableHash60]] — same md5 / first-15-hex /
    * base-16 rule on the UTF-8 bytes, for deriving deterministic
    * CONSTANTS (e.g. random-projection signs) that plans embed as
    * literals and oracles replay with the hashSql fragment.
    * StableHashSpec pins the column/local agreement.
    */
  def stableHash60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Mersenne prime 2^31 - 1: modulus for minhash permutations.
    * (a * (h mod p) + b) mod p stays under 2^62 — no 64-bit overflow.
    */
  val MinhashPrime: Long = 2147483647L

  /** Deterministic permutation coefficients for minhash: a fixed affine
    * family keyed by permutation index; any fixed coprime set works —
    * determinism across engines and runs is what matters.
    */
  def permA(i: Int): Long = 2L * i + 1
  def permB(i: Int): Long = 1000003L * (i + 1) % MinhashPrime
}
