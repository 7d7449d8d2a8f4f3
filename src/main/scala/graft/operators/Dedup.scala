package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StableHash._
import graft.operators.TextAnalysis.shingleHashes

/** Deduplication operators for LLM training-data pipelines, each designed
  * around its shuffle shape at 100 TB:
  *
  *   - exact: one hash-partitioned groupBy on the dedup key (map-side
  *     partial aggregation halves the shuffle).
  *   - n-gram Jaccard: inverted-index self-join on shingle hashes — the
  *     shuffle is by shingle, so common-shingle skew is the risk; callers
  *     cap posting-list length (`maxPostings`) the way web-dedup pipelines
  *     drop ubiquitous shingles.
  *   - MinHash+LSH: constant-size signatures (k longs/doc) replace the
  *     full shingle index; candidate generation shuffles only
  *     (band, bandHash) keys. The classic 100-TB near-dup path.
  *   - SimHash: one 64-bit fingerprint/doc; banding into 4×16-bit keys is
  *     EXACT for hamming<=3 by pigeonhole — no recall loss, tiny shuffle.
  *   - embedding cosine: blocked all-pairs (here by `label`; in prod by
  *     coarse quantizer cell) with exact integer-quantized verification.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per key. One shuffle. */
  def exact(df: DataFrame, key: String, id: String): DataFrame =
    df.groupBy(col(key))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Docs with distinct-shingle-hash arrays attached (narrow map). */
  def withShingleSets(docs: DataFrame, k: Int = 3,
                      hash: Column => Column = stableHash60): DataFrame =
    docs.withColumn("sh", shingleHashes(col("text"), k, hash))

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join.
    * Returns (d1, d2, inter, n1, n2, jaccard) for jaccard >= tau.
    * `maxPostings` drops shingles shared by more than that many docs
    * (ubiquitous-shingle skew guard; 0 = keep all, exact).
    */
  def jaccardPairs(docs: DataFrame, tau: Double, k: Int = 3,
                   maxPostings: Int = 0): DataFrame = {
    val sized = withShingleSets(docs, k)
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("n"))
    val posts0 = sized.select(col("doc_id"), col("n"),
      explode(col("sh")).as("h"))
    val posts =
      if (maxPostings <= 0) posts0
      else {
        val common = posts0.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxPostings).select(col("h"))
        posts0.join(common, Seq("h"), "left_anti")
      }
    val a = posts.select(col("doc_id").as("d1"), col("n").as("n1"), col("h"))
    val b = posts.select(col("doc_id").as("d2"), col("n").as("n2"), col("h"))
    a.join(b, a("h") === b("h") && a("d1") < b("d2"))
      .groupBy(col("d1"), col("d2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("d1"), col("d2"), col("inter"), col("n1"), col("n2"),
        col("jaccard"))
  }

  /** MinHash signature: for permutation i, min over shingle hashes of
    * (a_i * (h mod p) + b_i) mod p. Constant k longs per doc.
    */
  def minhashSignature(sh: Column, numPerms: Int): Column = {
    val p = MinhashPrime
    val perms = (0 until numPerms).map { i =>
      array_min(transform(sh,
        h => (lit(permA(i)) * (h % p) + lit(permB(i))) % p))
    }
    array(perms: _*)
  }

  /** LSH band keys: split the signature into `bands` bands of
    * `rows = numPerms/bands` and hash each band to one stable long.
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      stableHash60(concat_ws(",",
        lit(b.toString) +: (0 until rows).map(r =>
          element_at(sig, b * rows + r + 1).cast("string")): _*))
    }: _*)

  /** MinHash+LSH near-dup pairs: signature -> band keys -> candidates
    * (docs sharing any band) -> exact Jaccard verification on the
    * shingle sets. Deterministic end-to-end (fixed permutation family).
    */
  def minhashPairs(docs: DataFrame, tau: Double, k: Int = 3,
                   numPerms: Int = 32, bands: Int = 16): DataFrame = {
    val rows = numPerms / bands
    val sigd = withShingleSets(docs, k)
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        lshBandKeys(minhashSignature(col("sh"), numPerms), bands, rows)
          .as("bandkeys"))
    val banded = sigd.select(col("doc_id"), col("sh"),
      posexplode(col("bandkeys")).as(Seq("band", "bk")))
    val l = banded.select(col("doc_id").as("d1"), col("sh").as("sh1"),
      col("band"), col("bk"))
    val r = banded.select(col("doc_id").as("d2"), col("sh").as("sh2"),
      col("band"), col("bk"))
    val cands = l.join(r, Seq("band", "bk"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("sh1"), col("sh2"))
      .dropDuplicates("d1", "d2")
    cands
      .withColumn("inter",
        size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** SimHash 64-bit fingerprint over token hashes: bit j of the result is
    * set iff the sum over tokens of (bit j set ? +1 : -1) is positive.
    * Expressed as a fold over the token-hash array producing 64 vote
    * counters — a narrow map, no shuffle.
    */
  def simhash(tokenHashes: Column): Column = {
    // bit positions unrolled statically: shiftright/shiftleft take constant
    // shift amounts, and constant-folding keeps this inside codegen
    val votes = aggregate(
      tokenHashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(j =>
          shiftright(h, j).bitwiseAND(lit(1L)) * 2 - 1): _*),
        _ + _))
    val bitCols = (0 until 64).map { j =>
      when(element_at(votes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist (<= 3).
    * Banding into 4 disjoint 16-bit quarters is exact by pigeonhole:
    * distance <= 3 forces at least one identical quarter. Shuffle is by
    * (quarter index, 16-bit value) — tiny keys, then exact verification.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4x16 banding is only exact for distance <= 3")
    val fp = docs
      .withColumn("fp", simhash(transform(
        TextAnalysis.tokens(col("text")), stableHash60(_))))
      .select(col("doc_id"), col("fp"))
    val banded = fp.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("fp"), q * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("q", "qv")))
    val l = banded.select(col("doc_id").as("d1"), col("fp").as("fp1"),
      col("q"), col("qv"))
    val r = banded.select(col("doc_id").as("d2"), col("fp").as("fp2"),
      col("q"), col("qv"))
    l.join(r, Seq("q", "qv"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("fp1"), col("fp2"))
      .dropDuplicates("d1", "d2")
      .withColumn("hamming",
        bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /** Embedding near-dup pairs: blocked all-pairs join with exact
    * integer-quantized cosine >= tauNum/tauDen. `blockCol` bounds the
    * quadratic term (prod: coarse-quantizer cell; here: label).
    */
  def embeddingPairs(embs: DataFrame, tauNum: Int, tauDen: Int,
                     blockCol: String = "label"): DataFrame = {
    import graft.functions.VectorFunctions.qcosineAtLeast
    val a = embs.select(col(blockCol).as("blk"), col("vec_id").as("v1"),
      col("embedding").as("e1"))
    val b = embs.select(col(blockCol).as("blk"), col("vec_id").as("v2"),
      col("embedding").as("e2"))
    a.join(b, Seq("blk"))
      .filter(col("v1") < col("v2"))
      .filter(qcosineAtLeast(col("e1"), col("e2"), tauNum, tauDen))
      .select(col("blk"), col("v1"), col("v2"))
  }
}
