package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the OTHER
  * tokenizer family production LLMs use beside BPE (Kudo 2018,
  * "Subword Regularization"; Kudo & Richardson 2018, SentencePiece).
  * Where BPE grows a vocabulary bottom-up by merging, unigram-LM
  * starts from an over-complete substring seed vocabulary and shrinks
  * it: EM re-estimates token probabilities from the corpus'
  * segmentations, then pruning keeps the highest-mass tokens.
  *
  * Spark-first scale shape, exactly [[Bpe]]'s: the corpus is touched
  * ONCE (the distinct-word frequency aggregation — vocabulary-bounded
  * output); everything after iterates over that small table. Each EM
  * iteration is one vocab-bounded driver collect (the token/cost
  * arrays, like BPE's 1-row winning-pair collect) plus one narrow
  * codegen'd map over the distinct words (the
  * [[graft.plans.UnigramSegment]] Viterbi kernel) and one hash
  * aggregation of token usages. Nothing corpus-scale ever enters the
  * loop.
  *
  * Determinism contract (oracle-replicated in full):
  *   - hard-EM (Viterbi) expectations: each word contributes its BEST
  *     segmentation, weighted by word frequency — the
  *     `UnigramSegment` tie-break law (min cost, then fewest tokens,
  *     then longest-token-first);
  *   - token costs are integer micro-nats:
  *     `floor(-1e6 * ln(cnt/total) + 0.5)` — one fixed-order double
  *     expression, same bits in Spark and DuckDB (the q_lm_ppl ln
  *     precedent);
  *   - seed/prune selection orders by (cnt DESC, token ASC) — total
  *     order, no RNG anywhere;
  *   - every single character stays in the vocabulary (coverage:
  *     unsegmentable words cannot arise on the training corpus);
  *     characters whose usage drops to zero re-enter with count 1.
  *
  * Reference scope: TFMV/GCS2Postgres has no tokenizer (no operators
  * at all — `/root/reference/src/db/db.go`); this is part of the
  * LLM-training-data family the engine adds beyond it.
  */
object Unigram {

  /** Occurrence-weighted counts of every substring of length
    * 1..`maxLen` of every distinct word (overlap-inclusive, weighted by
    * word frequency) — the over-complete seed the EM loop prunes. Pure
    * codegen (nested sequence/transform) over the vocab-bounded word
    * table.
    */
  def seedCounts(wf: DataFrame, maxLen: Int): DataFrame =
    wf.select(col("freq"), explode(flatten(transform(
        sequence(lit(1), least(lit(maxLen), length(col("word")))),
        l => transform(
          sequence(lit(1), length(col("word")) - l + 1),
          s => col("word").substr(s, l))))).as("token"))
      .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))

  /** Integer micro-nat costs from counts: ONE broadcast of the 1-row
    * total, then a narrow map — `cost = floor(-1e6*ln(cnt/total)+0.5)`.
    */
  def withCosts(counts: DataFrame): DataFrame =
    counts.crossJoin(broadcast(counts.agg(sum(col("cnt")).as("tot"))))
      .withColumn("cost",
        floor(lit(-1e6) * log(col("cnt").cast("double") /
          col("tot").cast("double")) + lit(0.5)).cast("long"))
      .drop("tot")

  /** The distinct single characters of the word table (the coverage
    * alphabet every vocabulary must retain).
    */
  private def alphabet(wf: DataFrame): DataFrame =
    wf.select(explode(split(col("word"), "")).as("token")).distinct()

  /** Viterbi-segment the distinct words under a (token, cost) vocab
    * collected to arrays — (word, freq, segs). */
  private def segmented(wf: DataFrame, vocab: DataFrame): DataFrame = {
    val v = vocab.select("token", "cost").orderBy("token").collect()
    val toks = v.map(_.getString(0)).toSeq
    val costs = v.map(_.getLong(1)).toSeq
    wf.select(col("word"), col("freq"),
      graft.plans.UnigramSegment(col("word"), toks, costs).as("segs"))
  }

  /** Train: seed -> `emIters` hard-EM iterations -> prune to
    * `vocabSize` (plus the alphabet) -> final costs. Returns
    * (token, cnt, cost) — cnt is the token's Viterbi usage mass from
    * the last estimation.
    */
  def train(docs: DataFrame, vocabSize: Int, seedMaxLen: Int = 4,
            seedSize: Int = 150, emIters: Int = 2,
            scriptAware: Boolean = false): DataFrame = {
    require(vocabSize > 0 && seedSize >= vocabSize && emIters >= 0,
      s"need 0 < vocabSize <= seedSize, got $vocabSize/$seedSize")
    val wf = Bpe.wordFreq(docs, scriptAware).localCheckpoint(true)
    val chars = alphabet(wf)
    val seed0 = seedCounts(wf, seedMaxLen).localCheckpoint(true)
    // seed selection: top-seedSize substrings by mass, plus the
    // alphabet (carrying their true seed counts)
    val top = seed0.orderBy(col("cnt").desc, col("token").asc)
      .limit(seedSize)
    var vocab = withCosts(
        top.unionByName(seed0.join(chars, Seq("token"), "left_semi"))
          .distinct())
      .localCheckpoint(true)
    for (_ <- 1 to emIters) {
      val usage = segmented(wf, vocab)
        .select(col("freq"), explode(col("segs")).as("token"))
        .groupBy(col("token")).agg(sum(col("freq")).as("cnt"))
        .localCheckpoint(true)
      // coverage floor: alphabet chars with zero Viterbi usage re-enter
      // at count 1 (they must stay segmentable-to)
      val floorChars = chars.join(usage, Seq("token"), "left_anti")
        .withColumn("cnt", lit(1L))
      vocab = withCosts(usage.unionByName(floorChars))
        .localCheckpoint(true)
    }
    // prune: keep the vocabSize highest-mass tokens plus the alphabet,
    // then recompute costs over the kept mass
    val kept = vocab.orderBy(col("cnt").desc, col("token").asc)
      .limit(vocabSize).select("token", "cnt")
      .unionByName(vocab.join(chars, Seq("token"), "left_semi")
        .select("token", "cnt"))
      .distinct()
    withCosts(kept)
  }

  /** Tokenizer fertility per group under a trained vocab — the
    * side-by-side row for [[Bpe.fertility]] (same output shape:
    * n_words, n_chars, token total), the comparison a pipeline runs
    * before choosing the tokenizer family. Vocab collects once
    * (vocab-bounded); the corpus streams through one explode + one
    * broadcast word-join + one aggregation.
    */
  def fertility(docs: DataFrame, vocab: DataFrame, groupCol: Column,
                keyName: String = "lang",
                scriptAware: Boolean = false): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"), scriptAware)
    val nsub = segmented(
        docs.select(explode(toks).as("word"))
          .filter(length(col("word")) > 0).distinct()
          .withColumn("freq", lit(1L)),
        vocab)
      .select(col("word"), size(col("segs")).as("n_sub"))
    docs.select(groupCol.as(keyName),
        explode(toks).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(nsub), Seq("word"), "left")
      .groupBy(col(keyName))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_chars"),
        sum(coalesce(col("n_sub").cast("long"), length(col("word"))))
          .as("n_unigram_tokens"))
  }
}
