package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference for the UnigramSegment tie-break law: every
    * segmentation enumerated, ordered by (cost, ntok, longest-token-
    * first) — the exact ORDER BY the DuckDB oracle runs.
    */
  private def bruteBest(word: String, vocab: Map[String, Long])
      : Option[List[String]] = {
    def all(s: String): List[List[String]] =
      if (s.isEmpty) List(Nil)
      else (1 to s.length).toList.flatMap { l =>
        val t = s.take(l)
        if (vocab.contains(t)) all(s.drop(l)).map(t :: _) else Nil
      }
    val cands = all(word)
    import scala.math.Ordering.Implicits._
    if (cands.isEmpty) None
    else Some(cands.minBy(p =>
      (p.map(vocab).sum, p.size, p.map(t => -t.length))))
  }

  test("UnigramSegment == brute-force enumeration under the " +
       "(cost, ntok, longest-first) order, across many vocab/word combos") {
    val rnd = new scala.util.Random(42)
    val alpha = "abc"
    for (_ <- 1 to 50) {
      val words = (1 to 8).map(_ =>
        (1 to (1 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(3))).mkString)
      val toks = (words.flatMap(w =>
        (0 until w.length).flatMap(i =>
          (1 to math.min(3, w.length - i)).map(l => w.substring(i, i + l))))
        .distinct.filter(_ => rnd.nextBoolean()) ++ alpha.map(_.toString))
        .distinct.sorted
      val costs = toks.map(_ => 1L + rnd.nextInt(20))
      val vocab = toks.zip(costs).toMap
      val got = words.toDF("word")
        .select(col("word"),
          graft.plans.UnigramSegment(col("word"), toks, costs).as("segs"))
        .as[(String, Seq[String])].collect().toMap
      for (w <- words)
        assert(got(w).toList == bruteBest(w, vocab).get,
          s"word=$w vocab=$vocab got=${got(w)}")
    }
  }

  test("UnigramSegment: unsegmentable word is NULL, empty word is []") {
    val out = Seq("ab", "az", "").toDF("word")
      .select(graft.plans.UnigramSegment(col("word"),
        Seq("a", "b"), Seq(5L, 5L)).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(out(0) == Seq("a", "b"))
    assert(out(1) == null)
    assert(out(2) == Seq.empty)
  }

  test("train: alphabet always kept (full coverage — every corpus word " +
       "segments), deterministic across runs, vocab bounded") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val v1 = Unigram.train(docs, vocabSize = 60)
    val v2 = Unigram.train(docs, vocabSize = 60)
    val rows1 = v1.orderBy("token").collect().toSeq
    assert(rows1 == v2.orderBy("token").collect().toSeq)
    val toks = rows1.map(_.getString(0))
    val costs = rows1.map(_.getLong(2))
    // every single char of every corpus word is in the vocab
    val alphabet = Bpe.wordFreq(docs)
      .select(explode(split(col("word"), "")).as("c")).distinct()
      .as[String].collect().toSet
    assert(alphabet.subsetOf(toks.toSet))
    // therefore zero unsegmentable words
    val unseg = Bpe.wordFreq(docs)
      .select(graft.plans.UnigramSegment(col("word"), toks, costs).as("s"))
      .filter(col("s").isNull).count()
    assert(unseg == 0L)
    assert(toks.size <= 60 + alphabet.size)
  }

  test("fertility: same corpus denominators as Bpe.fertility (n_words, " +
       "n_chars identical — the side-by-side comparison is well-formed) " +
       "and tokens-per-word >= 1") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val uni = Unigram.fertility(docs, Unigram.train(docs, vocabSize = 60),
        col("lang")).orderBy("lang")
      .select("lang", "n_words", "n_chars", "n_unigram_tokens")
      .as[(String, Long, Long, Long)].collect()
    val (_, seg) = Bpe.trainMerges(docs, iters = 5)
    val bpe = Bpe.fertility(docs, seg, col("lang")).orderBy("lang")
      .select("lang", "n_words", "n_chars")
      .as[(String, Long, Long)].collect()
    assert(uni.map(u => (u._1, u._2, u._3)).toSeq == bpe.toSeq)
    assert(uni.forall(u => u._4 >= u._2)) // >= 1 token per word
  }
}
