package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  // a cleanly separable teacher: label = doc contains the token "bad";
  // with enough buckets the trainer must find bad's bucket and weight it
  private val corpus = docs(
    "good clean text here", "more good text here", "clean good words",
    "bad noisy junk here", "bad bad junk words", "junk bad noise",
    "good clean words here", "noise bad junk")
  private val label = col("text").contains("bad")

  test("featurize: y flags the label, features are tf/(tf+5) in [0,1)") {
    val f = Classifier.featurize(corpus, label, buckets = 4)
    assert(f.columns.toSeq == Seq("doc_id", "y", "f00", "f01", "f02", "f03"))
    val rows = f.orderBy("doc_id").collect()
    assert(rows.map(_.getDouble(1)).toSeq ==
      Seq(0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 1.0))
    // every feature is a squash of a non-negative count: [0, 1)
    for (r <- rows; j <- 2 until 6) {
      assert(r.getDouble(j) >= 0.0 && r.getDouble(j) < 1.0)
    }
    // a 4-token doc has total tf 4: sum of un-squashed tf equals 4
    // (squash is monotone, so tf = 5f/(1-f) must sum back)
    val tfSum = (2 until 6).map { j =>
      val f0 = rows(0).getDouble(j); 5.0 * f0 / (1.0 - f0)
    }.sum
    assert(math.abs(tfSum - 4.0) < 1e-9)
  }

  test("train: mse decreases and the learned model separates the " +
    "classes better than the zero init") {
    val traj = Classifier.train(
      Classifier.featurize(corpus, label, buckets = 8), iters = 40, lr = 1.5)
    assert(traj.size == 40)
    val mses = traj.map(_.mse)
    assert(mses.last < mses.head,
      s"training must reduce loss: ${mses.head} -> ${mses.last}")
    // the zero init scores everything 0.5; the trained model must rank
    // every positive above every negative on this separable corpus
    val scored = Classifier.trainAndScore(corpus, label,
      buckets = 8, iters = 40, lr = 1.5)
      .join(corpus, "doc_id")
      .select(col("q_score"), label.cast("int").as("y"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val pos = scored.filter(_._2 == 1).map(_._1)
    val neg = scored.filter(_._2 == 0).map(_._1)
    assert(pos.min > neg.max,
      s"separable corpus must separate: pos=${pos.toSeq} neg=${neg.toSeq}")
  }

  test("trainTrajectory output is deterministic across runs and " +
    "independent of input partitioning (exact integer gradient sums)") {
    val a = Classifier.trainTrajectory(corpus, label, buckets = 4,
      iters = 10, lr = 1.5).orderBy("iter", "term").collect()
    val b = Classifier.trainTrajectory(corpus.repartition(7), label,
      buckets = 4, iters = 10, lr = 1.5).orderBy("iter", "term").collect()
    // bitwise-identical doubles, not approximately equal — the
    // quantized-sum contract
    assert(a.toSeq == b.toSeq)
  }

  test("trainAndScore keep equals the margin sign") {
    val s = Classifier.trainAndScore(corpus, label,
      buckets = 8, iters = 20, lr = 1.5).collect()
    // q_score is rounded to 1e-6 AFTER keep is decided on the raw
    // probability, so assert the implication away from the boundary
    for (r <- s; score = r.getDouble(1) if score != 0.5)
      assert((r.getInt(2) == 1) == (score > 0.5))
  }

  test("train rejects an empty corpus and bad iteration counts") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Classifier.train(Classifier.featurize(empty, label))
    }
    intercept[IllegalArgumentException] {
      Classifier.train(Classifier.featurize(corpus, label), iters = 0)
    }
  }
}
