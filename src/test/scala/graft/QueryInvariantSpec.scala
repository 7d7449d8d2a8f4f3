package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the SparkEntry queries added beyond the core set:
  * grouping sets, sliding windows, range join, exact percentiles,
  * edit-distance pairs, pivot, correlated EXISTS, IEEE-safe scalar math.
  * (Cell-exact verification is the DuckDB oracle gate; these specs pin the
  * structural semantics that the oracle's hash-compare can't explain when
  * they break.)
  */
class QueryInvariantSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf())

  test("grouping sets: one grouping per declared set, null pattern matches") {
    val rows = q("q_grouping_sets").collect()
    // (flag) sets: g_flag=0,g_status=1 and l_linestatus null
    val byFlag = rows.filter(r => r.getInt(4) == 0 && r.getInt(5) == 1)
    assert(byFlag.nonEmpty && byFlag.forall(_.isNullAt(1)))
    val byStatus = rows.filter(r => r.getInt(4) == 1 && r.getInt(5) == 0)
    assert(byStatus.nonEmpty && byStatus.forall(_.isNullAt(0)))
    val grand = rows.filter(r => r.getInt(4) == 1 && r.getInt(5) == 1)
    assert(grand.length == 1 && grand.head.isNullAt(0) && grand.head.isNullAt(1))
  }

  test("sliding 1h/30m window: every event is counted exactly twice") {
    val events = engine.Readers.events(spark, sf()).count()
    val windowed = q("q_event_sliding")
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(windowed == 2 * events)
  }

  test("range join: bands partition the price domain (row-preserving)") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet").count()
    val banded = q("q_join_range")
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(banded == orders)
  }

  test("percentiles are monotone and bounded by group min/max") {
    q("q_percentile").collect().foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("editdist pairs: k1 < k2, dist in [0, 2], and dist=0 means equal names") {
    val rows = q("q_editdist").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val d = r.getInt(4)
      assert(d >= 0 && d <= 2)
      if (d == 0) assert(r.getString(2) == r.getString(3))
    }
  }

  test("pivot: wide counts re-sum to the orders rowcount") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet").count()
    val total = q("q_pivot")
      .agg(sum(coalesce(col("F"), lit(0L)) + coalesce(col("O"), lit(0L)) +
        coalesce(col("P"), lit(0L)))).collect().head.getLong(0)
    assert(total == orders)
  }

  test("EXISTS: every returned customer has an urgent order and no P order") {
    val got = q("q_exists").select(col("c_custkey")).collect()
      .map(_.getLong(0)).toSet
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val pending = orders.filter(col("o_orderstatus") === "P")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    assert(got.subsetOf(urgent -- pending))
  }

  test("LSH cosine pairs: exact precision (subset of brute-force gate)") {
    import graft.functions.VectorFunctions.qcosineAtLeast
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val lsh = SparkEntry.queries("q_dedup_lsh")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    val brute = a.join(b, col("v1") < col("v2"))
      .filter(qcosineAtLeast(col("e1"), col("e2"), 4, 10))
      .select(col("v1"), col("v2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH must never emit a below-threshold pair")
    // banding with 3 bits/band keeps recall usable on this corpus
    assert(lsh.size * 2 >= brute.size,
      s"recall collapsed: lsh=${lsh.size} brute=${brute.size}")
  }

  test("driver smoke contract: entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("hll sketch rollup: union of partials == one global sketch, " +
       "estimate near exact") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val partial = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(expr("hll_sketch_agg(l_suppkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    val global = li
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_suppkey))"))
      .head().getLong(0)
    val exact = li.select("l_suppkey").distinct().count()
    assert(partial == global, "sketch merge must be lossless")
    assert(math.abs(partial - exact) <= math.max(1L, exact / 20),
      s"estimate $partial vs exact $exact")
  }

  test("connected components: chain, clique, and two isolated pairs") {
    import spark.implicits._
    // chain 1-2-3-4, clique {10,11,12}, pair (20,21)
    // self-loops ((3,3) in a real component, (30,30) isolated) carry no
    // merge information: BOTH paths must drop them identically — node 30
    // appears in no output row
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (20L, 21L), (3L, 3L), (30L, 30L)).toDF("d1", "d2")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // union-find fast path (small graph) ...
    val cc = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == want)
    // ... and the distributed large/small-star path must agree
    val ccDist = graft.operators.Dedup
      .connectedComponents(pairs, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccDist == want)
  }

  test("connected components: 120-node path converges distributed " +
       "(diameter >> round budget of naive label propagation)") {
    import spark.implicits._
    // a single path 1-2-3-...-120: min-label propagation moves the label
    // one hop per round (would need 119 rounds); large/small-star
    // contraction collapses it in O(log n)
    val pairs = (1L until 120L).map(i => (i, i + 1)).toDF("d1", "d2")
    val cc = graft.operators.Dedup
      .connectedComponents(pairs, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == (1L to 120L).map(_ -> 1L).toMap)
  }

  test("keepCanonical keeps exactly one doc per cluster plus all unpaired") {
    import spark.implicits._
    val docs = (1L to 8L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 5L), (5L, 7L)).toDF("d1", "d2")  // one cluster
    val kept = graft.operators.Dedup.keepCanonical(docs, pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 6L, 8L))  // 5,7 deduped into 2
  }

  test("near-dup dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val once = Dedup.keepCanonical(docs, Dedup.jaccardPairs(docs, 0.3))
    val twice = Dedup.keepCanonical(once, Dedup.jaccardPairs(once, 0.3))
    val a = once.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = twice.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.size < docs.count())  // the first pass actually removed dups
  }

  test("hash split: disjoint, exhaustive, stable under repartitioning") {
    import graft.operators.Sampling
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val (tr, ho) = Sampling.splitByHash(d, col("doc_id"), 10, 8)
    assert(tr.count() + ho.count() == d.count())
    assert(tr.select("doc_id").join(ho.select("doc_id"), "doc_id").count() == 0)
    val trIds = tr.select("doc_id").collect().map(_.getLong(0)).toSet
    val trIds2 = Sampling.splitByHash(d.repartition(7), col("doc_id"), 10, 8)
      ._1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trIds == trIds2, "split moved rows after a repartition")
  }

  test("stratified sample applies per-stratum rates (en kept more often)") {
    import graft.operators.Sampling
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
    val kept = Sampling.stratifiedSample(d, col("doc_id"), col("lang"),
      Map("en" -> 5), defaultNum = 2, den = 10)
    val keptEn = kept.filter(col("lang") === "en").count().toDouble /
      d.filter(col("lang") === "en").count()
    val keptOther = kept.filter(col("lang") =!= "en").count().toDouble /
      d.filter(col("lang") =!= "en").count()
    assert(keptEn > 0.35 && keptEn < 0.65, s"en rate $keptEn far from 0.5")
    assert(keptOther > 0.08 && keptOther < 0.35,
      s"other rate $keptOther far from 0.2")
  }

  test("scalar math: floor-rounding produces at most the declared scale") {
    q("q_scalar_math").limit(500).collect().foreach { r =>
      val disc = r.getDouble(2)
      assert((disc * 100 - math.rint(disc * 100)).abs < 1e-9)
    }
  }

  test("kmeans: 8 cells, members cover the corpus exactly once") {
    val rows = q("q_kmeans").collect()
    assert(rows.length == 8)
    val corpus = spark.read.parquet(s"${sf()}/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == corpus)
  }

  test("pmi: scores descend and every collocation meets minCount") {
    val rows = q("q_pmi").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(_.getDouble(5))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getLong(2) >= 5)) // c_xy >= minCount
  }

  test("entropy: bounded by ln(n_types) and zero for single-type docs") {
    q("q_entropy").collect().foreach { r =>
      val (types, h) = (r.getLong(2), r.getDouble(3))
      assert(h >= -1e-6 && h <= math.log(types.toDouble) + 1e-6)
    }
  }

  test("bloom join: result keys are exactly the high-balance suppliers " +
       "with lineitems") {
    val keys = q("q_bloom_join").collect().map(_.getLong(0)).toSet
    val expect = spark.read.parquet(s"${sf()}/supplier.parquet")
      .filter(col("s_acctbal") > 8000)
      .join(spark.read.parquet(s"${sf()}/lineitem.parquet")
        .select(col("l_suppkey").as("s_suppkey")).distinct(),
        Seq("s_suppkey"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(keys == expect)
  }

  test("ensemble dedup: survivors + dropped == corpus; canonical ids kept") {
    val survivors = q("q_dedup_ensemble").collect().map(_.getLong(0)).toSet
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(corpus))
    // every exact-duplicate group keeps exactly its minimum id
    val dupGroups = spark.read.parquet(s"${sf()}/documents.parquet")
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) > 1)
      .collect().map(_.getSeq[Long](1))
    dupGroups.foreach { ids =>
      assert(survivors.contains(ids.min))
      assert(ids.filterNot(_ == ids.min).forall(!survivors.contains(_)))
    }
  }

  test("resample: per-cell n sums to the event count") {
    val events = engine.Readers.events(spark, sf()).count()
    assert(q("q_resample").agg(sum(col("n"))).collect().head.getLong(0)
      == events)
  }
}
