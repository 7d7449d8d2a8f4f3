package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Deterministic synthetic-data generator that mirrors the driver
  * testdata's schemas and distributions (FIXTURES.md) at arbitrary scale
  * factors — the tool behind the sf1 (10x) scaling measurements in
  * PLANS.md. The driver's own generator is not available in-repo, so
  * this reproduces the measured shape of `/root/testdata/sf0.1`:
  *
  *   - documents: 31-word vocabulary soup, 10–100 words/doc, lang mix
  *     ~{en .44, es .15, fr .14, de .14, zh .13}, 20 sources, and ~1
  *     dup pair per 20 docs (mix of exact copies and one-word
  *     mutations — the measured sf0.01 corpus has 25 pairs / 500 docs,
  *     all at trigram-Jaccard ≥ 0.9, nothing between 0.1 and 0.9);
  *   - embeddings: RANDOM UNIT vectors (dim 64) with labels independent
  *     of geometry — measured driver data has avg pairwise cos ≈ 0.000,
  *     max ≈ 0.51, so high-cosine pairs are pure tail events with
  *     P(cos ≥ 0.4) ≈ 7e-4; pair-yield at a fixed threshold therefore
  *     grows ~quadratically in n BY CONSTRUCTION of the source data
  *     (scaling tables must report output rows alongside seconds);
  *   - TPC-H-ish star tables with the same key cardinalities per sf
  *     (sf1: 6M lineitem / 1.5M orders / 150k customer / 200k part /
  *     10k supplier) and the same value domains.
  *
  * Every row is a pure function of (table, row id) via a per-row seeded
  * RNG — output is identical for any partitioning, parallelism, or run
  * order. Usage: GenData <outDir> [sf=1.0]
  */
object GenData {

  /** The driver corpus' exact 31-word vocabulary (measured at sf0.1). */
  val Vocab: Array[String] = Array(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch", "dup")

  private val Langs = Array("en", "es", "fr", "de", "zh")
  private val LangCum = Array(0.436, 0.588, 0.730, 0.870, 1.0)
  private val Segments = Array("MACHINERY", "AUTOMOBILE", "HOUSEHOLD",
    "BUILDING", "FURNITURE")
  private val Priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val PTypes = Array("LARGE", "ECONOMY", "SMALL", "STANDARD",
    "MEDIUM")
  private val PAdj = Array("large", "hot", "blue", "red", "small", "cold",
    "green", "shiny")
  private val PNoun = Array("ring", "bolt", "gear", "cog", "pin", "rod",
    "cap", "nut")
  private val EventTypes = Array("click", "view", "signup", "purchase",
    "error")

  private def rng(table: Int, id: Long): java.util.Random =
    new java.util.Random(42L + table * 0x9E3779B97F4A7C15L + id)

  private def dayTs(baseMs: Long, days: Int): Timestamp =
    new Timestamp(baseMs + days * 86400000L)

  private val Epoch1995 = 788918400000L   // 1995-01-01 UTC
  private val Epoch2024 = 1704067200000L  // 2024-01-01 UTC

  // ---------------- documents ----------------

  private def baseWords(id: Long): Array[String] = {
    val r = rng(1, id)
    val n = 10 + r.nextInt(91)
    Array.fill(n)(Vocab(r.nextInt(Vocab.length)))
  }

  /** Final text: mostly the row's own soup; every 20th doc copies an
    * earlier doc's BASE text (60 % verbatim, 40 % with one word
    * mutated) — ~1 dup pair per 20 docs, trigram-Jaccard ≥ ~0.9, the
    * measured driver shape. Copying the base (never the final) text
    * keeps the recipe one level deep and pure.
    */
  def docText(id: Long): String = {
    val r = rng(2, id)
    if (id >= 50 && id % 20 == 17) {
      val src = id - 1 - r.nextInt(40)
      val w = baseWords(src)
      if (r.nextDouble() < 0.4)
        w(r.nextInt(w.length)) = Vocab(r.nextInt(Vocab.length))
      w.mkString(" ")
    } else baseWords(id).mkString(" ")
  }

  final case class Doc(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: Long)

  def doc(id: Long): Doc = {
    val r = rng(5, id)
    val text = docText(id)
    val p = r.nextDouble()
    val lang = Langs(LangCum.indexWhere(p <= _))
    Doc(id, text, lang, "src" + r.nextInt(20), text.length.toLong)
  }

  // ---------------- zipf-duplication documents ----------------
  //
  // The driver corpus' 31-word soup makes threshold near-dup pairs grow
  // ~n^2 BY CONSTRUCTION (any two docs share most trigrams at random).
  // This corpus models a realistic web-crawl duplication profile
  // instead: cluster sizes follow a truncated zeta distribution (one
  // 64-member head cluster, a harmonic tail, ~25% singletons per
  // 256-doc block), the vocabulary is 10,000 words so accidental
  // cross-cluster n-gram overlap is ~0, and cluster members carry 0-3
  // word substitutions off their leader. True near-dup pairs therefore
  // grow LINEARLY in n (fixed pair count per block), which is what the
  // time-per-output-pair scaling table in PLANS.md measures.

  private val ZipfBlock = 256

  /** Cluster index per slot within one block: sizes max(1, 64/k) until
    * 3/4 of the block is assigned, then singletons.
    */
  private[tools] val ZipfPattern: Array[Int] = {
    val sizes = scala.collection.mutable.ArrayBuffer[Int]()
    var k = 1
    var total = 0
    while (total < ZipfBlock * 3 / 4) {
      val s = math.min(math.max(1, 64 / k), ZipfBlock * 3 / 4 - total)
      sizes += s; total += s; k += 1
    }
    while (total < ZipfBlock) { sizes += 1; total += 1 }
    sizes.zipWithIndex.flatMap { case (s, ci) => Seq.fill(s)(ci) }.toArray
  }

  /** First slot of each cluster (the leader, whose text members copy). */
  private[tools] val ZipfLeaderSlot: Array[Int] = {
    val first = scala.collection.mutable.LinkedHashMap[Int, Int]()
    ZipfPattern.zipWithIndex.foreach { case (ci, slot) =>
      if (!first.contains(ci)) first(ci) = slot
    }
    ZipfPattern.map(first)
  }

  private def zipfWord(i: Int): String = "w" + i

  private def zipfBaseWords(leaderId: Long): Array[String] = {
    val r = rng(7, leaderId)
    val n = 30 + r.nextInt(51)
    Array.fill(n)(zipfWord(r.nextInt(10000)))
  }

  /** Doc text: leader text with 0-3 word substitutions (members only;
    * ~30% are verbatim copies). Pure function of id.
    */
  def zipfDocText(id: Long): String = {
    val block = id / ZipfBlock
    val slot = (id % ZipfBlock).toInt
    val leaderId = block * ZipfBlock + ZipfLeaderSlot(slot)
    val w = zipfBaseWords(leaderId)
    if (id != leaderId) {
      val r = rng(8, id)
      val subs = if (r.nextDouble() < 0.3) 0 else 1 + r.nextInt(3)
      var i = 0
      while (i < subs) {
        w(r.nextInt(w.length)) = zipfWord(r.nextInt(10000)); i += 1
      }
    }
    w.mkString(" ")
  }

  def zipfDoc(id: Long): Doc = {
    val r = rng(9, id)
    val text = zipfDocText(id)
    val p = r.nextDouble()
    val lang = Langs(LangCum.indexWhere(p <= _))
    Doc(id, text, lang, "src" + r.nextInt(20), text.length.toLong)
  }

  // ---------------- embeddings ----------------

  final case class Embedding(vec_id: Long, embedding: Array[Float],
                             label: Int)

  /** Random unit vector; label independent of geometry (measured driver
    * shape: labels carry no cosine signal).
    */
  def embedding(id: Long): Embedding = {
    val r = rng(6, id)
    val v = Array.fill(64)(r.nextGaussian())
    val norm = math.sqrt(v.map(x => x * x).sum)
    Embedding(id, v.map(x => (x / norm).toFloat), r.nextInt(10))
  }

  /** Planted-cluster unit vector — the shape REAL embedding corpora
    * have (topics/templates cluster; the random-unit-vector table is
    * IVF's documented worst case, so recall measured on it is a lower
    * bound). `nClusters` centers are random unit vectors seeded by
    * cluster id; each vector is its center plus per-dim Gaussian noise
    * with a PER-VECTOR sigma drawn log-uniform from [0.05, 0.3]
    * (re-normalized). The sigma spread matters: at a constant sigma
    * every intra-cluster cosine concentrates at 1/(1+σ²·dim) and any
    * tau gate is all-or-nothing; log-uniform sigmas spread pairwise
    * cosines over ~[0.15, 0.9] so dedup thresholds see a graded pair
    * population. Cluster sizes follow a u² power pick (skewed, like
    * topic frequency). Deterministic per (id, nClusters);
    * label = cluster % 10 so label-blocked operators see the geometry.
    */
  def clusteredEmbedding(id: Long, nClusters: Int): Embedding = {
    val r = rng(7, id)
    val c = math.min(nClusters - 1,
      (math.pow(r.nextDouble(), 2.0) * nClusters).toInt)
    val cr = rng(17, c.toLong)
    val center = Array.fill(64)(cr.nextGaussian())
    val cn = math.sqrt(center.map(x => x * x).sum)
    val sigma = 0.05 * math.pow(6.0, r.nextDouble())
    val v = center.map(x => x / cn + sigma * r.nextGaussian())
    val norm = math.sqrt(v.map(x => x * x).sum)
    Embedding(id, v.map(x => (x / norm).toFloat), c % 10)
  }

  // ---------------- star schema + events ----------------

  final case class Customer(c_custkey: Long, c_name: String,
                            c_nationkey: Int, c_acctbal: Double,
                            c_mktsegment: String)
  final case class Supplier(s_suppkey: Long, s_name: String,
                            s_nationkey: Int, s_acctbal: Double)
  final case class Part(p_partkey: Long, p_name: String, p_brand: String,
                        p_type: String, p_size: Int,
                        p_retailprice: Double)
  final case class Order(o_orderkey: Long, o_custkey: Long,
                         o_orderstatus: String, o_totalprice: Double,
                         o_orderdate: Timestamp, o_orderpriority: String)
  final case class Lineitem(l_orderkey: Long, l_partkey: Long,
                            l_suppkey: Long, l_linenumber: Int,
                            l_quantity: Double, l_extendedprice: Double,
                            l_discount: Double, l_tax: Double,
                            l_returnflag: String, l_linestatus: String,
                            l_shipdate: Timestamp)
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)

  private def round2(d: Double): Double = math.floor(d * 100 + 0.5) / 100

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: GenData <outDir> [sf=1.0] | GenData <outDir> -zipfdocs <nDocs>")
    val outDir = args(0)
    val spark = graft.engine.GraftSession.build("graft-gendata")
    if (args.length > 1 && args(1) == "-clustervecs") {
      import spark.implicits._
      val nVecs = args(2).toLong
      val nClusters = if (args.length > 3) args(3).toInt else 256
      val parts = math.max(1, math.min(32, (nVecs / 10000).toInt))
      spark.range(0, nVecs, 1, parts)
        .map(id => clusteredEmbedding(id, nClusters)).toDF()
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/embeddings.parquet")
      println(s"[gendata] clustered embeddings n=$nVecs " +
        s"k=$nClusters -> $outDir")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "-zipfdocs") {
      import spark.implicits._
      val nDocs = args(2).toLong
      val parts = math.max(1, math.min(32, (nDocs / 10000).toInt))
      spark.range(0, nDocs, 1, parts).map(id => zipfDoc(id)).toDF()
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
      println(s"[gendata] zipf documents n=$nDocs -> $outDir")
    } else {
      val sf = if (args.length > 1) args(1).toDouble else 1.0
      // optional trailing args: write only these tables (scale
      // measurements that need one table skip the 4·sf-million-row
      // lineitem build)
      generate(spark, outDir, sf, args.drop(2).toSet)
      println(s"[gendata] wrote sf=$sf to $outDir")
    }
    spark.stop()
  }

  /** Write all ten tables under outDir (or the `only` subset); the
    * caller owns the session.
    */
  /** The ten table names `generate` can write. */
  val Tables: Set[String] = Set("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def generate(spark: org.apache.spark.sql.SparkSession, outDir: String,
               sf: Double, only: Set[String] = Set.empty): Unit = {
    import spark.implicits._
    val unknown = only -- Tables
    require(unknown.isEmpty,
      s"unknown table name(s) ${unknown.mkString(", ")} — known: " +
        Tables.toSeq.sorted.mkString(", "))

    def n(base: Long): Long = math.max(1L, math.round(base * sf))
    val nCust = n(150000)
    val nSupp = n(10000)
    val nPart = n(200000)
    val nOrders = n(1500000)
    val nLine = nOrders * 4
    val nEvents = n(1000000)
    val nUsers = math.max(1L, nCust / 10)
    val nDocs = n(50000)
    val nVecs = n(20000)

    def parts(rows: Long): Int =
      math.max(1, math.min(32, (rows / 50000).toInt)).toInt

    def write(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      if (only.isEmpty || only(name)) {
        df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
        println(s"[gendata] $name: done")
      }

    write(Seq(
      (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "region")

    write((0 until 25).map(i => (i, s"NATION_$i", i / 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation")

    write(spark.range(0, nCust, 1, parts(nCust)).map { id =>
      val r = rng(10, id)
      Customer(id, f"Customer#$id%09d", r.nextInt(25),
        round2(-999 + r.nextDouble() * 10998),
        Segments(r.nextInt(Segments.length)))
    }.toDF(), "customer")

    write(spark.range(0, nSupp, 1, parts(nSupp)).map { id =>
      val r = rng(11, id)
      Supplier(id, f"Supplier#$id%09d", r.nextInt(25),
        round2(-999 + r.nextDouble() * 10998))
    }.toDF(), "supplier")

    write(spark.range(0, nPart, 1, parts(nPart)).map { id =>
      val r = rng(12, id)
      Part(id, PAdj(r.nextInt(PAdj.length)) + " " +
          PNoun(r.nextInt(PNoun.length)),
        "Brand#" + (1 + r.nextInt(20)), PTypes(r.nextInt(PTypes.length)),
        1 + r.nextInt(50), round2(900 + r.nextDouble() * 1100))
    }.toDF(), "part")

    write(spark.range(0, nOrders, 1, parts(nOrders)).map { id =>
      val r = rng(13, id)
      Order(id, r.nextLong(nCust), "FOP".charAt(r.nextInt(3)).toString,
        round2(1000 + r.nextDouble() * 499000),
        dayTs(Epoch1995, r.nextInt(2404)),
        Priorities(r.nextInt(Priorities.length)))
    }.toDF(), "orders")

    write(spark.range(0, nLine, 1, parts(nLine)).map { id =>
      val r = rng(14, id)
      Lineitem(id / 4, r.nextLong(nPart), r.nextLong(nSupp),
        (id % 4).toInt + 1, (1 + r.nextInt(50)).toDouble,
        round2(900 + r.nextDouble() * 103000), r.nextInt(11) / 100.0,
        r.nextInt(9) / 100.0, "ANR".charAt(r.nextInt(3)).toString,
        "FO".charAt(r.nextInt(2)).toString,
        dayTs(Epoch1995, 1 + r.nextInt(2498)))
    }.toDF(), "lineitem")

    write(spark.range(0, nEvents, 1, parts(nEvents)).map { id =>
      val r = rng(15, id)
      Event(id, new Timestamp(Epoch2024 + (r.nextDouble() * 29 * 86400000L).toLong),
        r.nextLong(nUsers), EventTypes(r.nextInt(EventTypes.length)),
        round2(r.nextDouble() * 560), s"""{"k": ${r.nextInt(100)}}""")
    }.toDF(), "events")

    write(spark.range(0, nDocs, 1, parts(nDocs)).map(id => doc(id)).toDF(),
      "documents")

    write(spark.range(0, nVecs, 1, parts(nVecs)).map(id => embedding(id)).toDF(),
      "embeddings")
  }
}
