package graft.tools

import graft.SparkSpec

/** The sf1 scaling evidence (PLANS.md) rests on GenData being a faithful
  * proxy for the driver testdata — pin the properties that make it one:
  * bit-determinism across runs/partitionings and schema parity with the
  * driver's parquet.
  */
class GenDataSpec extends SparkSpec {

  test("every row is a pure function of (table, id): documents and " +
       "embeddings are identical across partitionings") {
    import spark.implicits._
    val a = spark.range(0, 200, 1, 1).map(id => GenData.doc(id)).collect()
    val b = spark.range(0, 200, 1, 7).map(id => GenData.doc(id)).collect()
    assert(a.sortBy(_.doc_id).sameElements(b.sortBy(_.doc_id)))
    val ea = spark.range(0, 100, 1, 1)
      .map(id => GenData.embedding(id)).collect().sortBy(_.vec_id)
    val eb = spark.range(0, 100, 1, 5)
      .map(id => GenData.embedding(id)).collect().sortBy(_.vec_id)
    assert(ea.map(_.embedding.toSeq) sameElements eb.map(_.embedding.toSeq))
  }

  test("documents reproduce the driver shape: vocabulary, word counts, " +
       "dup-pair rate") {
    import spark.implicits._
    val docs = (0L until 2000L).map(GenData.doc)
    val words = docs.flatMap(_.text.split(" ")).toSet
    assert(words.subsetOf(GenData.Vocab.toSet))
    val counts = docs.map(_.text.split(" ").length)
    assert(counts.min >= 10 && counts.max <= 100)
    // ~1 dup pair per 20 docs, all high-Jaccard (exact or 1-word-mutated):
    // ids 57, 77, ..., 1997 → 98 dup docs in [0, 2000)
    val dups = docs.filter(d => d.doc_id >= 50 && d.doc_id % 20 == 17)
    assert(dups.size == 98, s"dup count ${dups.size}")
    // n_chars is the text length (driver contract)
    assert(docs.forall(d => d.n_chars == d.text.length))
  }

  test("embeddings are unit vectors with geometry-independent labels") {
    val es = (0L until 500L).map(GenData.embedding)
    es.foreach { e =>
      val n = math.sqrt(e.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"vec ${e.vec_id} norm $n")
      assert(e.embedding.length == 64)
      assert(e.label >= 0 && e.label < 10)
    }
  }

  test("generated schemas match the driver parquet (names + Spark types)") {
    val tmp = java.nio.file.Files.createTempDirectory("gendata_spec").toString
    // tiny sf so the whole generation is fast; run on the shared session
    GenData.generate(spark, tmp, 0.0002)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      // compare through the engine's reader — the schema every query sees
      // (raw spark.read rejects the driver's TIMESTAMP(NANOS) events.ts)
      val ref = graft.engine.Readers
        .readParquet(spark, s"${sf()}/$t.parquet").schema
      val gen = graft.engine.Readers
        .readParquet(spark, s"$tmp/$t.parquet").schema
      assert(ref.fields.map(_.name).toSeq == gen.fields.map(_.name).toSeq,
        s"$t column names")
      // compare types modulo nullability and timestamp flavor: the driver
      // writes pyarrow TIMESTAMP(NANOS, ntz) which raw-reads as
      // timestamp_ntz, while the engine's Readers.readParquet normalizes
      // both to micros TimestampType before any query sees them
      def tp(f: org.apache.spark.sql.types.StructField): String =
        f.dataType.typeName match {
          case a if a.startsWith("array") => "array"
          case t if t.startsWith("timestamp") => "timestamp"
          case other => other
        }
      assert(ref.fields.map(tp).toSeq == gen.fields.map(tp).toSeq,
        s"$t column types: ${ref.simpleString} vs ${gen.simpleString}")
    }
  }
}
