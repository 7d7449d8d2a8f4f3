package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.StableHash.stableHash60

/** Corpus-curation operators for training-data assembly: sequence
  * packing, deterministic interleaving, k-fold assignment, and
  * distribution-drift checks. The reference has no analogue (it moves
  * tables verbatim, SURVEY §0); these are the north-star operators a
  * training pipeline runs between dedup and the data loader.
  *
  * Design rules shared with [[Sampling]]:
  *   - everything keys on a stable content hash ([[stableHash60]]) —
  *     never RNG, row position, or partition id — so results are
  *     identical across runs, engines, and repartitions;
  *   - per-shard windows, never a single global window: every window
  *     below is `partitionBy(shard)`, so the work spreads over
  *     `shards` independent streams and no task sees more than
  *     |corpus|/shards rows. At 100 TB pick shards ~ O(total tokens /
  *     10^9) and each stream stays executor-sized.
  */
object Curation {

  /** Deterministic shard id in [0, shards) for a document key. */
  def shardId(key: Column, shards: Int): Column =
    stableHash60(key.cast("string")) % shards

  /** Token-budget packing: documents are hash-bucketed into `shards`
    * independent streams; each stream is ordered by doc_id and cut
    * into consecutive bins at every `budget`-token boundary (a document
    * belongs to the bin its FIRST token falls in — the streaming-chunk
    * rule, so bin assignment is a pure function of the running offset).
    *
    * Output: one row per document with (shard, bin, n_tok, cum) — the
    * loader-facing packing manifest. The only shuffle is the per-shard
    * window sort; bins never cross shards, so at 100 TB the packing of
    * each shard is an independent, executor-sized sort.
    */
  def packShards(docs: DataFrame, idCol: Column, tokens: Column,
                 shards: Int, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(idCol.as("doc_id"), shardId(idCol, shards).as("shard"),
        tokens.cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      // start offset of this doc = cum - n_tok; bin = offset div budget.
      // Values are token counts (<< 2^53) so the double floor is exact.
      .withColumn("bin",
        floor((col("cum") - col("n_tok")).cast("double") / budget)
          .cast("long"))
  }

  /** Deterministic corpus interleave (the reproducible global shuffle a
    * training loader needs): per-shard md5-keyed order, round-robin
    * merged across shards — global_pos = (pos_in_shard - 1) * shards +
    * shard. Bit-identical on every run/engine; no global window (each
    * row_number is per-shard) and the round-robin merge is arithmetic,
    * not a sort — the 100 TB path writes shard files and the loader
    * walks them round-robin.
    *
    * CONTRACT: `global_pos` is injective but SPARSE when shard sizes are
    * unequal — once a shorter shard is exhausted, its round-robin slots
    * are gaps. A loader must iterate positions in sorted order (or use
    * [[interleaveDense]]), NOT assume a dense 0..n-1 index.
    */
  def interleave(docs: DataFrame, idCol: Column, shards: Int,
                 salt: String = "shuf"): DataFrame = {
    val key = md5(concat(idCol.cast("string"), lit(":" + salt)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("sort_key"), col("doc_id"))
    docs.select(idCol.as("doc_id"), shardId(idCol, shards).as("shard"),
        key.as("sort_key"))
      .withColumn("pos_in_shard", row_number().over(w).cast("long"))
      .withColumn("global_pos",
        (col("pos_in_shard") - 1) * shards + col("shard"))
  }

  /** [[interleave]] with a DENSE 0..n-1 `global_pos` even for unequal
    * shard sizes: the dense rank of the sparse position is computed in
    * closed form from the shard-size vector (for a row at 1-based
    * per-shard position p in shard s, rows before it number
    * Σ_{t<s} min(n_t, p) + Σ_{t>s} min(n_t, p−1) + (p−1)), so no global
    * window is introduced — the size vector is `shards` longs, driver-
    * collected and folded per row with `aggregate`. Costs one extra
    * count-by-shard job over [[interleave]].
    */
  def interleaveDense(docs: DataFrame, idCol: Column, shards: Int,
                      salt: String = "shuf"): DataFrame = {
    val base = interleave(docs, idCol, shards, salt)
    val sizes = base.groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizeArr = array((0 until shards).map(s =>
      lit(sizes.getOrElse(s.toLong, 0L))): _*)
    base.withColumn("global_pos",
      aggregate(
        sequence(lit(0), lit(shards - 1)),
        lit(0L),
        (acc, t) => acc + when(t < col("shard"),
            least(element_at(sizeArr, t + 1), col("pos_in_shard")))
          .when(t > col("shard"),
            least(element_at(sizeArr, t + 1), col("pos_in_shard") - 1))
          .otherwise(col("pos_in_shard") - 1)))
  }

  /** K-fold cross-validation assignment: fold = salted stable hash mod
    * `folds`. Salting decouples the CV split from any other hash-keyed
    * split in the pipeline (the q_sample folds, dedup buckets, …) so
    * folds stay unbiased even when upstream operators already filtered
    * by doc_id hash. Narrow map, no shuffle.
    */
  def cvFold(key: Column, folds: Int, salt: String = "cv"): Column =
    stableHash60(concat(key.cast("string"), lit(":" + salt))) % folds

  /** Per-source quota cap: keep at most `k` documents per source, chosen
    * by stable hash — a reproducible "random" subset. This is the
    * per-domain cap of web-crawl curation: no single domain (template
    * farm, mirror network) may contribute more than `k` documents to
    * the training mix, however large its crawl footprint.
    *
    * Scale shape: selection is a bounded-heap aggregation
    * ([[graft.plans.TopKPairsAgg]] — map-side k-heap per source, at most
    * k (hash, id) pairs per source per task cross the shuffle), NOT a
    * row_number window. The window form must shuffle-and-SORT every row
    * of the hottest domain (exactly the domain the cap exists for); the
    * aggregator form's shuffle is k rows per source per task regardless
    * of skew. Winners (≤ k·|sources| rows) broadcast back onto the
    * corpus, which streams through one map-side join.
    *
    * Returns the kept documents with their 1-based per-source rank in
    * hash order (`qrank` — stable, so re-running with a larger k only
    * ever ADDS rows).
    */
  def sourceQuota(docs: DataFrame, k: Int,
                  sourceCol: String = "source"): DataFrame = {
    require(k > 0, s"quota k=$k must be positive")
    // negate: TopKPairsAgg keeps (score desc, id asc) = (hash asc, id
    // asc) — the "first k by hash order" rule (hash60 < 2^60, no
    // overflow). The salt decorrelates from every other doc_id-hash
    // split in the pipeline, same rule as cvFold.
    val h = stableHash60(concat(col("doc_id").cast("string"), lit(":quota")))
    val winners = graft.engine.Spread(docs)
      .select(col(sourceCol), col("doc_id"), (-h).as("negh"))
      .groupBy(col(sourceCol))
      .agg(graft.plans.TopKPairsAgg(col("negh"), col("doc_id"), k,
        distinctIds = false).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("t.id").as("doc_id"), (col("pos") + 1).cast("long").as("qrank"))
    docs.join(broadcast(winners), Seq("doc_id"))
      .select(col("doc_id"), col(sourceCol), col("lang"), col("qrank"))
  }

  /** Equal-count binning (exact ntile semantics) without a global
    * window: global rank = per-value rank (window PARTITIONED by the
    * value — parallel) + the value's cumulative offset (computed on the
    * value HISTOGRAM, which is |distinct values| rows — bounded by the
    * value domain, not the corpus — then broadcast back). The bin
    * formula reproduces SQL ntile exactly: the first n mod k buckets
    * take ceil(n/k) rows, the rest floor(n/k).
    *
    * This is the 100 TB shape for rank-based curriculum binning: the
    * only single-partition work is the tiny histogram scan; the corpus
    * itself never passes through one task. Requires one count() action
    * for n (same driver-side eagerness as the bloom build).
    */
  def equalCountBins(df: DataFrame, valueCol: Column, idCol: Column,
                     k: Int): DataFrame = {
    // NULL values are excluded up front: the histogram join could never
    // match them (NULL === NULL is null), so counting them in n would
    // shift every bin boundary while silently dropping the rows. SQL
    // ntile ranks NULLS FIRST instead — callers needing that must
    // coalesce to a sentinel below the value domain.
    val nonNull = df.filter(valueCol.isNotNull)
    val n = nonNull.count()
    require(n >= k, s"need at least $k rows, got $n")
    val m = n % k           // buckets that take one extra row
    val big = n / k + 1
    val small = n / k
    // internal columns use a __ecb_ prefix so a caller schema that
    // already has "v"/"off"/"rw"/"rnk" neither collides in the join
    // condition nor gets dropped at the end
    val hist = nonNull.groupBy(valueCol.as("__ecb_v"))
      .agg(count(lit(1)).as("__ecb_c"))
    // Spark warns `WindowExec: No Partition Defined` here — expected and
    // safe: this global window runs over the value HISTOGRAM (|distinct
    // values| rows, bounded by the domain, not the corpus) and the
    // result is broadcast back. The corpus itself never enters a
    // single-partition window.
    val offsets = hist.withColumn("__ecb_off",
      coalesce(sum(col("__ecb_c")).over(
        Window.orderBy(col("__ecb_v"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__ecb_v"), col("__ecb_off"))
    val perValue = Window.partitionBy(valueCol).orderBy(idCol)
    nonNull.withColumn("__ecb_rw", row_number().over(perValue).cast("long"))
      .join(broadcast(offsets), valueCol === col("__ecb_v"))
      .withColumn("__ecb_rnk", col("__ecb_off") + col("__ecb_rw"))
      .withColumn("bin",
        when(col("__ecb_rnk") <= m * big,
          (col("__ecb_rnk") - 1) / big + 1)
          .otherwise(
            lit(m) + (col("__ecb_rnk") - lit(m * big) - 1) / small + 1))
      .withColumn("bin", floor(col("bin")).cast("long"))
      .drop("__ecb_v", "__ecb_off", "__ecb_rw", "__ecb_rnk")
  }

  /** Distribution drift between two deterministic halves of a corpus
    * (the A/B integrity check run after any pipeline change): per-group
    * counts in each hash-half plus the absolute skew. One conditional
    * aggregation pass — integers only, no join, no second scan.
    */
  def halfDrift(docs: DataFrame, idCol: Column, groupCol: Column,
                salt: String = "drift"): DataFrame = {
    val half = stableHash60(concat(idCol.cast("string"), lit(":" + salt))) % 2
    docs.select(groupCol.as("grp"), half.as("half"))
      .groupBy(col("grp"))
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("skew", abs(col("n_a") - col("n_b")))
  }

  /** k-anonymity audit — the training-data governance check before a
    * corpus with user-adjacent columns ships: group by the declared
    * QUASI-IDENTIFIER columns and flag every equivalence class smaller
    * than k (its members are re-identifiable by those attributes
    * alone). ONE hash aggregation — the class census moves (quasi…,
    * count) rows only, so the audit costs a groupBy at any corpus
    * size; the violating classes are typically the tiny tail, and the
    * downstream fix (suppress or generalize them) is a broadcast
    * semi-join against this output.
    */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[Column],
                      k: Int): DataFrame = {
    require(quasi.nonEmpty && k >= 1, "need quasi columns and k >= 1")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** Suppression enforcement for [[kAnonymityAudit]]: drop every row
    * whose quasi-identifier class is smaller than k — the output is
    * k-anonymous BY CONSTRUCTION (suppressing whole classes cannot
    * shrink a surviving class, so one pass reaches the fixpoint; the
    * CurationSpec law re-audits the output). Plan: the class census
    * (tiny) broadcast back as a semi-join on the quasi columns — the
    * corpus streams once, nothing corpus-sized shuffles.
    */
  def kAnonymize(df: DataFrame, quasiNames: Seq[String],
                 k: Int): DataFrame = {
    val keep = kAnonymityAudit(df, quasiNames.map(col), k)
      .filter(col("anonymous")).select(quasiNames.map(col): _*)
    // NULL-SAFE equality (<=>): the audit's groupBy treats NULL as its
    // own equivalence class, so enforcement must keep a NULL-bearing
    // class the audit passed — a plain equality join would silently
    // suppress every row with a NULL quasi value
    val left = df.alias("__ka_l")
    val right = broadcast(keep.alias("__ka_r"))
    val cond = quasiNames.map(n =>
      col(s"__ka_l.`$n`") <=> col(s"__ka_r.`$n`")).reduce(_ && _)
    left.join(right, cond, "left_semi")
  }

  /** GENERALIZATION-based k-anonymity enforcement (global recoding) —
    * [[kAnonymize]]'s row-preserving sibling: instead of suppressing
    * violating rows, coarsen the quasi-identifiers up a LADDER of
    * generalization levels (bucket ages, truncate zip codes, finally
    * `'*'`) until EVERY equivalence class reaches k. All rows survive,
    * at the cost of quasi precision — the trade real governance
    * pipelines usually prefer.
    *
    * Each ladder level is the named generalized quasi columns it
    * emits (every level must emit the same names). Level selection is
    * one tiny aggregate per candidate level — the class census moves
    * (classes, count) rows only and stops at the FIRST level whose
    * smallest class is >= k — so the driver loop is bounded by the
    * ladder length (a handful), never the corpus. The output is the
    * input with the chosen level's columns applied; by construction
    * it re-audits k-anonymous (the CurationSpec law) and its row
    * count >= suppression's.
    */
  def kGeneralize(df: DataFrame, ladder: Seq[Seq[(String, Column)]],
                  k: Int): DataFrame = {
    require(ladder.nonEmpty && k >= 1, "need a ladder and k >= 1")
    val names = ladder.head.map(_._1)
    require(ladder.forall(_.map(_._1) == names),
      s"every ladder level must emit the same columns $names")
    val chosen = ladder.iterator.map { level =>
      val minClass = df
        .groupBy(level.map { case (n, c) => c.as(n) }: _*)
        .agg(count(lit(1)).as("n"))
        .agg(min(col("n"))).collect().head.getLong(0)
      (level, minClass)
    }.collectFirst { case (level, mc) if mc >= k => level }
    val level = chosen.getOrElse(throw new IllegalArgumentException(
      s"kGeneralize: no ladder level reaches k=$k " +
        "(append a constant top level, or the corpus has < k rows)"))
    df.withColumns(level.map { case (n, c) => n -> c }.toMap)
  }

  /** l-diversity audit — k-anonymity's companion (a class can be large
    * yet expose everyone in it when they all share the SENSITIVE
    * value): per quasi-identifier class, the count and the number of
    * DISTINCT sensitive values, flagging classes with fewer than l.
    * One two-phase hash aggregation (distinct via the standard
    * expand), still (quasi…, counts)-sized traffic only.
    */
  def lDiversityAudit(df: DataFrame, quasi: Seq[Column],
                      sensitive: Column, l: Int): DataFrame = {
    require(quasi.nonEmpty && l >= 1, "need quasi columns and l >= 1")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** t-closeness audit — the third member of the governance trio
    * (k-anonymity bounds class SIZE, l-diversity bounds distinct
    * sensitive values, t-closeness bounds the class's sensitive-value
    * DISTRIBUTION's distance from the global one — a class can be
    * large and diverse yet still leak by skew). Distance is total
    * variation over the categorical sensitive attribute (the standard
    * categorical instantiation of the paper's EMD):
    *
    *   tv(class) = ½ Σ_v |p_class(v) − p_global(v)|
    *
    * computed ENGINE-EXACTLY: all mass terms stay integers
    * (|cnt·N − g·n_class| cross-multiplied, absent-value mass
    * (N − Σ_present g)·n_class), with ONE double division at the end —
    * the q_stats decimal-sum discipline applied to a distance metric.
    * Plan: one (quasi…, sensitive) hash aggregation, then
    * (classes×values)-row re-aggregations — the corpus is touched
    * once, everything downstream is census-sized.
    */
  def tClosenessAudit(df: DataFrame, quasiNames: Seq[String],
                      sensitive: Column, t: Double): DataFrame = {
    require(quasiNames.nonEmpty && t >= 0.0, "need quasi columns, t >= 0")
    val q = quasiNames.map(n => col(s"`$n`"))
    val cnt = df
      .groupBy((q :+ sensitive.as("__s")): _*)
      .agg(count(lit(1)).as("__c"))
    val cls = cnt.groupBy(q: _*).agg(sum(col("__c")).as("__nc"))
    val glob = cnt.groupBy(col("__s")).agg(sum(col("__c")).as("__g"))
    val total = cnt.agg(sum(col("__c")).as("__n"))
    // NULL-SAFE class attach (<=>): the census groupBy treats NULL as
    // its own equivalence class, so the audit must score it too — a
    // plain equality join would silently drop NULL-bearing classes
    // from the report (the kAnonymize discipline applied to the audit)
    val clsR = quasiNames.zipWithIndex.foldLeft(cls) {
      case (d, (n, i)) => d.withColumnRenamed(n, s"__q$i")
    }
    cnt
      .join(broadcast(glob), Seq("__s"))
      .join(broadcast(clsR), quasiNames.zipWithIndex
        .map { case (n, i) => col(s"`$n`") <=> col(s"__q$i") }
        .reduce(_ && _))
      .drop(quasiNames.indices.map(i => s"__q$i"): _*)
      .crossJoin(broadcast(total))
      .groupBy(q: _*)
      .agg(
        max(col("__nc")).as("n"),
        // Σ_present |cnt·N − g·n_c|  +  (N − Σ_present g)·n_c, all longs
        ((sum(abs(col("__c") * col("__n") - col("__g") * col("__nc"))) +
          (max(col("__n")) - sum(col("__g"))) * max(col("__nc")))
          .cast("double") /
          (lit(2.0) * max(col("__nc")) * max(col("__n")))).as("tv"))
      .withColumn("close", col("tv") <= t)
  }

  /** Corpus snapshot diff — the ops view of two corpus generations
    * (yesterday's crawl vs today's): per document id, `added` /
    * `removed` / `changed` / `unchanged`, with content compared by
    * md5 so the diff never carries text across the join. ONE full
    * outer hash join on the id — the exchange moves (id, 32-byte
    * hash) rows only; at 100 TB both sides bucket/cluster on the id
    * and the join co-locates.
    */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"),
      md5(col(textCol)).as("h_old"))
    val n = newSnap.select(col(idCol).as("id"),
      md5(col(textCol)).as("h_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged"))
      .select(col("id"), col("status"))
  }

  /** [[cusum]] with a FIXED reference level μ instead of the per-key
    * mean — the form that streams (the self-referenced mean needs the
    * whole series; a monitoring target doesn't). Deviations are plain
    * d = x − μ − slack in milli-units (no n-scaling needed), the alarm
    * threshold compares s > h directly, and the same closed two-window
    * form applies. `EventStream.cusumAlarms` is the stateful streaming
    * twin, spec-locked equal on in-order arrival.
    */
  def cusumFixed(events: DataFrame, keyCol: Column, orderCol: Column,
                 tieCol: Column, valueCol: Column,
                 muMilli: Long, slackMilli: Long, hMilli: Long): DataFrame = {
    val byKey = Window.partitionBy(col("k"))
      .orderBy(col("o"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(keyCol.as("k"), orderCol.as("o"), tieCol.as("tie"),
        (floor(valueCol * 1000).cast("long") - muMilli - slackMilli).as("d"))
      .withColumn("p", sum(col("d")).over(byKey))
      .withColumn("runmin", min(col("p")).over(byKey))
      .withColumn("s", col("p") - least(lit(0L), col("runmin")))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("o"), col("tie"))))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n"),
        max(col("s")).as("max_stat"),
        sum(when(col("s") > hMilli, 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("s") > hMilli, col("pos"))).as("first_alarm_pos"))
  }

  /** One-sided CUSUM change-point detection (Page 1954) per key — the
    * classic sequential drift alarm over a metric stream, complementing
    * [[halfDrift]]'s batch A/B skew check.
    *
    * The textbook recursion s_i = max(0, s_{i-1} + (x_i − μ − slack))
    * is not window-expressible directly, but its closed form is:
    * s_i = p_i − min(0, min_{j≤i} p_j) with p the running prefix sum of
    * the deviations — two standard windows. Everything stays EXACT
    * integer: x is quantized to milli-units, and instead of dividing by
    * n for the per-key mean the whole inequality is scaled by n:
    * d_i = n·x_i − S − n·slack  (S = per-key sum), alarm when
    * s_i > n·h. So the operator is engine-portable with no float
    * anywhere, and the oracle replays the same two windows.
    *
    * Scale shape: one hash exchange on the key + in-partition sort
    * (ts, tiebreak) — the sessionization layout; per-key state is the
    * window frame, never driver-side. Returns per-key
    * (key, n, max_stat, n_alarms, first_alarm_pos) with positions
    * 1-based, NULL first_alarm_pos when no alarm fired.
    *
    * Numeric envelope (documented contract): the n-scaled prefix sums
    * are bounded by n·Σ|x − μ| per key, so keys up to ~10^8 rows of
    * ~10^6-milli values stay inside Long; beyond that, pre-aggregate
    * the stream into coarser ticks (minute/hour means) before the
    * alarm — which is also what makes a 100 TB metric stream a
    * per-key-sortable series in the first place.
    */
  def cusum(events: DataFrame, keyCol: Column, orderCol: Column,
            tieCol: Column, valueCol: Column,
            slackMilli: Long, hMilli: Long): DataFrame = {
    val byKey = Window.partitionBy(col("k"))
      .orderBy(col("o"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-key totals via the SAME partitioning as the scan windows —
    // no join, no second corpus pass, one exchange for the whole op
    val whole = Window.partitionBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events.select(keyCol.as("k"), orderCol.as("o"),
        tieCol.as("tie"), floor(valueCol * 1000).cast("long").as("x"))
      .withColumn("s_tot", sum(col("x")).over(whole))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("d",
        col("n") * col("x") - col("s_tot") - col("n") * slackMilli)
      .withColumn("p", sum(col("d")).over(byKey))
      .withColumn("runmin", min(col("p")).over(byKey))
      .withColumn("s", col("p") - least(lit(0L), col("runmin")))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("o"), col("tie"))))
      .groupBy(col("k"))
      .agg(
        max(col("n")).as("n"),
        max(col("s")).as("max_stat"),
        sum(when(col("s") > col("n") * hMilli, 1L).otherwise(0L))
          .as("n_alarms"),
        min(when(col("s") > col("n") * hMilli, col("pos")))
          .as("first_alarm_pos"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed-unigram feature counts are,
    * then keep documents whose log importance weight is non-negative.
    *
    * The estimator is two bag-of-hashed-tokens multinomials with add-one
    * smoothing: weight(doc) = Σ_tokens log(p̂_target[b] / p̂_raw[b])
    * where b = stableHash60(token) mod `buckets`, the target side is
    * `targetCol` rows and raw is the rest. Per-BUCKET log-ratios are
    * quantized to integer micro-nats before the per-doc sum (the
    * q_entropy discipline), so the fold is order-free exact integer
    * math — the ln itself is one IEEE call on a ratio of exact longs,
    * DuckDB-replicable bit-for-bit.
    *
    * Scale shape: the bucket table is `buckets` rows (broadcast both
    * times it is used); the corpus makes two narrow tokenization passes
    * (count features, then score) — each a map-side-combined
    * aggregation, no corpus-scale join or shuffle beyond the doc_id
    * groupBy. The (c+1)·(total+B) products stay in exact long/double
    * range up to ~10^14 tokens per side; past that, compute the two
    * logs separately before differencing (documented contract, not an
    * auto-switch — the quantization boundary would move).
    *
    * Deterministic stand-in for the paper's Gumbel-noise resampling:
    * the keep rule is a fixed threshold at weight >= 0 (more
    * target-like than raw), keeping selection RNG-free and
    * oracle-exact.
    */
  def dsirScores(docs: DataFrame, targetCol: Column,
                 buckets: Int = 256): DataFrame =
    dsirScoreWith(docs, dsirStats(docs, targetCol, buckets), buckets)

  /** The trained half of DSIR: the per-bucket micro-nat log importance
    * ratio table (b, s) — `buckets` rows, the broadcastable frozen
    * artifact a streaming scorer reuses shard after shard.
    */
  def dsirStats(docs: DataFrame, targetCol: Column,
                buckets: Int = 256): DataFrame = {
    val b = lit(buckets)
    val tok = docs.select(targetCol.as("tgt"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("b", pmod(stableHash60(col("w")), b))
    // eager checkpoint: bc feeds BOTH the totals and the score table —
    // without it each consumer re-runs the full tokenization pass, and
    // the corpus is scanned three times instead of two (seen in the
    // formatted plan). The checkpoint is `buckets` rows.
    val bc = tok.groupBy(col("b")).agg(
        sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
      .localCheckpoint(true)
    val tot = bc.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    bc.crossJoin(broadcast(tot))
      .select(col("b"),
        floor(lit(1e6) * log(
          ((col("ct") + 1) * (col("tr") + b)).cast("double") /
            ((col("cr") + 1) * (col("tt") + b)).cast("double")))
          .cast("long").as("s"))
  }

  /** Score documents against a FROZEN bucket-score table (from
    * [[dsirStats]]): one explode + broadcast join + doc_id fold.
    * Per-doc scoring is independent of every other document, so the
    * streaming twin (`DocStream.dsirIncremental`) equals this over the
    * union of shards in any arrival order — the spec-locked law.
    * Tokens hashing to a bucket ABSENT from the stats table (possible
    * when stats were trained on a different corpus) contribute 0 — the
    * neutral no-evidence prior.
    */
  def dsirScoreWith(docs: DataFrame, stats: DataFrame,
                    buckets: Int = 256): DataFrame =
    docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("b", pmod(stableHash60(col("w")), lit(buckets)))
      .join(broadcast(stats), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("s"), lit(0L))).as("w_micro"))
      .withColumn("keep", when(col("w_micro") >= 0, 1).otherwise(0))

  /** Curation audit: evaluate EVERY filter rule on EVERY document —
    * no short-circuit — and emit the full set of rules each document
    * fails. A production pipeline applies filters first-fail-wins, so
    * its drop log can't answer "which later filters would ALSO have
    * dropped this doc" or "which rule is doing marginal work" — the
    * questions you actually debug a 100 TB shrink with. The audit is
    * the attribution pass you run on a sample (or the whole corpus)
    * before touching thresholds.
    *
    * `rules` are (name, fail-predicate) pairs evaluated in one narrow
    * codegen'd projection. An `exact_dup` rule is added internally:
    * a document fails it when it is not the canonical (min `idCol`)
    * holder of its content group. The duplicate check windows over
    * md5(`textCol`) on a SLIM pre-projection (id + rule flags + 32-char
    * hash) so the exchange never carries document bodies — the only
    * shuffle in the operator, and its groups are duplicate-sets
    * (tiny), so no hot partition exists at any scale.
    *
    * Output: (doc_id, fails array<string> sorted, n_fails, kept 0/1).
    * The reference has no analogue (it filters nothing, SURVEY §0).
    */
  def curationAudit(docs: DataFrame, idCol: Column, textCol: Column,
                    rules: Seq[(String, Column)]): DataFrame = {
    val (slim, names) = auditFlags(docs, idCol, textCol, rules)
    val dup = col("doc_id") =!=
      min(col("doc_id")).over(Window.partitionBy(col("c_hash")))
    auditFold(slim.withColumn("exact_dup", dup), names)
  }

  /** The map-side half of [[curationAudit]]: one codegen'd projection
    * of (doc_id, md5(text), one boolean per rule). The exact_dup flag
    * is NOT included — the batch audit windows over c_hash, the
    * streaming twin (`DocStream.auditIncremental`) resolves it against
    * its accumulated hash table.
    */
  private[graft] def auditFlags(docs: DataFrame, idCol: Column,
      textCol: Column,
      rules: Seq[(String, Column)]): (DataFrame, Seq[String]) = {
    val names = rules.map(_._1) :+ "exact_dup"
    val reserved = // output / join-marker columns of the two audits
      Set("doc_id", "c_hash", "fails", "n_fails", "kept", "__seen")
    require(names.distinct.size == names.size &&
        !rules.exists(r => reserved.contains(r._1)),
      s"rule names must be distinct and not shadow $reserved: $names")
    (docs.select(
      (idCol.as("doc_id") +: md5(textCol).as("c_hash") +:
        rules.map { case (n, c) => c.as(n) }): _*), names)
  }

  /** Fold the flag columns (including a resolved `exact_dup`) to the
    * audit output shape (doc_id, fails sorted, n_fails, kept).
    */
  private[graft] def auditFold(flagged: DataFrame,
                               names: Seq[String]): DataFrame = {
    val failArr = array_sort(filter(
      array(names.map(n => when(col(n), lit(n))): _*), x => x.isNotNull))
    flagged.withColumn("fails", failArr)
      .select(col("doc_id"), col("fails"),
        size(col("fails")).as("n_fails"),
        when(size(col("fails")) === 0, 1).otherwise(0).as("kept"))
  }

  /** T5-style span corruption (Raffel et al. 2020): build
    * (input, target) pretraining pairs by masking fixed-length token
    * spans and replacing each with a numbered sentinel; the target is
    * the sentinel-delimited sequence of masked spans. The mask
    * placement is a pure function of content — each document gets a
    * hash-derived phase, and every `period`-th position from that
    * phase starts a `spanLen`-token span — so pairs are identical
    * across runs, partitionings, and engines (no RNG), non-overlapping
    * by construction, and the mask rate is exactly spanLen/period.
    * One narrow projection over the token array: no shuffle, scan-rate
    * at any corpus size.
    *
    * The phase hash is the Knuth multiplicative idiom (id·2654435761
    * mod period, exact in int64 on both engines), NOT stableHash60:
    * higher-order-function lambdas re-evaluate captured expressions
    * PER ELEMENT on the interpreted path, and the md5-based hash
    * measured 4× the wall (3.85 → 0.97 s at sf0.1) for zero semantic
    * benefit here — any id-keyed phase decorrelates span placement.
    */
  def spanCorrupt(docs: DataFrame, period: Int = 8,
                  spanLen: Int = 2): DataFrame = {
    require(spanLen > 0 && period > spanLen,
      s"need 0 < spanLen < period, got spanLen=$spanLen period=$period")
    val toks = split(col("text"), " ")
    val phase = pmod(col("doc_id") * lit(2654435761L), lit(period.toLong))
      .cast("int")
    def off(p: Column): Column = pmod(p - phase, lit(period))
    def masked(p: Column): Column = p >= phase && off(p) < spanLen
    def sentinel(p: Column): Column =
      concat(lit("<extra_id_"), ((p - phase) / period).cast("long"),
        lit(">"))
    // the INDEX variant of transform hands the lambda each token
    // directly — an element_at(toks, p) inside the lambda would
    // re-inline (project-collapse) the split per POSITION, turning the
    // narrow map O(n²)-per-document (measured 5.5 s vs 0.6 s at sf0.1)
    val input = array_join(filter(transform(toks, (t, p) =>
      when(!masked(p), t)
        .when(off(p) === 0, sentinel(p))), x => x.isNotNull), " ")
    val target = array_join(filter(transform(toks, (t, p) =>
      when(masked(p) && off(p) === 0, concat(sentinel(p), lit(" "), t))
        .when(masked(p), t)), x => x.isNotNull), " ")
    docs.select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
      input.as("input_text"), target.as("target_text"))
  }

  /** Domain-level screening (the C4/RefinedWeb move of dropping WHOLE
    * sources): per-document quality ratios are micro-quantized to
    * integers FIRST (floor(1e6·x) — deterministic per doc), then
    * summed per source, so the per-source means are exact integer
    * folds with no float-accumulation order anywhere (the engine's
    * standard micro-nat policy). The keep rule compares integer sums
    * against threshold·n_docs — no division. One tokenization pass +
    * one |sources|-row aggregation; the output is the broadcastable
    * allow-list a pipeline joins against its next scan.
    */
  /** Default screen thresholds (micro-quantized ratio means) — ONE
    * definition shared by the batch screen, the stats-table screen,
    * and the streaming twin, so the three entry points cannot drift.
    */
  val DefaultMinTtrMicro: Long = 500000L
  val DefaultMinStopMicro: Long = 60000L

  def domainScreen(docs: DataFrame,
                   minTtrMicro: Long = DefaultMinTtrMicro,
                   minStopMicro: Long = DefaultMinStopMicro): DataFrame =
    screenFromStats(domainStats(docs), minTtrMicro, minStopMicro)

  /** The MERGEABLE half of [[domainScreen]]: per-source
    * (n_docs, sum_ttr_micro, sum_stop_micro). Pure integer sums, so
    * stats from disjoint shards merge by addition — the streaming twin
    * (`DocStream.domainStatsIncremental`) folds each micro-batch's
    * stats into a running table and the result is arrival-order-free.
    */
  def domainStats(docs: DataFrame): DataFrame = {
    val ts = split(col("text"), " ")
    val nTok = greatest(size(ts), lit(1))
    val ttrM = floor(lit(1e6) * size(array_distinct(ts)) / nTok)
      .cast("long")
    val stopM = floor(lit(1e6) * size(filter(ts,
        t => Seq("a", "the", "of", "and", "to", "in")
          .map(w => t === w).reduce(_ || _))) / nTok)
      .cast("long")
    docs.select(col("source"), ttrM.as("tm"), stopM.as("sm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tm")).as("sum_ttr_micro"),
        sum(col("sm")).as("sum_stop_micro"))
  }

  /** Merge per-shard [[domainStats]] tables by addition (same schema
    * in, same schema out).
    */
  def mergeDomainStats(a: DataFrame, b: DataFrame): DataFrame =
    a.unionAll(b).groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("sum_ttr_micro")).as("sum_ttr_micro"),
        sum(col("sum_stop_micro")).as("sum_stop_micro"))

  /** The keep rule over a [[domainStats]] table: integer compare of
    * sums against threshold·n_docs — no division, no float anywhere.
    */
  def screenFromStats(stats: DataFrame,
                      minTtrMicro: Long = DefaultMinTtrMicro,
                      minStopMicro: Long = DefaultMinStopMicro): DataFrame =
    stats.withColumn("keep",
      when(col("sum_ttr_micro") >= lit(minTtrMicro) * col("n_docs") &&
        col("sum_stop_micro") >= lit(minStopMicro) * col("n_docs"),
        1).otherwise(0))

  /** Marginal attribution over a [[curationAudit]] frame: per rule,
    * how many documents fail it at all (`n_fail`) and how many are
    * dropped ONLY by it (`n_solo` — the documents that rule alone is
    * responsible for removing; a rule with n_fail ≫ n_solo = 0 is
    * dead weight). One explode + one aggregation; rules the corpus
    * never trips are absent (attribution, not a rule inventory).
    */
  /** URL canonicalization — the web-ingest normalization upstream of
    * every URL-keyed operator (snapshot/recrawl dedup, domain screens,
    * per-source quotas): the same page arrives as HTTP://WWW.Site.COM:80
    * /x?utm_source=a&b=1#frag and http://site.com/x?b=1, and unkeyed
    * they defeat (url, content) dedup. One exactly-specified rule both
    * engines replay, composed ENTIRELY from built-in string/array
    * functions (no UDF, no library URL parser — parser quirks are not
    * oracle-portable):
    *
    *   1. drop the fragment (first '#' on);
    *   2. no "://" → return as-is (relative refs pass through);
    *   3. lowercase scheme and authority;
    *   4. strip the scheme's default port (:80 http, :443 https) and a
    *      leading "www.";
    *   5. drop tracking params (utm_* keys, fbclid/gclid/msclkid/
    *      ref/ref_src), sort survivors bytewise as whole "k=v" strings;
    *   6. empty path → "/".
    *
    * Scale shape: a narrow per-row projection, no shuffle.
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = noFrag.substr(instr(noFrag, "://") + lit(3),
      length(noFrag))
    val auth = substring_index(rest, "/", 1)
    val pathq = rest.substr(length(auth) + lit(1), length(rest))
    val host0 = lower(auth)
    val host1 = when(scheme === "http",
        regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val host = regexp_replace(host1, "^www\\.", "")
    val path0 = substring_index(pathq, "?", 1)
    val path = when(length(path0) === 0, lit("/")).otherwise(path0)
    val query0 = when(instr(pathq, "?") > 0,
        pathq.substr(instr(pathq, "?") + lit(1), length(pathq)))
      .otherwise(lit(""))
    val tracking = Seq("fbclid", "gclid", "msclkid", "ref", "ref_src")
    val params = filter(split(query0, "&"), p => {
      val key = substring_index(p, "=", 1)
      length(p) > 0 && !key.startsWith("utm_") &&
        !key.isin(tracking: _*)
    })
    val q = array_join(array_sort(params), "&")
    when(instr(noFrag, "://") === 0, noFrag)
      .otherwise(concat(scheme, lit("://"), host, path,
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Temperature-weighted training-mix quotas — the data-mixing step
    * every multi-source/multilingual pretraining run makes (the
    * "sampling with temperature" of the multilingual-LM literature):
    * upweight small sources relative to their raw share so the mix
    * isn't dominated by the largest crawl. Weight = √n_docs (α = 1/2);
    * √ specifically because IEEE-754 requires sqrt exactly rounded —
    * pow(n, α) is NOT, so a general α would not be engine-portable.
    * Quantized w_micro = floor(1e6·√n); `budget` documents are
    * apportioned by LARGEST REMAINDER (Hamilton): base quota =
    * budget·w div W, the leftover goes to the largest budget·w mod W
    * (ties to the lexicographically first source) — Σ quota == budget
    * exactly, no float allocation.
    *
    * Scale shape: one map-side count aggregation to |sources| rows;
    * the remainder rank is a window over that bounded table.
    */
  def sourceMixture(docs: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val c = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_docs"),
        floor(lit(1000000.0) * sqrt(col("n_docs").cast("double")))
          .cast("long").as("w_micro"))
    val tot = c.agg(sum(col("w_micro")).as("wt"))
    val base = c.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("w_micro"),
        call_function("div", lit(budget) * col("w_micro"), col("wt"))
          .as("q0"),
        (lit(budget) * col("w_micro") % col("wt")).as("rem"))
    val s0 = base.agg(sum(col("q0")).as("s0"))
    base.crossJoin(broadcast(s0))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))))
      .select(col("source"), col("n_docs"), col("w_micro"),
        (col("q0") + when(col("rn") <= lit(budget) - col("s0"), 1L)
          .otherwise(0L)).as("quota"))
  }

  def auditSummary(audit: DataFrame): DataFrame =
    audit.select(col("n_fails"), explode(col("fails")).as("rule"))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_fail"),
        sum(when(col("n_fails") === 1, 1L).otherwise(0L)).as("n_solo"))
  }
