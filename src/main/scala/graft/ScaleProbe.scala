package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Aggregates

/** Scale-stress probe (dev tool, not part of the library): materializes an
  * N× re-keyed self-union of the sf0.1 tables (~sf0.8 at the default 8) and
  * times the queries whose round-2 plans were flagged scale-weak, next to a
  * control group. The interesting number is the time ratio vs sf0.1: a plan
  * with a low-cardinality funnel or an unbounded per-group array degrades
  * super-linearly (or dies); the fixed plans should track the data growth
  * ~linearly. Results are recorded in BASELINE.md.
  *
  * Ids are re-keyed per copy so semantics survive the union (no synthetic
  * duplicate keys); the ANN query set stays the original 5 vectors (only
  * copy 0 keeps vec_id < 5), so ANN work scales with the corpus only —
  * exactly the 100 TB shape (fixed query batch, growing corpus).
  */
object ScaleProbe {
  private val probes = Seq(
    "q1_agg",            // control: partial+final agg
    "q_top_per_key",     // salted bounded top-k (was: 5-task rank window)
    "q_latest_per_key",  // max_by aggregate (was: rank window)
    "q_argmax",          // max_by aggregate over ~5 keys
    "q_distinct_rep",    // min_by aggregate (was: rank window)
    "q_group_batches",   // ranged zipWithIndex (was: 5-task rank window)
    "q_embed_topk",      // typed bounded-heap re-rank
    "q_ivf_ann",         // bounded re-rank (was: unbounded collect_list)
    "q_lsh_ann",         // bounded re-rank (was: unbounded collect_list)
    "q_stratified_sample", // per-stratum reservoir: accumulator ≤ n per group
    "q_pack_tokens")     // greedy packing: one shuffle + O(rows) scan

  /** Warm-run duel timer: prints one JSON line per run, returns seconds. */
  private def timed(tag: String)(body: => Unit): Double = {
    val t0 = System.nanoTime(); body
    val s = (System.nanoTime() - t0) / 1e9
    println(f"""{"duel":"$tag","sec":$s%.3f}"""); s
  }

  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "8").toInt
    // rerun only the LSH duel against already-materialized scaled tables
    val lshOnly = sys.env.get("SPARK_GRAFT_LSH_ONLY").contains("1")
    // run only the Avro split-read duel (self-contained, no scaled tables)
    if (sys.env.get("SPARK_GRAFT_AVRO_ONLY").contains("1")) { avroDuel(); return }
    // run only the round-5 new-op probes (as-of / range join / span dedup /
    // semdedup occupancy)
    if (sys.env.get("SPARK_GRAFT_NEWOPS_ONLY").contains("1")) { newOpsProbe(factor); return }
    // run only the z-order layout pruning duel
    if (sys.env.get("SPARK_GRAFT_ZORDER_ONLY").contains("1")) { zorderDuel(factor); return }
    // run only the range-join width/guard duel (self-contained, sf0.1)
    if (sys.env.get("SPARK_GRAFT_RANGE_ONLY").contains("1")) { rangeGuardDuel(); return }
    // naive nested-loop range join vs the RangeJoinRewrite'd bucketed plan
    if (sys.env.get("SPARK_GRAFT_REWRITE_ONLY").contains("1")) { rewriteDuel(); return }
    // run only the bloom semi-join reduction duel
    if (sys.env.get("SPARK_GRAFT_BLOOM_ONLY").contains("1")) { bloomDuel(factor); return }
    // run only the quantized-ANN store duel
    if (sys.env.get("SPARK_GRAFT_QUANT_ONLY").contains("1")) { quantDuel(factor); return }
    // run only the product-quantization store/recall duel
    if (sys.env.get("SPARK_GRAFT_PQ_ONLY").contains("1")) { pqDuel(factor); return }
    // run only the round-8 probes (LM score / chunking / weighted sample /
    // count-min frequencies)
    if (sys.env.get("SPARK_GRAFT_R8_ONLY").contains("1")) { r8OpsProbe(factor); return }
    // run only the example-port probes (sessions / tfidf / autocomplete /
    // traffic)
    if (sys.env.get("SPARK_GRAFT_EXAMPLES_ONLY").contains("1")) { examplesProbe(factor); return }
    // run only the pair-attribution duel (fan-out-first vs reduce-first)
    if (sys.env.get("SPARK_GRAFT_PAIRDUEL_ONLY").contains("1")) { pairAttributionDuel(); return }
    // run only the hot-key fanout skew duel (plain groupBy vs salted two-stage)
    if (sys.env.get("SPARK_GRAFT_HOTKEY_ONLY").contains("1")) { hotkeyDuel(); return }
    // run only the round-10 probes (DSIR / BPE learning / kmeans /
    // tf.Example / incremental semdedup)
    if (sys.env.get("SPARK_GRAFT_R10_ONLY").contains("1")) { r10OpsProbe(factor); return }
    // run only the round-10 session-3 probes (domain mix / incremental
    // minhash / JL projection / outlier screen)
    if (sys.env.get("SPARK_GRAFT_S3_ONLY").contains("1")) { s3OpsProbe(factor); return }
    // run only the one-pass quality-gate duel (single agg vs a job per check)
    if (sys.env.get("SPARK_GRAFT_QUALITY_ONLY").contains("1")) { qualityDuel(); return }
    // run only the time-series analytics probes (sessionize / gap fill /
    // rolling z / ewma at ×factor keys)
    if (sys.env.get("SPARK_GRAFT_TS_ONLY").contains("1")) { tsProbe(factor); return }
    // run only the hot-BIN range-join skew duel (AQE skew-split on/off + salt)
    if (sys.env.get("SPARK_GRAFT_SKEWBIN_ONLY").contains("1")) { skewBinDuel(); return }

    if (sys.env.get("SPARK_GRAFT_ASOFSKEW_ONLY").contains("1")) { asofSkewDuel(); return }
    // run only the incremental-store compaction probe (4M-row store)
    if (sys.env.get("SPARK_GRAFT_COMPACT_ONLY").contains("1")) { compactProbe(); return }
    // run only the dedup-cluster stage breakdown (sf1 candidate graph)
    if (sys.env.get("SPARK_GRAFT_DEDUPCLUSTER_ONLY").contains("1")) { dedupClusterProbe(); return }
    // run only the incremental-semdedup store-lifecycle duel (sf3 follow-up)
    if (sys.env.get("SPARK_GRAFT_SEMINCR_ONLY").contains("1")) { semincrDuel(); return }
    val base = "/root/testdata/sf0.1"
    val out = "/root/repo/target/sf_scaled"
    val spark = GraftSession.getOrCreate()

    def rekey(df: DataFrame, i: Int, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * 1000000000L)))

    val rekeyCols = Map(
      "lineitem"   -> Seq("l_orderkey"),
      "orders"     -> Seq("o_orderkey"),
      "events"     -> Seq("event_id"),
      "embeddings" -> Seq("vec_id"),
      "documents"  -> Seq("doc_id"))


    if (!lshOnly) {
    rekeyCols.foreach { case (name, ids) =>
      val t = GraftSession.table(spark, base, name)
      val scaled = (0 until factor).map(i => if (i == 0) t else rekey(t, i, ids))
        .reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    // dimension tables stay FIXED (written once, no union) — scaling them
    // would fan out every dimension join by `factor` and over-count
    Seq("region", "nation", "supplier", "customer", "part").foreach { name =>
      GraftSession.table(spark, base, name).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
    }

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both shapes once, then measure
    probes.foreach { n => time(n, base); time(n, out) }
    val rows = probes.map { n =>
      val t1 = time(n, base)
      val tN = time(n, out)
      f"""{"query":"$n","sf01_sec":$t1%.3f,"x${factor}_sec":$tN%.3f,"ratio":${tN / t1}%.2f}"""
    }
    println(rows.mkString("[", ",\n", "]"))

    // ---- shape duel: the round-2 plan vs the round-3 plan on the SAME
    // scaled input — the funnel cost the ratios above can't show while
    // per-query overhead dominates. Old shape: rank window partitioned by
    // the ~5-value priority (every row sorts in ≤5 tasks). New shape: the
    // salted bounded two-phase reduction.
    val orders = GraftSession.table(spark, out, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    def runOld(): Unit = Aggregates.topPerKey(orders, Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .write.format("noop").mode("overwrite").save()
    def runNew(): Unit = Aggregates.topKPerKeySalted(orders, Seq(col("o_orderpriority")),
      struct((-col("o_totalprice")).as("np"), col("o_orderkey").as("okey")),
      saltFrom = col("o_orderkey"), k = 3)
      .write.format("noop").mode("overwrite").save()
    runOld(); runNew() // warm
    val oldT = timed("top_per_key_rank_window")(runOld())
    val newT = timed("top_per_key_salted")(runNew())
    println(f"""{"duel_ratio_old_over_new":${oldT / newT}%.2f}""")

    // ---- bucketed co-location duel: the same scaled fact-fact join run
    // (a) from plain parquet (both sides Exchange) and (b) from
    // same-bucketed tables (no Exchange at all). The write is the
    // pay-once cost; the join delta is what every LATER join/agg on the
    // key saves — the 100 TB argument for IO.writeBucketed.
    val jOrders = GraftSession.table(spark, out, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val jLine = GraftSession.table(spark, out, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val writeT = timed("bucketed_write_once") {
      graft.sources.IO.writeBucketed(jOrders, "sp_orders_b", Seq("o_orderkey"), 32,
        sortCols = Seq("o_orderkey"))
      graft.sources.IO.writeBucketed(jLine, "sp_lineitem_b", Seq("l_orderkey"), 32,
        sortCols = Seq("l_orderkey"))
    }
    def runShuffleJoin(): Unit = jLine
      .join(jOrders, col("l_orderkey") === col("o_orderkey"))
      .write.format("noop").mode("overwrite").save()
    def runBucketedJoin(): Unit = spark.table("sp_lineitem_b")
      .join(spark.table("sp_orders_b"), col("l_orderkey") === col("o_orderkey"))
      .write.format("noop").mode("overwrite").save()
    runShuffleJoin(); runBucketedJoin() // warm
    val shufT = timed("join_shuffle_both_sides")(runShuffleJoin())
    val buckT = timed("join_bucketed_no_exchange")(runBucketedJoin())
    println(f"""{"bucketed_join_speedup":${shufT / buckT}%.2f,"write_once_sec":$writeT%.3f}""")
    spark.sql("DROP TABLE IF EXISTS sp_orders_b")
    spark.sql("DROP TABLE IF EXISTS sp_lineitem_b")
    } // end !lshOnly

    // ---- LSH planes auto-tune duel: fixed planes (q_lsh_ann's 6) vs
    // planesFor(n) on the base and ×factor corpora. Fixed planes means
    // bucket occupancy grows with the corpus, and pairwise re-rank work
    // grows with occupancy² — the 4.0× ratio round 4 recorded. planesFor
    // holds expected occupancy constant, so the auto ratio should track
    // data growth (~linear, ≤ ~2×).
    import graft.operators.Similarity
    val embBase = GraftSession.table(spark, base, "embeddings")
    val embBig = GraftSession.table(spark, out, "embeddings")
    val annQ = embBase.filter(col("vec_id") < 5)
    def lshRun(corpus: DataFrame, planes: Int): Unit =
      Similarity.lshTopK(corpus, col("vec_id"), col("embedding"),
        annQ, col("vec_id"), col("embedding"), k = 5, planes = planes)
        .write.format("noop").mode("overwrite").save()
    val pBase = Similarity.planesFor(embBase.count())
    val pBig = Similarity.planesFor(embBig.count())
    println(s"""{"lsh_auto_planes_base":$pBase,"lsh_auto_planes_big":$pBig}""")
    lshRun(embBase, 6); lshRun(embBig, 6)
    lshRun(embBase, pBase); lshRun(embBig, pBig) // warm all shapes
    val fixB = timed("lsh_fixed6_base")(lshRun(embBase, 6))
    val fixN = timed(s"lsh_fixed6_x$factor")(lshRun(embBig, 6))
    val autoB = timed("lsh_auto_base")(lshRun(embBase, pBase))
    val autoN = timed(s"lsh_auto_x$factor")(lshRun(embBig, pBig))
    println(f"""{"lsh_fixed_ratio":${fixN / fixB}%.2f,"lsh_auto_ratio":${autoN / autoB}%.2f}""")
    // Wall time at toy scale is dominated by the per-row plane projections
    // (5 query vectors -> re-rank is linear either way); the quantity that
    // blows up at 100 TB is the CANDIDATE-PAIR count per query, which grows
    // with bucket occupancy (∝ n under fixed planes, ~constant under
    // planesFor). Count it directly — the scale-invariant evidence.
    def candidates(corpus: DataFrame, planes: Int): Long = {
      val c = Similarity.hyperplaneBucket(corpus, col("vec_id"), col("embedding"), planes)
        .select(col("bucket"), col("id").as("cid"))
      val q = Similarity.hyperplaneBucket(annQ, col("vec_id"), col("embedding"), planes)
        .select(col("bucket"), col("id").as("qid"))
      c.join(q, "bucket").count()
    }
    val (cfB, cfN) = (candidates(embBase, 6), candidates(embBig, 6))
    val (caB, caN) = (candidates(embBase, pBase), candidates(embBig, pBig))
    println(s"""{"lsh_fixed_cands_base":$cfB,"lsh_fixed_cands_x$factor":$cfN,""" +
      s""""lsh_auto_cands_base":$caB,"lsh_auto_cands_x$factor":$caN,""" +
      f""""lsh_fixed_cand_ratio":${cfN.toDouble / cfB}%.2f,"lsh_auto_cand_ratio":${caN.toDouble / caB}%.2f}""")
    spark.stop()
  }

  /** Round-5 new-op probes.
    *  1. ×factor wall ratios for q_asof_join (per-key window sort) and
    *     q_span_dedup (hash-shuffle pipeline) — both should track data
    *     growth ~linearly.
    *  2. Range-join shape duel on the SAME input: the bucketed equi-join
    *     rewrite vs the naive inequality join Spark plans as
    *     BroadcastNestedLoop — the comparison-count blowup the rewrite
    *     removes. Intervals stay FIXED (copy 0) while points scale, the
    *     100 TB shape (bounded window set, growing event stream).
    *  3. SemDeDup occupancy: candidate-pair counts (Σ c·(c−1)/2 over
    *     cells) under fixed nlist=16 vs nlistFor(n) at base and ×factor —
    *     fixed nlist grows pairs ~quadratically with the corpus, the auto
    *     knob holds per-cell work flat (the LSH-planes lesson applied to
    *     clustering). Wall time runs the full operator where the pair
    *     count is sane (auto both scales; fixed base only).
    */
  /** Round-8 probes: the round-7 newcomer ops that had no ScaleProbe entry.
    * Wall ratios at ×factor data plus each op's OWN scale quantity — the
    * number whose growth curve decides whether the plan survives 100 TB:
    * the LM's model rows (must stay vocabulary-bounded as the corpus
    * grows), chunking's output rows (must track the corpus linearly —
    * row-local, no cross-doc state), weightedSample's output size (must
    * stay exactly k — bounded per-partition heaps, never a global sort),
    * and the count-min sketch's dimensions/bytes (fixed by eps/confidence,
    * independent of row count). */
  private def r8OpsProbe(factor: Int): Unit = {
    import graft.operators.{Aggregates, Curation, TextAnalysis}
    val base = "/root/testdata/sf0.1"
    val out = "/root/repo/target/sf_scaled_r8"
    val spark = GraftSession.getOrCreate()

    def rekey(df: DataFrame, i: Int, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * 1000000000L)))
    Seq("documents" -> Seq("doc_id"), "events" -> Seq("event_id")).foreach {
      case (name, ids) =>
        val t = GraftSession.table(spark, base, name)
        (0 until factor).map(i => if (i == 0) t else rekey(t, i, ids))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val probes = Seq("q_lm_score", "q_chunk_docs", "q_weighted_sample", "q_cms_freq")
    probes.foreach { n => time(n, base); time(n, out) } // warm
    val rows = probes.map { n =>
      val t1 = time(n, base)
      val tN = time(n, out)
      f"""{"query":"$n","sf01_sec":$t1%.3f,"x${factor}_sec":$tN%.3f,"ratio":${tN / t1}%.2f}"""
    }
    println(rows.mkString("[", ",\n", "]"))

    // op-specific scale quantities
    val docsB = GraftSession.table(spark, base, "documents")
    val docsN = GraftSession.table(spark, out, "documents")
    def modelRows(docs: DataFrame): Long =
      docs.select(explode(when(length(lower(col("text"))) < 3,
          array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), length(lower(col("text"))) - 2),
          i => lower(col("text")).substr(i, lit(3))))).as("tri"))
        .select(col("tri")).distinct().count()
    val (mB, mN) = (modelRows(docsB), modelRows(docsN))
    println(f"""{"probe":"lm_model_rows","base":$mB,"x$factor":$mN,"ratio":${mN.toDouble / mB}%.2f}""")
    def chunkRows(docs: DataFrame): Long =
      TextAnalysis.chunkTokens(docs, col("doc_id"), col("text"), 32, 8).count()
    val (cB, cN) = (chunkRows(docsB), chunkRows(docsN))
    println(f"""{"probe":"chunk_rows","base":$cB,"x$factor":$cN,"ratio":${cN.toDouble / cB}%.2f}""")
    def wsRows(docs: DataFrame): Long =
      Curation.weightedSample(
        docs.select(col("doc_id"), size(split(col("text"), "\\s+")).as("w")),
        col("doc_id"), col("w"), 50, seed = 7L).count()
    println(s"""{"probe":"weighted_sample_rows","base":${wsRows(docsB)},"x$factor":${wsRows(docsN)},"k":50}""")
    def cmsDims(dir: String): (Int, Int, Long, Int) = {
      val ev = GraftSession.table(spark, dir, "events")
        .select(col("event_type").as("__item")).filter(col("__item").isNotNull)
      val cms = ev.stat.countMinSketch("__item", 0.001, 0.99, 42)
      (cms.depth(), cms.width(), cms.totalCount(), cms.toByteArray.length)
    }
    val (dB, wB, tB, bB) = cmsDims(base)
    val (dN, wN, tN2, bN) = cmsDims(out)
    println(s"""{"probe":"cms_sketch","base_depth":$dB,"base_width":$wB,"base_total":$tB,"base_bytes":$bB,""" +
      s""""x${factor}_depth":$dN,"x${factor}_width":$wN,"x${factor}_total":$tN2,"x${factor}_bytes":$bN}""")
    spark.stop()
  }

  /** Example-port probes: the reference-example compositions added in round
    * 8 (TopWikipediaSessions, TfIdf, AutoComplete, TrafficMaxLaneFlow,
    * TrafficRoutes) at ×N re-keyed data. The traffic pair's scale story is
    * OUTPUT INVARIANCE: re-keying multiplies readings per (window, station)
    * but the window×station grid is fixed, so a healthy plan's output rows
    * stay constant and the map-side partial max/sum absorbs the growth
    * before the shuffle — the probe prints both walls and both output
    * cardinalities. TfIdf's quantity is the vocabulary (df side) growth —
    * sublinear in corpus size; AutoComplete's is candidates-per-prefix
    * (bounded by fanout×k by construction). */
  private def examplesProbe(factor: Int): Unit = {
    val base = "/root/testdata/sf0.1"
    val out = "/root/repo/target/sf_scaled_r8"
    val spark = GraftSession.getOrCreate()

    def rekey(df: DataFrame, i: Int, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * 1000000000L)))
    Seq("documents" -> Seq("doc_id"), "events" -> Seq("event_id"),
        "customer" -> Seq("c_custkey")).foreach {
      case (name, ids) =>
        val t = GraftSession.table(spark, base, name)
        (0 until factor).map(i => if (i == 0) t else rekey(t, i, ids))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    // nation is the dim side of q_join_examples: stays FIXED, like the
    // r5 probe's dimension tables — scaling it would scale the join key
    // domain rather than the fact volume
    GraftSession.table(spark, base, "nation")
      .write.mode("overwrite").parquet(s"$out/nation.parquet")
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // r8 example ports + the r9 cookbook ports. Scale quantities for the
    // cookbook six: q_tornadoes / q_max_per_day / q_filter_below_mean
    // outputs are fixed by the ≤31-day period grid (and the filter's
    // selectivity), q_large_word_plays by the vocabulary × bounded source
    // set, q_distinct_lines by distinct text lines (shared across ×N
    // copies), q_join_examples by the fact row count (×N, trivially
    // linear through a broadcast join).
    val probes = Seq("q_top_sessions", "q_tfidf", "q_autocomplete",
      "q_traffic_max_lane", "q_traffic_routes",
      "q_tornadoes", "q_large_word_plays", "q_distinct_lines",
      "q_filter_below_mean", "q_join_examples", "q_max_per_day")
    probes.foreach { n => time(n, base); time(n, out) } // warm
    val rows = probes.map { n =>
      val t1 = time(n, base)
      val tN = time(n, out)
      val outB = SparkEntry.queries(n)(spark, base).count()
      val outN = SparkEntry.queries(n)(spark, out).count()
      f"""{"query":"$n","sf01_sec":$t1%.3f,"x${factor}_sec":$tN%.3f,""" +
        f""""ratio":${tN / t1}%.2f,"out_base":$outB,"out_x$factor":$outN}"""
    }
    println(rows.mkString("[", ",\n", "]"))

    // TfIdf vocabulary (the df join side): sublinear growth is the scale story
    def vocab(dir: String): Long =
      GraftSession.table(spark, dir, "documents")
        .select(explode(split(lower(col("text")), "\\W+")).as("w"))
        .filter(length(col("w")) > 0).select("w").distinct().count()
    val (vB, vN) = (vocab(base), vocab(out))
    println(f"""{"probe":"tfidf_vocab","base":$vB,"x$factor":$vN,"ratio":${vN.toDouble / vB}%.2f}""")
    spark.stop()
  }

  private def newOpsProbe(factor: Int): Unit = {
    import graft.operators.{Joins, Similarity}
    val base = "/root/testdata/sf0.1"
    val out = "/root/repo/target/sf_scaled_newops"
    val spark = GraftSession.getOrCreate()

    def rekey(df: DataFrame, i: Int, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * 1000000000L)))
    Seq("events" -> Seq("event_id"), "documents" -> Seq("doc_id"),
        "embeddings" -> Seq("vec_id")).foreach { case (name, ids) =>
      val t = GraftSession.table(spark, base, name)
      (0 until factor).map(i => if (i == 0) t else rekey(t, i, ids))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // 1. wall ratios
    val ratioProbes = Seq("q_asof_join", "q_span_dedup")
    ratioProbes.foreach { n => time(n, base); time(n, out) } // warm
    val rows = ratioProbes.map { n =>
      val t1 = time(n, base)
      val tN = time(n, out)
      f"""{"query":"$n","sf01_sec":$t1%.3f,"x${factor}_sec":$tN%.3f,"ratio":${tN / t1}%.2f}"""
    }
    println(rows.mkString("[", ",\n", "]"))

    // 2. range-join duel: bucketed rewrite vs naive BNL, fixed intervals
    val ev = GraftSession.table(spark, out, "events")
    val (intervals, points) = rangeFixture(ev)
    def runBucketed(): Unit =
      Joins.pointInIntervalJoin(points, col("p"), intervals, col("lo"), col("hi"),
          bucketWidth = rangeIntervalUs)
        .groupBy(col("interval_id")).agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    def runNaive(): Unit =
      points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
        .groupBy(col("interval_id")).agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    runBucketed(); runNaive() // warm
    val bT = timed(s"range_join_bucketed_x$factor")(runBucketed())
    val nT = timed(s"range_join_nested_loop_x$factor")(runNaive())
    println(f"""{"range_join_bnl_over_bucketed":${nT / bT}%.2f}""")

    // 3. semdedup occupancy + wall
    val embBase = GraftSession.table(spark, base, "embeddings")
    val embBig = GraftSession.table(spark, out, "embeddings")
    def candidatePairs(embs: DataFrame, nlist: Int): Long =
      Similarity.assignCells(embs, col("vec_id"), col("embedding"), nlist, 0)
        .map(_.groupBy(col("cell")).count()
          .agg(sum(col("count") * (col("count") - 1) / 2)).collect()(0).getDouble(0).toLong)
        .getOrElse(0L)
    val nB = embBase.count(); val nN = embBig.count()
    val (autoB, autoN) = (Similarity.nlistFor(nB), Similarity.nlistFor(nN))
    println(s"""{"semdedup_auto_nlist_base":$autoB,"semdedup_auto_nlist_x$factor":$autoN}""")
    val (pfB, pfN) = (candidatePairs(embBase, 16), candidatePairs(embBig, 16))
    val (paB, paN) = (candidatePairs(embBase, autoB), candidatePairs(embBig, autoN))
    println(s"""{"semdedup_fixed16_pairs_base":$pfB,"semdedup_fixed16_pairs_x$factor":$pfN,""" +
      s""""semdedup_auto_pairs_base":$paB,"semdedup_auto_pairs_x$factor":$paN,""" +
      f""""semdedup_fixed_pair_ratio":${pfN.toDouble / math.max(pfB, 1)}%.2f,"semdedup_auto_pair_ratio":${paN.toDouble / math.max(paB, 1)}%.2f}""")
    def semRun(embs: DataFrame, nlist: Int): Unit =
      Similarity.semDedup(embs, col("vec_id"), col("embedding"), nlist, 0.3)
        .write.format("noop").mode("overwrite").save()
    semRun(embBase, 16); semRun(embBase, autoB); semRun(embBig, autoN) // warm
    val fixedBaseT = timed("semdedup_fixed16_base")(semRun(embBase, 16))
    val autoBaseT = timed("semdedup_auto_base")(semRun(embBase, autoB))
    val autoBigT = timed(s"semdedup_auto_x$factor")(semRun(embBig, autoN))
    println(f"""{"semdedup_auto_wall_ratio":${autoBigT / autoBaseT}%.2f,"semdedup_fixed_base_sec":$fixedBaseT%.3f}""")
    spark.stop()
  }

  /** 4-hour signup-interval × click-point fixture shared by the range-join
    * duels. Intervals keep base-copy ids only, so on a stacked ×factor
    * table the interval side stays FIXED while points scale — the 100 TB
    * shape (bounded window set, growing event stream). Returns
    * (intervals(interval_id, lo, hi), points(p)) in epoch micros. */
  private val rangeIntervalUs = 4L * 3600 * 1000000
  private def rangeFixture(ev: DataFrame): (DataFrame, DataFrame) = {
    val intervals = ev.filter(col("event_type") === "signup" &&
        col("event_id") % 7 === 0 && col("event_id") < 1000000000L)
      .select(col("event_id").as("interval_id"),
        unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) + rangeIntervalUs).as("hi"))
    val points = ev.filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("p"))
    (intervals, points)
  }

  /** Range-join width/guard duel: (a) stats-derived default bucketWidth vs
    * an explicit sane width — comparable wall, no caller tuning needed;
    * (b) a pathological width (1 ms bins on 4-hour intervals: 14.4M
    * bins/interval) must be REJECTED fail-loud by the maxBinsPerRow guard
    * instead of silently amplifying the interval side 14-million-fold. */
  /** Pair-attribution micro-duel — the reusable lesson from the round-8
    * traffic rewrite, measured head-to-head so it's recorded as a pattern,
    * not query baker's knowledge. Task: count consecutive-reading speedups
    * per (sliding window, route) — q_traffic_routes' pair side.
    *
    *  - fan-out-first (the reference's GatherStats shape,
    *    TrafficRoutes.java:215-254): explode every reading into its ≤4
    *    overlapping sliding windows FIRST, then sort + walk pairs inside
    *    each (window, route, station) group. The shuffle carries each
    *    reading's full payload size/period times, and each station array is
    *    re-sorted and re-walked once per covering window.
    *  - reduce-first (the library idiom): walk the global sorted sequence
    *    ONCE per (route, station) ([[graft.operators.Aggregates.consecutivePairs]]),
    *    then attribute each pair to the windows covering both endpoints
    *    ([[graft.operators.Windows.slidingWindowStartsCovering]]) — exact
    *    because a window's per-station sequence is a contiguous slice of
    *    the global sorted sequence; only narrow (route, up, wstart) rows
    *    are replicated.
    *
    * Equality is asserted (exceptAll both ways = 0) before timing; the
    * printed ratio is the cost of fanning out wide rows before reducing. */
  private def pairAttributionDuel(): Unit = {
    import graft.operators.{Aggregates, Windows}
    val spark = GraftSession.getOrCreate()
    val readings = GraftSession.table(spark, "/root/testdata/sf0.1", "events")
      .select(col("ts"), col("event_type").as("route"),
        (col("user_id") % 20).as("station"), col("event_id"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("speed"))
    def pairAgg(pairs: DataFrame): DataFrame =
      pairs.groupBy(col("wstart"), col("route"))
        .agg(sum(col("up")).as("speedups"),
          (count(lit(1)) - sum(col("up"))).as("slowdowns"))
    def reduceFirst(): DataFrame = pairAgg(readings
      .groupBy(col("route"), col("station"))
      .agg(sort_array(collect_list(struct(col("ts").as("tsu"),
        col("event_id"), col("speed")))).as("arr"))
      .select(col("route"), explode(Aggregates.consecutivePairs(col("arr"))).as("p"))
      .select(col("route"),
        when(col("p.cur.speed") > col("p.prev.speed"), 1L).otherwise(0L).as("up"),
        explode(Windows.slidingWindowStartsCovering(col("p.prev.tsu"),
          col("p.cur.tsu"), "1 hour", "15 minutes")).as("wstart")))
    def fanoutFirst(): DataFrame = pairAgg(readings
      .select(col("route"), col("station"), col("ts"), col("event_id"), col("speed"),
        explode(Windows.slidingWindowStartsCovering(col("ts"), col("ts"),
          "1 hour", "15 minutes")).as("wstart"))
      .groupBy(col("wstart"), col("route"), col("station"))
      .agg(sort_array(collect_list(struct(col("ts").as("tsu"),
        col("event_id"), col("speed")))).as("arr"))
      .select(col("wstart"), col("route"),
        explode(Aggregates.consecutivePairs(col("arr"))).as("p"))
      .select(col("wstart"), col("route"),
        when(col("p.cur.speed") > col("p.prev.speed"), 1L).otherwise(0L).as("up")))
    require(reduceFirst().exceptAll(fanoutFirst()).isEmpty &&
      fanoutFirst().exceptAll(reduceFirst()).isEmpty,
      "pair-attribution formulations disagree")
    def time(tag: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"duel":"pair_$tag","sec":$s%.3f}"""); s
    }
    time("fanout_first")(fanoutFirst()); time("reduce_first")(reduceFirst()) // warm
    val fan = Seq.fill(3)(time("fanout_first")(fanoutFirst())).sorted.apply(1)
    val red = Seq.fill(3)(time("reduce_first")(reduceFirst())).sorted.apply(1)
    println(f"""{"duel":"pair_attribution","fanout_over_reduce":${fan / red}%.2f}""")
    spark.stop()
  }

  private def rangeGuardDuel(): Unit = {
    import graft.operators.Joins
    val spark = GraftSession.getOrCreate()
    val ev = GraftSession.table(spark, "/root/testdata/sf0.1", "events")
    val (intervals, points) = rangeFixture(ev)
    def run(tag: String, width: Long): Double = {
      val t0 = System.nanoTime()
      Joins.pointInIntervalJoin(points, col("p"), intervals, col("lo"), col("hi"),
          bucketWidth = width)
        .groupBy(col("interval_id")).agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"range_width","variant":"$tag","sec":$s%.3f}""")
      s
    }
    run("explicit_4h", rangeIntervalUs); run("derived_median", 0L) // warm
    val exp = run("explicit_4h", rangeIntervalUs)
    val der = run("derived_median", 0L)
    println(f"""{"probe":"range_width","derived_over_explicit":${der / exp}%.2f}""")
    val rejected =
      try {
        Joins.pointInIntervalJoin(points, col("p"), intervals, col("lo"), col("hi"),
            bucketWidth = 1000L).count()
        false
      } catch { case e: Throwable =>
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .exists(_.toString.contains("maxBinsPerRow"))
      }
    println(s"""{"probe":"range_guard","pathological_width_rejected":$rejected}""")
    require(rejected, "bin-cap guard failed to reject a pathological bucketWidth")
  }

  /** RangeJoinRewrite duel: the q_range_rewrite catalog shape — the NAIVE
    * `points.join(intervals, p >= lo && p < hi)` — executed (a) as written
    * (conf unset → Spark's BroadcastNestedLoopJoin, O(|P|·|I|) compares)
    * vs (b) under `spark.graft.rangeJoin.bucketWidth` (the rule rebuilds
    * it into the bucketed equi-join). Same session, result counts asserted
    * equal, both at sf0.01 and sf0.1 — the sf0.01→sf0.1 wall GROWTH is the
    * real verdict: the naive side grows ~quadratically (both inputs ×10),
    * the rewritten side tracks the data. */
  /** Hot-BIN skew duel for the bucketed range join: the scaladoc claims "a
    * bin spanning a hot time range is ordinary hash-join skew — AQE splits
    * it" (Joins.scala pointInIntervalJoin); this measures that claim once
    * instead of asserting it. Synthetic frame: 50% of 6M points land in
    * ONE bin (the hot time range), the rest uniform over 512 bins; 2
    * interval rows per bin; broadcast disabled so the join must shuffle on
    * the bin key (the 100 TB shape — an intervals side too big to
    * broadcast). Three legs, median-of-3 walls:
    *  - aqe_skew_on: skew-split enabled, thresholds lowered to local scale
    *    (the 256 MB default is sized for real executors); the executed
    *    plan is REQUIRED to show the skew-split AQEShuffleRead
    *  - aqe_skew_off: the hot bin funnels one task
    *  - salted: skew off + the operator's extraKeys carrying an explicit
    *    16-way salt (points hash-salted, intervals ×16) — the documented
    *    fallback when a runtime has no AQE
    * Recorded in BASELINE.md. */
  private def skewBinDuel(): Unit = {
    val spark = GraftSession.getOrCreate()
    val W = 1000L
    val nBins = 512L
    val nPts = 6000000L
    val dir = "/root/repo/target/hotbin"
    // hot bin 7 gets every even id; odd ids spread via a Knuth-hash
    spark.range(nPts).select(
      when(col("id") % 2 === 0, lit(7L * W) + pmod(col("id"), lit(W)))
        .otherwise(pmod(col("id") * 2654435761L, lit(nBins * W))).as("p"),
      col("id").as("point_id"))
      .write.mode("overwrite").parquet(s"$dir/points.parquet")
    spark.range(nBins * 2).select(
      (pmod(col("id"), lit(nBins)) * W).as("lo"),
      ((pmod(col("id"), lit(nBins)) + 1) * W).as("hi"),
      col("id").as("interval_id"))
      .write.mode("overwrite").parquet(s"$dir/intervals.parquet")
    val pts = spark.read.parquet(s"$dir/points.parquet")
    val ivs = spark.read.parquet(s"$dir/intervals.parquet")

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def run(tag: String, skewOn: Boolean, salt: Int): Double = {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
        def df =
          if (salt <= 1)
            graft.operators.Joins.pointInIntervalJoin(
              pts, col("p"), ivs, col("lo"), col("hi"), bucketWidth = W)
          else {
            val sp = pts.withColumn("__salt", pmod(xxhash64(col("point_id")), lit(salt.toLong)))
            val si = ivs.withColumn("__salt",
              explode(sequence(lit(0L), lit(salt.toLong - 1))))
            graft.operators.Joins.pointInIntervalJoin(
              sp, col("p"), si, col("lo"), col("hi"), bucketWidth = W,
              extraKeys = Seq("__salt")).drop("__salt")
          }
        val walls = (1 to 3).map(_ => timed(s"skewbin_$tag") {
          df.write.format("noop").mode("overwrite").save()
        }).sorted
        // plan pin AFTER execution (AQE final plan). The execution must go
        // through THIS DataFrame's own QueryExecution — df.write builds a
        // fresh one, whose AdaptiveSparkPlan would print the never-executed
        // INITIAL plan (observed: no AQE nodes at all)
        val exec = {
          val d = df
          d.queryExecution.toRdd.foreach(_ => ())
          d.queryExecution.executedPlan
        }
        // STRUCTURAL pin: an AQEShuffleRead with a partial-reducer
        // (skew-split) spec or an isSkewJoin join in the final adaptive
        // plan — not a "skew" substring, which any path/conf rendered
        // into the plan could satisfy (or a node rename defeat)
        val skewed = graft.plans.PlanLint.skewSplitEngaged(exec)
        if (skewOn) require(skewed,
          s"AQE skew-join did not engage on the hot bin:\n${exec.toString.take(3000)}")
        println(f"""{"duel":"skewbin_$tag","median_sec":${walls(1)}%.3f,"skew_split_in_plan":$skewed}""")
        walls(1)
      }
      val off = run("aqe_off", skewOn = false, salt = 1)
      val on = run("aqe_on", skewOn = true, salt = 1)
      val salted = run("salted", skewOn = false, salt = 16)
      println(f"""{"duel":"skewbin_summary","aqe_off":$off%.3f,"aqe_on":$on%.3f,"salted":$salted%.3f,"off_over_on":${off / on}%.2f}""")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** As-of hot-key skew duel (r12 verdict item 1): ONE key holds 50% of
    * both sides — the "one hot entity's full history" shape where the
    * plain union-window plan funnels half the data through a single
    * task's sort. Three measurements:
    *
    *  1. The right-side per-(keys, ts) pre-aggregation factor — the
    *     contract/determinism mitigation Joins.asOf's scaladoc names
    *     (rights here carry ~2 duplicates per (k, ts) before pre-agg).
    *  2. The FUNNEL, measured directly: max rows any single window
    *     partition sorts — per (k) for the plain plan vs per (k, slice)
    *     for the time-sliced plan. This is the scale-decisive quantity:
    *     wall clock at local[32] understates the win on a 1000-executor
    *     cluster, where the plain plan's hot task is the whole stage.
    *  3. Median-of-3 walls for plain vs sliced (both on the pre-agged
    *     rights), with an order-insensitive xxhash64 checksum REQUIRING
    *     the two plans return identical rows.
    */
  private def asofSkewDuel(): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = "/root/repo/target/asofskew"
    val nL = 4000000L; val nR = 4000000L
    val tsRange = 1L << 22
    val coldKeys = 8192L
    // even ids → key 0 (hot, 50%); odd ids Knuth-spread over 8192 cold keys
    def keyOf = when(col("id") % 2 === 0, lit(0L))
      .otherwise(pmod(col("id") * 2654435761L, lit(coldKeys)) + lit(1L))
    spark.range(nL).select(col("id").as("lid"), keyOf.as("k"),
        pmod(col("id") * 1099511628211L, lit(tsRange)).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/left.parquet")
    // pairs of ids share a ts draw → ~2 right rows per (k, ts) pre pre-agg
    spark.range(nR).select(col("id").as("rid"), keyOf.as("k"),
        pmod((col("id") - pmod(col("id"), lit(4L))) * 2654435761L + lit(997L),
          lit(tsRange)).as("rts"),
        pmod(col("id"), lit(1000L)).as("price"))
      .write.mode("overwrite").parquet(s"$dir/right.parquet")
    val left = spark.read.parquet(s"$dir/left.parquet")
    val rawRight = spark.read.parquet(s"$dir/right.parquet")
    val preAgg = rawRight.groupBy(col("k"), col("rts"))
      .agg(max(col("price")).as("price"))
    preAgg.write.mode("overwrite").parquet(s"$dir/right_preagg.parquet")
    val right = spark.read.parquet(s"$dir/right_preagg.parquet")
    val (rawN, aggN) = (rawRight.count(), right.count())
    println(f"""{"duel":"asofskew_preagg","raw_right_rows":$rawN,"preagg_rows":$aggN,"reduction":${rawN.toDouble / aggN}%.2f}""")

    // slice width: cuts the hot key's history into 64 slices
    val width = tsRange / 64
    // the funnel: max rows one window-sort partition receives
    def maxPart(groups: Seq[org.apache.spark.sql.Column]): Long = {
      val l = left.select(col("k"), col("ts"))
      val r = right.select(col("k"), col("rts").as("ts"))
      l.unionByName(r).groupBy(groups: _*).count()
        .agg(max(col("count"))).head().getLong(0)
    }
    val plainFunnel = maxPart(Seq(col("k")))
    val slicedFunnel = maxPart(Seq(col("k"), floor(col("ts") / width)))
    println(s"""{"duel":"asofskew_funnel","plain_max_sort_rows":$plainFunnel,"sliced_max_sort_rows":$slicedFunnel,"funnel_cut":${plainFunnel / slicedFunnel}}""")

    def run(w: Long): DataFrame = graft.operators.Joins.asOf(
      left, right, Seq("k"), "ts", "rts", Seq("rts", "price"), sliceWidth = w)
    def checksum(df: DataFrame): (Long, Long, Long) = {
      // order-insensitive, ANSI-overflow-proof: xor + modular sum + count
      val row = df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)"), sum(pmod(col("h"), lit(1000000007L))), count(lit(1))).head()
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }
    run(0L).write.format("noop").mode("overwrite").save() // warm
    run(width).write.format("noop").mode("overwrite").save()
    val plainW = (1 to 3).map(_ => timed("asofskew_plain") {
      run(0L).write.format("noop").mode("overwrite").save() }).sorted.apply(1)
    val slicedW = (1 to 3).map(_ => timed("asofskew_sliced") {
      run(width).write.format("noop").mode("overwrite").save() }).sorted.apply(1)
    require(checksum(run(0L)) == checksum(run(width)),
      "sliced as-of diverged from the plain plan on the skew corpus")
    println(f"""{"duel":"asofskew_summary","rows":${nL + aggN},"plain_sec":$plainW%.3f,"sliced_sec":$slicedW%.3f,"speedup":${plainW / slicedW}%.2f,"funnel_cut":${plainFunnel / slicedFunnel}}""")
  }

  /** Store-compaction wall-clock probe (r11 verdict item 5's 100 TB
    * story): a 4M-row digest store compacted against a 2.4M-row live-id
    * frame (60% survival — a year of retirements). The claim under test:
    * compaction is ONE job over narrow frames (40-byte digest rows + the
    * id column), cost independent of corpus text; the TTL variant is a
    * row-local filter (zero shuffle). */
  /** Incremental-SemDeDup lifecycle duel (r13 sf3 follow-up). The sf3
    * probe caught q_semdedup_incr SUPERLINEAR (warm 5.2 s at sf1 → 67 s at
    * sf3 for 3× data): the catalog query freezes the cluster count at the
    * original 400-row corpus's k=8 while the batch grows with SF, so the
    * within-cell comparison count grows quadratically. The operator knob
    * that prevents it is occupancy-right clustering
    * ([[graft.operators.Similarity.nlistFor]] / semDedupRecluster). Two
    * tables:
    *  - lifecycle: a FIXED 1.6k-row increment against stores grown ×m —
    *    frozen k=8 pays occupancy ∝ store size; after semDedupRecluster
    *    the per-increment cost stays flat;
    *  - big-batch (the catalog/sf3 shape): one m×1.6k-row batch against
    *    the fixed 400-row store — frozen k=8 is quadratic in m; deriving
    *    k from the total population is ~linear.
    * Recall pin: a probe row duplicating a stored vector must be flagged
    * under every configuration (identical vectors co-locate at any k). */
  private def semincrDuel(): Unit = {
    val spark = GraftSession.getOrCreate()
    val S = graft.operators.Similarity
    val embs = GraftSession.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val corpus = embs.filter(col("vec_id") < 400).localCheckpoint()
    val unit = embs.filter(col("vec_id") >= 400)
    val cents8 = S.kmeansCentroids(corpus, col("vec_id"), col("embedding"), k = 8)
    // one scan regardless of m (a union of m branches re-plans the scan
    // per branch and bloats the plan tree past m ≈ 100)
    def copies(m: Int): DataFrame = unit
      .crossJoin(spark.range(m).select(col("id").as("__i")))
      .select((col("vec_id") + col("__i") * lit(1000000000L)).as("vec_id"),
        col("embedding"))
    // the next increment: ids above every grown-store id
    val inc = unit.select((col("vec_id") + lit(900L * 1000000000L)).as("vec_id"),
      col("embedding")).localCheckpoint()
    def maxCell(s: DataFrame): Long =
      s.groupBy("cell").agg(count(lit(1)).as("n")).agg(max("n")).head.getLong(0)
    def wall(runs: Int)(body: => Unit): Double = {
      val ws = (1 to runs).map(_ => timed("semincr_run")(body)).sorted
      ws(ws.length / 2)
    }
    // a duplicate of stored vec_id=123 must be flagged dup everywhere
    def recallOk(cents: Array[Array[Double]], store: DataFrame): Boolean = {
      val probe = embs.filter(col("vec_id") === 123L)
        .select(lit(999000000000L).as("vec_id"), col("embedding"))
      S.semDedupIncremental(probe, col("vec_id"), col("embedding"), cents, store,
        threshold = 0.95).filter(!col("keep")).count() == 1
    }
    for (m <- Seq(4, 16, 64, 256)) {
      val grown = corpus.unionByName(copies(m))
      val storeF = S.semDedupStore(grown, col("vec_id"), col("embedding"), cents8)
        .localCheckpoint()
      val (centsK, storeKRaw) = S.semDedupRecluster(storeF, targetClusterSize = 256L)
      val storeK = storeKRaw.localCheckpoint()
      val runs = if (m >= 64) 1 else 3
      val fz = wall(runs) {
        S.semDedupIncremental(inc, col("vec_id"), col("embedding"), cents8, storeF)
          .write.format("noop").mode("overwrite").save()
      }
      val tn = wall(runs) {
        S.semDedupIncremental(inc, col("vec_id"), col("embedding"), centsK, storeK)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"""{"duel":"semincr_lifecycle","m":$m,"store_rows":${400 + 1600 * m},"k_tuned":${centsK.length},"frozen_sec":$fz%.3f,"tuned_sec":$tn%.3f,"max_cell_frozen":${maxCell(storeF)},"max_cell_tuned":${maxCell(storeK)},"recall_frozen":${recallOk(cents8, storeF)},"recall_tuned":${recallOk(centsK, storeK)}}""")
    }
    val store400 = S.semDedupStore(corpus, col("vec_id"), col("embedding"), cents8)
      .localCheckpoint()
    for (m <- Seq(4, 16, 32)) {
      val batch = copies(m).localCheckpoint()
      val bn = 1600L * m
      val runs = if (m >= 32) 1 else 3
      val fz = wall(runs) {
        S.semDedupIncremental(batch, col("vec_id"), col("embedding"), cents8, store400)
          .write.format("noop").mode("overwrite").save()
      }
      val kB = S.nlistFor(400L + bn, 256L)
      val centsB = S.kmeansCentroids(corpus.unionByName(batch), col("vec_id"),
        col("embedding"), kB)
      val storeB = S.semDedupStore(corpus, col("vec_id"), col("embedding"), centsB)
        .localCheckpoint()
      val tn = wall(runs) {
        S.semDedupIncremental(batch, col("vec_id"), col("embedding"), centsB, storeB)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"""{"duel":"semincr_bigbatch","m":$m,"batch_rows":$bn,"k_tuned":$kB,"frozen_sec":$fz%.3f,"tuned_sec":$tn%.3f,"recall_frozen":${recallOk(cents8, store400)},"recall_tuned":${recallOk(centsB, storeB)}}""")
    }
  }

  private def compactProbe(): Unit = {
    val spark = GraftSession.getOrCreate()
    val n = 4000000L
    val dir = "/root/repo/target/compact_probe"
    spark.range(n).select(md5(col("id").cast("string")).as("content_hash"),
        col("id").as("corpus_rep"),
        (col("id") % 365).as("appended_at"))
      .write.mode("overwrite").parquet(s"$dir/store.parquet")
    spark.range(n).filter(col("id") % 5 < 3).select(col("id"))
      .write.mode("overwrite").parquet(s"$dir/live.parquet")
    val store = spark.read.parquet(s"$dir/store.parquet")
    val live = spark.read.parquet(s"$dir/live.parquet")
    val walls = (1 to 3).map(_ => timed("compact_live") {
      graft.operators.Dedup.compactStore(store, col("corpus_rep"), live, col("id"))
        .write.format("noop").mode("overwrite").save()
    }).sorted
    val kept = graft.operators.Dedup.compactStore(
      store, col("corpus_rep"), live, col("id")).count()
    val ttlWalls = (1 to 3).map(_ => timed("compact_ttl") {
      graft.operators.Dedup.compactStoreTtl(store, col("appended_at"), 100L)
        .write.format("noop").mode("overwrite").save()
    }).sorted
    val ttlKept = graft.operators.Dedup.compactStoreTtl(
      store, col("appended_at"), 100L).count()
    println(f"""{"duel":"compact_summary","store_rows":$n,"live_rows":${n * 3 / 5},"kept":$kept,"median_sec":${walls(1)}%.3f,"ttl_kept":$ttlKept,"ttl_median_sec":${ttlWalls(1)}%.3f}""")
  }

  /** Stage breakdown for q_dedup_clusters at sf1 (sf1 gate follow-up):
    * the catalog entry costs ~10 s while the identically-configured
    * q_ngram_jaccard pair generation alone costs ~1.5 s. Times each stage
    * of [[graft.operators.Dedup.nearDupClusters]] separately — candidate
    * pairs, symmetric-distinct edge materialization, the bounded
    * small-graph collect gate, driver union-find + label frame — to
    * attribute the gap before optimizing. Requires target/sf1 (Sf1Gen). */
  private def dedupClusterProbe(): Unit = {
    val spark = GraftSession.getOrCreate()
    val docs = GraftSession.table(spark, "/root/repo/target/sf1", "documents")
    def pairs() = graft.operators.Dedup.ngramJaccardPairs(
      docs, col("text"), col("doc_id"),
      shingleN = 2, threshold = 0.8, maxShingleFreq = 200)
    val tPairs = (1 to 3).map(_ => timed("dc_pairs_only") {
      pairs().write.format("noop").mode("overwrite").save()
    }).sorted
    val p = pairs()
    // OLD formulation (pre-r13): symmetric swap-union — Catalyst computes
    // the candidate-pair pipeline once per union branch, then distincts 2×
    // the rows. Kept here as the duel baseline.
    val edgesSwap = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
    val tEdgesSwap = timed("dc_edges_swap_union") {
      edgesSwap.write.format("noop").mode("overwrite").save()
    }
    // NEW formulation: undirected distinct pair set (large-star
    // symmetrizes internally each round).
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tEdges = timed("dc_edges_undirected") {
      edges.write.format("noop").mode("overwrite").save()
    }
    val nEdges = edges.count()
    import spark.implicits._
    var collected = 0
    val tGate = timed("dc_collect_gate") {
      collected = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)].limit(1000001).collect().length
    }
    edges.unpersist()
    val tFull = (1 to 3).map(_ => timed("dc_full") {
      graft.operators.Dedup.nearDupClusters(pairs(), col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }).sorted
    println(f"""{"duel":"dedup_cluster_summary","pairs_median_sec":${tPairs(1)}%.3f,"edges_swap_sec":$tEdgesSwap%.3f,"edges_sec":$tEdges%.3f,"edges":$nEdges,"gate_sec":$tGate%.3f,"collected":$collected,"full_median_sec":${tFull(1)}%.3f}""")
  }

  private def rewriteDuel(): Unit = {
    val spark = GraftSession.getOrCreate()
    val widthConf = "spark.graft.rangeJoin.bucketWidth"
    // ×4 stage: TIME-SHIFTED copies (each copy 400·i days later) — the
    // 100 TB shape is a LONGER time range at similar density, so matched
    // pairs grow ×4 while the naive BNL's compare count grows ×16
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "4").toInt
    val scaledDir = "/root/repo/target/sf_scaled_rewrite"
    val ev01 = GraftSession.table(spark, "/root/testdata/sf0.1", "events")
    (0 until factor).map { i =>
      ev01.withColumn("ts", col("ts") + expr(s"INTERVAL ${400 * i} DAY"))
        .withColumn("event_id", col("event_id") + lit(i * 1000000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scaledDir/events.parquet")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", scaledDir)) {
      val sf = dir.split('/').last match {
        case "sf_scaled_rewrite" => s"sf0.1x$factor"
        case other => other
      }
      def naiveDf = {
        val ev = GraftSession.table(spark, dir, "events")
        val twoHoursUs = 2L * 3600 * 1000000
        val intervals = ev
          .filter(col("event_type") === "signup" && col("event_id") % 5 === 0)
          .select(col("event_id").as("interval_id"),
            unix_micros(col("ts")).as("lo"),
            (unix_micros(col("ts")) + twoHoursUs).as("hi"))
        val points = ev.filter(col("event_type") === "click")
          .select(unix_micros(col("ts")).as("p"))
        points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
          .groupBy(col("interval_id")).agg(count(lit(1)).as("n"))
      }
      spark.conf.unset(widthConf)
      // full (interval_id, n) MULTISET pin, not just the group count: an
      // n-inflating duplicate-emission bug in the bucketed plan would
      // keep the count identical while every n is wrong
      val naiveGroups = naiveDf.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val naiveRows = naiveGroups.size.toLong
      val naivePlan = naiveDf.queryExecution.executedPlan.toString
      require(naivePlan.contains("BroadcastNestedLoopJoin"),
        s"expected the naive plan to be a BNL:\n${naivePlan.take(1500)}")
      val naive = timed(s"rewrite_naive_$sf") {
        naiveDf.write.format("noop").mode("overwrite").save()
      }
      spark.conf.set(widthConf, (2L * 3600 * 1000000).toString)
      val rewrittenGroups = naiveDf.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      require(rewrittenGroups == naiveGroups,
        s"rewrite changed results: ${rewrittenGroups.size} vs $naiveRows groups, " +
          s"first diff ${naiveGroups.zip(rewrittenGroups).find(p => p._1 != p._2)}")
      val rewritten = timed(s"rewrite_bucketed_$sf") {
        naiveDf.write.format("noop").mode("overwrite").save()
      }
      spark.conf.unset(widthConf)
      println(f"""{"duel":"rewrite_$sf","naive_over_bucketed":${naive / rewritten}%.2f,"groups":$naiveRows}""")
    }
    // interval-OVERLAP shape: the same naive-vs-rule duel for the second
    // rewritable form (2h signup sessions × 1h error windows, sf0.1)
    {
      def overlapDf = {
        val ev = GraftSession.table(spark, "/root/testdata/sf0.1", "events")
        val hourUs = 3600L * 1000000
        val a = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("a_id"), unix_micros(col("ts")).as("a_lo"),
            (unix_micros(col("ts")) + 2 * hourUs).as("a_hi"))
        val b = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("b_id"), unix_micros(col("ts")).as("b_lo"),
            (unix_micros(col("ts")) + hourUs).as("b_hi"))
        a.join(b, col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
          .groupBy(col("a_id")).agg(count(lit(1)).as("n"))
      }
      spark.conf.unset(widthConf)
      // full (a_id, n) multiset, not the group count: with width (1h) <
      // interval length (2h) every a-interval spans 3 bins, and duplicate
      // pair emission — the exact failure mode this configuration
      // stresses — would inflate n while leaving the group count intact
      val naiveGroups = overlapDf.collect().map(_.toSeq).sortBy(_.toString)
      require(overlapDf.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"), "expected the naive BNL baseline")
      val naive = timed("overlap_naive_sf0.1") {
        overlapDf.write.format("noop").mode("overwrite").save()
      }
      spark.conf.set(widthConf, (3600L * 1000000).toString)
      // structural pin (same walk as the catalog gate), not a string grep
      require(graft.plans.PlanLint.binJoinFired(overlapDf.queryExecution.optimizedPlan),
        "expected the bucketed overlap rewrite to fire")
      require(overlapDf.collect().map(_.toSeq).sortBy(_.toString)
        .sameElements(naiveGroups), "overlap rewrite changed results")
      val rewritten = timed("overlap_bucketed_sf0.1") {
        overlapDf.write.format("noop").mode("overwrite").save()
      }
      spark.conf.unset(widthConf)
      println(f"""{"duel":"overlap_sf0.1","naive_over_bucketed":${naive / rewritten}%.2f,"groups":${naiveGroups.length}}""")
    }
  }

  /** Bloom semi-join reduction duel: the SAME ×factor event table
    * semi-joined to a ~0.03%-selectivity key set, (a) plain shuffled
    * semi-join with broadcast disabled — the plan shape once the key set
    * outgrows the broadcast threshold — vs (b) bloomSemiJoin under the
    * same conf. The bloom prefilter cuts the big-side shuffle input to
    * matches + fpp noise; reported: both walls, the ratio, and the match
    * count (sanity that both produce identical results). */
  private def bloomDuel(factor: Int): Unit = {
    import graft.operators.Joins
    val spark = GraftSession.getOrCreate()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val base = GraftSession.table(spark, "/root/testdata/sf0.1", "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val dir = "/root/repo/target/sp_bloom_duel"
    (0 until factor).map(i =>
        base.withColumn("event_id", col("event_id") + lit(i * 1000000000L)))
      .reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // materialize the key set as an OPAQUE parquet table: derived from a
    // predicate, Catalyst's InferFiltersFromConstraints would copy that
    // predicate onto the fact scan and prefilter it for free — a fixture
    // artifact; real key sets are arbitrary id lists with no algebraic
    // definition, which is exactly what a parquet round-trip produces
    base.filter(col("event_type") === "signup" && col("event_id") % 37 === 0)
      .select(col("event_id").as("key"))
      .write.mode("overwrite").parquet(s"$dir-keys")
    val keys = spark.read.parquet(s"$dir-keys")
    def runPlain(): Unit =
      fact.join(keys.withColumnRenamed("key", "event_id"), Seq("event_id"), "left_semi")
        .write.format("noop").mode("overwrite").save()
    def runBloom(): Unit =
      Joins.bloomSemiJoin(fact, "event_id", keys, "key")
        .write.format("noop").mode("overwrite").save()
    // local[32] shuffles at memory speed, so wall time hides what a
    // network-bound cluster pays — count shuffle WRITE bytes per run too.
    // Attribution is made exact by DRAINING the async listener bus before
    // zeroing and before reading (waitUntilEmpty, the technique Spark's own
    // tests use), and the listener is removed once the duel is done so
    // nothing bleeds into later probes sharing the session.
    val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleListener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffled.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(shuffleListener)
    def bytesOf(body: => Unit): Long = {
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      shuffled.set(0); body
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      shuffled.get()
    }
    // Spark 4 auto-injects its own runtime bloom filter when the keys side
    // carries a selective predicate — report whether it fired, and duel a
    // third variant with injection off: the keys-are-a-plain-table shape
    // (no creation-side predicate) where auto-injection never applies and
    // the explicit operator is the only reduction available.
    val plainPlan = fact.join(keys.withColumnRenamed("key", "event_id"),
      Seq("event_id"), "left_semi").queryExecution.executedPlan.toString
    println(s"""{"probe":"bloom_semi","spark_runtime_filter_in_plain_plan":${plainPlan.contains("might_contain")}}""")
    def noRuntimeFilter[A](body: => A): A = {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      spark.conf.set("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "false")
      try body finally {
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
        spark.conf.unset("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled")
      }
    }
    runPlain(); runBloom() // warm
    val pT = timed("semi_join_plain_shuffle")(runPlain())
    val nT = noRuntimeFilter(timed("semi_join_no_runtime_filter")(runPlain()))
    val bT = timed("semi_join_bloom_prefilter")(runBloom())
    val pB = bytesOf(runPlain())
    val nB = noRuntimeFilter(bytesOf(runPlain()))
    val bB = bytesOf(runBloom())
    println(f"""{"duel":"bloom_semi_no_injection","no_filter_bytes":$nB,"no_filter_over_bloom_wall":${nT / bT}%.2f}""")
    spark.sparkContext.removeSparkListener(shuffleListener)
    val nPlain = fact.join(keys.withColumnRenamed("key", "event_id"),
      Seq("event_id"), "left_semi").count()
    val nBloom = Joins.bloomSemiJoin(fact, "event_id", keys, "key").count()
    require(nPlain == nBloom, s"bloom semi-join diverged: $nPlain vs $nBloom")
    println(f"""{"duel":"bloom_semi","plain_over_bloom_wall":${pT / bT}%.2f,""" +
      f""""plain_shuffle_bytes":$pB,"bloom_shuffle_bytes":$bB,""" +
      f""""shuffle_reduction":${pB.toDouble / math.max(bB, 1)}%.1f,""" +
      f""""fact_rows":${fact.count()},"matches":$nPlain}""")
  }

  /** Quantized-ANN store duel: the SAME ×factor embedding corpus persisted
    * (a) float32 and (b) int8-quantized (quantize ONCE at write time, the
    * deployment shape), then brute-force cosine top-5 for the fixed query
    * batch from each store. Reported: store bytes on disk, search walls,
    * and the ratio — the int8 path reads ~¼ the bytes and runs the same
    * codegen'd dot kernel over bytes. */
  private def quantDuel(factor: Int): Unit = {
    import graft.operators.Similarity
    val spark = GraftSession.getOrCreate()
    val base = GraftSession.table(spark, "/root/testdata/sf0.1", "embeddings")
    val big = (0 until factor).map(i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * 1000000000L)))
      .reduce(_ unionByName _)
    val dir = "/root/repo/target/sp_quant_duel"
    big.select(col("vec_id"), col("embedding"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/f32")
    big.select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("qe"))
      .repartition(32).write.mode("overwrite").parquet(s"$dir/i8")
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.isFile).map(_.length()).sum
    }
    println(s"""{"probe":"quant_store","f32_bytes":${dirBytes(s"$dir/f32")},"i8_bytes":${dirBytes(s"$dir/i8")}}""")
    val queries = base.filter(col("vec_id") < 5)
    val f32 = spark.read.parquet(s"$dir/f32")
    val i8 = spark.read.parquet(s"$dir/i8")
    def runF(): Unit = Similarity.cosineTopK(f32, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .write.format("noop").mode("overwrite").save()
    def runQ(): Unit = Similarity.cosineTopKPreQuantized(i8, col("vec_id"), col("qe"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .write.format("noop").mode("overwrite").save()
    runF(); runQ() // warm
    val fT = timed(s"ann_float32_x$factor")(runF())
    val qT = timed(s"ann_int8_store_x$factor")(runQ())
    println(f"""{"duel":"quant_ann","float_over_int8_wall":${fT / qT}%.2f}""")
    spark.stop()
  }

  /** Product-quantization duel: ×factor embeddings corpus (copies
    * deterministically perturbed so vectors stay distinct), stored (a) as
    * float32 and (b) as PQ codes (m=8 × ksub=16 → array<tinyint>), then
    * 5-query top-5 ANN from each store. Reported: store bytes, wall, and
    * — the scale-critical quantity for a LOSSY method — recall@5 of the
    * PQ ranking against the exact brute-force ranking on the same corpus.
    * Lloyd-refined codebooks (2 rounds) are the production path measured
    * here; the oracle query keeps lloydIters=0 for replayability. */
  private def pqDuel(factor: Int): Unit = {
    import graft.operators.Similarity
    val spark = GraftSession.getOrCreate()
    val base = GraftSession.table(spark, "/root/testdata/sf0.1", "embeddings")
    val big = (0 until factor).map { i =>
      base.select((col("vec_id") + lit(i * 1000000000L)).as("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, p) => x + (pmod(p * (i + 1), lit(5)) - lit(2)) * lit(0.01))
          .as("embedding"))
    }.reduce(_ unionByName _)
    val dir = "/root/repo/target/sp_pq_duel"
    big.repartition(32).write.mode("overwrite").parquet(s"$dir/f32")
    def dirBytes(p: String): Long = new java.io.File(p)
      .listFiles().filter(_.isFile).map(_.length()).sum
    // 25 queries x top-5 = 125 ranked pairs per recall estimate (5 queries
    // put one hit of noise at +-0.04 recall — too coarse to read the knob)
    val queries = base.filter(col("vec_id") < 25)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val f32 = spark.read.parquet(s"$dir/f32")
    def runExact(): DataFrame = Similarity.cosineTopK(f32, col("vec_id"),
      col("embedding"), queries, col("vec_id"), col("embedding"), k = 5)
    runExact().write.format("noop").mode("overwrite").save() // warm
    val eT = timed(s"pq_exact_f32_x$factor") {
      runExact().write.format("noop").mode("overwrite").save() }
    val exactSet = runExact().collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // points on the (m, ksub) knobs: bytes/vector = m (codes), recall rises
    // with both — m shrinks each subspace, ksub densifies its codebook
    for ((m, ksub) <- Seq((8, 16), (8, 64), (16, 64))) {
      val cb = Similarity.pqCodebooks(big, col("vec_id"), col("embedding"),
        m = m, ksub = ksub, lloydIters = 2)
      Similarity.pqEncode(big, col("vec_id"), col("embedding"), cb)
        .select(col("id"), col("codes").cast("array<tinyint>").as("codes"))
        .repartition(32).write.mode("overwrite").parquet(s"$dir/pq_$m")
      // PQ side scores straight from the stored codes (pqTopK re-derives
      // the codebook internally for API simplicity; this mirrors its
      // scoring stage over the pre-encoded store — the 100 TB read path)
      val codesDf = spark.read.parquet(s"$dir/pq_$m")
        .select(col("id").as("corpus_id"), col("codes").cast("array<int>").as("codes"))
      def runPq(): DataFrame = {
        val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
          .withColumn("qnrm", sqrt(graft.expressions.VectorExpressions.vecDot(col("qv"), col("qv"))))
        val xhat = concat(cb.zipWithIndex.map { case (codebook, j) =>
          val cbj = array(codebook.map(c => array(c.map(lit): _*)): _*)
          element_at(cbj, col("codes")(j) + 1)
        }: _*)
        val xn = sqrt(graft.expressions.VectorExpressions.vecDot(xhat, xhat))
        val sc = codesDf.crossJoin(broadcast(q)).select(col("query_id"), col("corpus_id"),
          round(graft.expressions.VectorExpressions.vecDot(col("qv"), xhat)
            / (col("qnrm") * xn), 6).as("score"))
        sc
      }
      def top(k: Int): Set[(Long, Long)] = Similarity.topKByScore(runPq(), k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Similarity.topKByScore(runPq(), 5)
        .write.format("noop").mode("overwrite").save() // warm
      val pT = timed(s"pq_codes_m${m}_x$factor") {
        Similarity.topKByScore(runPq(), 5)
          .write.format("noop").mode("overwrite").save() }
      val recall = (exactSet intersect top(5)).size.toDouble / exactSet.size
      // the production shape: PQ shortlists top-50 from codes alone, exact
      // re-rank touches float vectors only for the shortlist — this recall
      // is the one the two-stage pipeline actually delivers
      val shortlist = (exactSet intersect top(50)).size.toDouble / exactSet.size
      println(f"""{"duel":"pq_ann","m":$m,"ksub":$ksub,""" +
        f""""f32_bytes":${dirBytes(s"$dir/f32")},"pq_bytes":${dirBytes(s"$dir/pq_$m")},""" +
        f""""recall_at_5":$recall%.3f,"shortlist50_recall":$shortlist%.3f,""" +
        f""""exact_over_pq_wall":${eT / pT}%.2f}""")
    }
    spark.stop()
  }

  /** Z-order layout duel: the SAME ×factor event table written (a) hash-
    * layout and (b) Layout.zorderWrite on (user_id, ts), same file count;
    * then a conjunctive 2-D selective query (a 10-user band × 3 days)
    * against each. Parquet row-group pruning works off per-file min/max
    * stats, so the z layout — where every file covers a small user×time
    * rectangle — should read a fraction of the files the hash layout reads.
    * Reported: wall time warm AND the per-file stats-hit count (files whose
    * min/max admit the predicate — the quantity pruning actually uses). */
  private def zorderDuel(factor: Int): Unit = {
    import graft.sources.Layout
    val spark = GraftSession.getOrCreate()
    val dir = "/root/repo/target/sp_zorder_duel"
    val base = GraftSession.table(spark, "/root/testdata/sf0.1", "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("tus"))
    // scale time by stacking shifted copies (keeps per-user × per-day
    // density realistic instead of duplicating identical timestamps)
    val dayUs = 86400L * 1000000
    val big = (0 until factor).map(i =>
        base.withColumn("tus", col("tus") + lit(i * 31 * dayUs))
          .withColumn("event_id", col("event_id") + lit(i * 1000000000L)))
      .reduce(_ unionByName _)
    val files = 64
    big.repartition(files, col("event_id")).write.mode("overwrite").parquet(s"$dir/plain")
    Layout.zorderWrite(big, col("user_id"), col("tus"), s"$dir/zorder", files)

    val t0 = spark.read.parquet(s"$dir/plain")
      .agg(min(col("tus"))).collect()(0).getLong(0)
    def query(path: String): Long =
      spark.read.parquet(path)
        .filter(col("user_id").between(40, 49) && col("tus") >= t0 + 40 * dayUs &&
          col("tus") < t0 + 43 * dayUs)
        .agg(count(lit(1))).collect()(0).getLong(0)
    def statsHit(path: String): Long =
      spark.read.parquet(path).groupBy(input_file_name())
        .agg(min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
             min(col("tus")).as("tlo"), max(col("tus")).as("thi"))
        .filter(col("ulo") <= 49 && col("uhi") >= 40 &&
          col("tlo") < t0 + 43 * dayUs && col("thi") >= t0 + 40 * dayUs)
        .count()
    query(s"$dir/plain"); query(s"$dir/zorder") // warm
    val rows = query(s"$dir/plain")
    val pT = timed("zorder_duel_plain")(query(s"$dir/plain"))
    val zT = timed("zorder_duel_zorder")(query(s"$dir/zorder"))
    println(s"""{"zorder_rows":$rows,"plain_stats_hit_files":${statsHit(s"$dir/plain")},""" +
      s""""zorder_stats_hit_files":${statsHit(s"$dir/zorder")},"total_files":$files,""" +
      f""""zorder_speedup":${pT / zT}%.2f}""")
    spark.stop()
  }

  /** Avro split-read duel: ONE large single-file shard, read (a) as one
    * split — the per-file parallelism floor every non-splittable reader
    * shares — vs (b) sync-marker byte-range splits (AvroFiles.read via
    * DistributedRead.readRanges). At 100 TB the single-file case is the
    * straggler pattern (one fat shard pins one task for the whole stage);
    * the split read fans it across the cluster. */
  private def avroDuel(): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = "/root/repo/target/sp_avro_duel"
    val rep = sys.env.getOrElse("SPARK_GRAFT_AVRO_REP", "8").toInt
    val one = GraftSession.table(spark, "/root/testdata/sf0.1", "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))
    // replicate to a shard big enough that decode, not job overhead,
    // dominates — the regime where one fat file actually straggles
    val src = (0 until rep).map(i =>
      one.withColumn("l_orderkey", col("l_orderkey") + lit(i * 1000000000L)))
      .reduce(_ unionByName _)
    val paths = graft.sources.AvroFiles.write(src.repartition(1), dir, numShards = 1)
    val p = new org.apache.hadoop.fs.Path(paths.head)
    val len = p.getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(p).getLen
    val nSplits = 32
    def run(splitBytes: Long): Unit =
      graft.sources.AvroFiles.read(spark, paths.head, splitBytes)
        .write.format("noop").mode("overwrite").save()
    run(Long.MaxValue); run(len / nSplits) // warm both shapes
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val single = timed(run(Long.MaxValue))
    val split = timed(run(len / nSplits))
    println(f"""{"avro_file_mb":${len / 1e6}%.1f,"rows":${src.count()},""" +
      f""""single_split_sec":$single%.3f,"split_${nSplits}_sec":$split%.3f,""" +
      f""""split_speedup":${single / split}%.2f}""")
    spark.stop()
  }

  /** Hot-key fanout skew duel (reference motivation: Combine.java:1598
    * withHotKeyFanout — pre-aggregate a hot key across `fanout` salted
    * sub-keys so its combine doesn't funnel through one worker).
    *
    * Input: 90% of all rows on ONE key, the rest uniform over 100k keys,
    * 256 input partitions (standing in for a wide map stage). Two aggregate
    * regimes, each plain-groupBy vs salted two-stage
    * ([[Aggregates.sumPerKeyWithFanout]] and a bag-building analogue):
    *
    *  - `sum` (algebraic): Spark's map-side partial aggregation already
    *    reduces the hot key to ONE partial row per map task before the
    *    shuffle — the exact job Beam's fanout does by hand. The salt only
    *    adds a second shuffle.
    *  - `bag` (holistic collect_list): ObjectHashAggregate still runs a
    *    partial mode — each map task ships ONE partial bag per key — so the
    *    record funnel never materializes here either (the hot bag itself is
    *    assembled in one reducer in both formulations; that cost is
    *    irreducible for bag semantics).
    *  - `mapg` (groupByKey().mapGroups — the combiner-less raw-GBK → DoFn
    *    shape that Beam's fanout actually targets): NO partial aggregation
    *    exists; every hot-key row ships to one reducer task. The salt
    *    splits that funnel across `fanout` tasks.
    *
    * Recorded per run: wall seconds AND max shuffle-read records/bytes of
    * any single task — the funnel, not the average, is what OOMs at 100 TB.
    * Note AQE's skew handling splits skewed JOIN partitions only, not
    * aggregations, so it cannot rescue mapg_plain. Bag results compare as
    * multisets (count / sum / xor-hash per key) before timing. */
  private def hotkeyDuel(): Unit = {
    val spark = GraftSession.getOrCreate()
    val fanout = 32
    val n = sys.env.getOrElse("SPARK_GRAFT_HOTKEY_ROWS", "8000000").toLong
    val rows = spark.range(0, n, 1, 256).select(
      when(col("id") % 10 < 9, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 100000)).as("key"),
      (col("id") % 1000000).as("v"))
    @volatile var maxTaskRecords = 0L
    @volatile var maxTaskBytes = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).map(_.shuffleReadMetrics).foreach { m =>
          if (m.recordsRead > maxTaskRecords) maxTaskRecords = m.recordsRead
          val b = m.localBytesRead + m.remoteBytesRead
          if (b > maxTaskBytes) maxTaskBytes = b
        }
    })
    def sumPlain(): DataFrame =
      rows.groupBy(col("key")).agg(sum(col("v")).as("sum_value"))
    def sumSalted(): DataFrame =
      Aggregates.sumPerKeyWithFanout(rows, col("key"), col("v"), fanout)
    def bagPlain(): DataFrame =
      rows.groupBy(col("key")).agg(collect_list(col("v")).as("bag"))
    def bagSalted(): DataFrame =
      rows.withColumn("__salt", pmod(xxhash64(col("v")), lit(fanout)))
        .groupBy(col("key"), col("__salt"))
        .agg(collect_list(col("v")).as("part"))
        .groupBy(col("key"))
        .agg(flatten(collect_list(col("part"))).as("bag"))
    // the combiner-less per-key-iterator shape (Beam raw GBK → DoFn):
    // count via mapGroups so no partial aggregation can be planned
    import spark.implicits._
    def typed = rows.select(col("key").as("_1"), col("v").as("_2")).as[(String, Long)]
    def mapgPlain(): DataFrame = typed.groupByKey(_._1)
      .mapGroups((k, it) => (k, it.size.toLong)).toDF("key", "n_rows")
    def mapgSalted(): DataFrame = typed
      .groupByKey(r => (r._1, r._2 % fanout))
      .mapGroups((ks: (String, Long), it: Iterator[(String, Long)]) =>
        (ks._1, it.size.toLong))
      .toDF("key", "partial")
      .groupBy(col("key")).agg(sum(col("partial")).as("n_rows"))
    // multiset equality of the bag formulations (order-insensitive invariants)
    def bagSig(df: DataFrame): DataFrame = df.select(col("key"),
      size(col("bag")).as("m"),
      aggregate(col("bag"), lit(0L), (a, x) => a + x).as("s"),
      aggregate(col("bag"), lit(0L), (a, x) => a.bitwiseXOR(xxhash64(x))).as("h"))
    require(bagSig(bagPlain()).exceptAll(bagSig(bagSalted())).isEmpty &&
      sumPlain().exceptAll(sumSalted()).isEmpty &&
      mapgPlain().exceptAll(mapgSalted()).isEmpty,
      "salted formulations must agree with plain groupBy")
    def run(tag: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val samples = Seq.fill(3) {
        maxTaskRecords = 0L; maxTaskBytes = 0L
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // let straggler task-end events drain
        (s, maxTaskRecords, maxTaskBytes)
      }
      val (sec, maxRec, maxB) = samples.sortBy(_._1).apply(1)
      println(f"""{"duel":"hotkey_$tag","sec":$sec%.3f,""" +
        f""""max_task_shuffle_rows":$maxRec,"max_task_shuffle_mb":${maxB / 1e6}%.1f}""")
    }
    run("sum_plain")(sumPlain()); run("sum_salted")(sumSalted())
    run("bag_plain")(bagPlain()); run("bag_salted")(bagSalted())
    run("mapg_plain")(mapgPlain()); run("mapg_salted")(mapgSalted())
    spark.stop()
  }

  /** Round-10 probes: the scale-critical quantity of each new operator.
    * DSIR — model rows bounded by `buckets` (the broadcast stays MBs at any
    * corpus size); BPE learning — per-round pair-aggregate input bounded by
    * vocab symbols, not corpus tokens; kmeans — per-round driver state is
    * k×dim; tf.Example — row-local wall ratio; incremental semdedup —
    * within-cell compare pairs under auto nlist. Scaled corpus = ×factor
    * perturbed copies (texts get a distinct suffix so vocab/dedup state
    * GROWS — plain replication would flatter every vocabulary-bounded
    * claim). */
  private def r10OpsProbe(factor: Int): Unit = {
    import graft.operators.{Bpe, Dsir, Similarity}
    import graft.sources.TfExampleIO
    val base = "/root/testdata/sf0.1"
    val out = "/root/repo/target/sf_scaled_r10"
    val spark = GraftSession.getOrCreate()
    import spark.implicits._

    Seq("documents" -> Seq("doc_id"), "embeddings" -> Seq("vec_id"))
      .foreach { case (name, ids) =>
        val t = GraftSession.table(spark, base, name)
        (0 until factor).map { i =>
          val rekeyed = ids.foldLeft(t)((d, c) =>
            d.withColumn(c, col(c) + lit(i * 1000000000L)))
          if (name == "documents" && i > 0)
            rekeyed.withColumn("text",
              concat(col("text"), lit(s" copyvariant$i")))
          else rekeyed
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$out/$name.parquet")
      }

    def docsAt(dir: String) = GraftSession.table(spark, dir, "documents")
    def embsAt(dir: String) = GraftSession.table(spark, dir, "embeddings")

    // 1. DSIR: model rows (≤ buckets, the broadcast bound) + wall ratio
    def dsirModelRows(dir: String): Long =
      Dsir.hashedCounts(docsAt(dir), col("doc_id"), col("text"),
        col("lang") === "en", 1 << 16).select(col("bucket")).distinct().count()
    def dsirRun(dir: String): Unit =
      Dsir.importanceWeights(docsAt(dir), col("doc_id"), col("text"),
        col("lang") === "en", 1 << 16).write.format("noop").mode("overwrite").save()
    dsirRun(base); dsirRun(out) // warm
    val dB = timed("dsir_base")(dsirRun(base))
    val dN = timed(s"dsir_x$factor")(dsirRun(out))
    println(f"""{"dsir_model_rows_base":${dsirModelRows(base)},""" +
      f""""dsir_model_rows_x$factor":${dsirModelRows(out)},"dsir_bucket_cap":${1 << 16},""" +
      f""""dsir_wall_ratio":${dN / dB}%.2f}""")

    // 2. BPE learning: vocab rows + symbol count at both scales (the
    // per-round aggregate input), wall for 4 rounds
    def bpeVocab(dir: String): (Long, Long) = {
      val v = docsAt(dir).select(explode(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f"))
      (v.count(), v.agg(sum(length(col("w")))).head().getLong(0))
    }
    val (vB, sB) = bpeVocab(base); val (vN, sN) = bpeVocab(out)
    val bT = timed("bpe_learn4_base") {
      Bpe.learnMerges(docsAt(base), col("text"), rounds = 4)
    }
    val bTN = timed(s"bpe_learn4_x$factor") {
      Bpe.learnMerges(docsAt(out), col("text"), rounds = 4)
    }
    println(f"""{"bpe_vocab_rows_base":$vB,"bpe_vocab_rows_x$factor":$vN,""" +
      f""""bpe_vocab_syms_base":$sB,"bpe_vocab_syms_x$factor":$sN,""" +
      f""""bpe_wall_ratio":${bTN / bT}%.2f}""")

    // 3. kmeans: wall ratio (per-round driver state is k×dim regardless)
    def kmRun(dir: String): Unit =
      Similarity.kmeans(embsAt(dir), col("vec_id"), col("embedding"),
        k = 16, iters = 2).write.format("noop").mode("overwrite").save()
    kmRun(base); kmRun(out) // warm
    val kB = timed("kmeans_base")(kmRun(base))
    val kN = timed(s"kmeans_x$factor")(kmRun(out))
    println(f"""{"kmeans_state_doubles":${16 * 64},"kmeans_wall_ratio":${kN / kB}%.2f}""")

    // 4. tf.Example round-trip: row-local, ratio should track row count
    def tfRun(dir: String): Unit = {
      val d = docsAt(dir).select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      TfExampleIO.decodeBytes(TfExampleIO.encodeRows(d), d.schema)
        .write.format("noop").mode("overwrite").save()
    }
    tfRun(base); tfRun(out) // warm
    val tB = timed("tfexample_base")(tfRun(base))
    val tN = timed(s"tfexample_x$factor")(tfRun(out))
    println(f"""{"tfexample_wall_ratio":${tN / tB}%.2f}""")

    // 5. incremental semdedup: within-cell compare pairs, auto nlist —
    // batch = 1/8 of each corpus, store = the rest
    def sdiPairs(dir: String): (Long, Long) = {
      val e = embsAt(dir)
      val n = e.count()
      val cut = e.agg(expr("percentile_approx(vec_id, 0.875)")).head().getLong(0)
      val nlist = Similarity.nlistFor(n)
      val cents = Similarity.kmeansCentroids(
        e.filter(col("vec_id") < cut), col("vec_id"), col("embedding"), nlist)
      val store = Similarity.semDedupStore(
        e.filter(col("vec_id") < cut), col("vec_id"), col("embedding"), cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("nc"))
      val batch = Similarity.assignToCentroids(
        e.filter(col("vec_id") >= cut), col("vec_id"), col("embedding"), cents)
        .groupBy(col("cell")).agg(count(lit(1)).as("nb"))
      val pairs = store.join(batch, "cell")
        .agg(sum(col("nc") * col("nb"))).head().getLong(0)
      (pairs, nlist.toLong)
    }
    val (pB, nlB) = sdiPairs(base); val (pN, nlN) = sdiPairs(out)
    println(f"""{"sdi_pairs_base":$pB,"sdi_pairs_x$factor":$pN,""" +
      f""""sdi_pair_ratio":${pN.toDouble / math.max(pB, 1)}%.2f,""" +
      f""""sdi_nlist_base":$nlB,"sdi_nlist_x$factor":$nlN}""")
    spark.stop()
  }

  /** Time-series analytics at ×factor KEYS (the scaling axis that matters
    * for keyed windows — more keys parallelize; per-key state stays
    * frame/counter-bounded by construction): wall ratios for sessionize,
    * resampleFill, rollingZScore, ewma over a key-rekeyed ×factor events
    * union. Near-linear wall (ratio ≈ factor on a fixed-size box) with NO
    * superlinear term is the pass condition. */
  private def tsProbe(factor: Int): Unit = {
    import graft.operators.Windows
    val base = "/root/testdata/sf0.1"
    val out = "/root/repo/target/sf_scaled_ts"
    val spark = GraftSession.getOrCreate()
    val ev = GraftSession.table(spark, base, "events")
    (0 until factor).map { i =>
      ev.withColumn("user_id", col("user_id") + lit(i * 1000000000L))
        .withColumn("event_id", col("event_id") + lit(i * 1000000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    def evAt(dir: String) = GraftSession.table(spark, dir, "events")
    def run(tag: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Double = {
      def go(dir: String): Unit =
        f(evAt(dir)).write.format("noop").mode("overwrite").save()
      go(base); go(out) // warm
      val b = timed(s"${tag}_base")(go(base))
      val n = timed(s"${tag}_x$factor")(go(out))
      n / b
    }
    val rs = run("sessionize")(d => Windows.sessionize(d, col("user_id"),
      col("ts"), 1800L, Seq(col("event_id"))))
    val rg = run("gap_fill")(d => Windows.resampleFill(d, col("user_id"),
      col("ts"), col("value"), 21600L, Seq(col("event_id"))))
    val rz = run("rolling_z")(d => Windows.rollingZScore(d, col("user_id"),
      Seq(col("ts"), col("event_id")), col("value"), 10))
    val re = run("ewma")(d => Windows.ewma(d, col("user_id"), col("ts"),
      col("event_id"), col("value"), 0.3))
    println(f"""{"ts_factor":$factor,"sessionize_ratio":$rs%.2f,""" +
      f""""gap_fill_ratio":$rg%.2f,"rolling_z_ratio":$rz%.2f,""" +
      f""""ewma_ratio":$re%.2f}""")
    spark.stop()
  }

  /** The Quality.run design claim, measured: N checks in ONE aggregate
    * pass vs the naive one-job-per-check loop every ad-hoc validation
    * script writes. Same checks, same exact metrics; the single-pass form
    * reads the table once. */
  private def qualityDuel(): Unit = {
    import graft.operators.Quality
    import graft.operators.Quality._
    val spark = GraftSession.getOrCreate()
    val ev = GraftSession.table(spark, "/root/testdata/sf0.1", "events")
    val checks = Seq(
      Unique("event_id"), NotNull("user_id"), NotNull("props", 0.5),
      InSet("event_type", Seq("click", "view", "purchase", "error", "signup")),
      InRange("value", -1e6, 1e6), SizeBetween(1L))
    def onePass(): Unit = { Quality.run(ev, checks).collect(); () }
    def perCheck(): Unit = checks.foreach { c =>
      Quality.run(ev, Seq(c)).collect(); ()
    }
    onePass(); perCheck() // warm
    val one = Seq.fill(3)(timed("quality_one_pass")(onePass())).sorted.apply(1)
    val per = Seq.fill(3)(timed("quality_job_per_check")(perCheck())).sorted.apply(1)
    println(f"""{"quality_checks":${checks.size},"one_pass_s":$one%.3f,""" +
      f""""per_check_s":$per%.3f,"speedup":${per / one}%.2f}""")
    spark.stop()
  }

  /** Round-10 session-3 probes (domain mixing / incremental MinHash / JL
    * projection / outlier screen): each measures its scale-critical
    * quantity — plan/threshold row counts that must stay FLAT as the
    * corpus grows, and the per-batch work of the incremental path, which
    * must track the BATCH, not the store. */
  private def s3OpsProbe(factor: Int): Unit = {
    import graft.operators.{Dedup, Mixing, Similarity}
    val base = "/root/testdata/sf0.1"
    val out = "/root/repo/target/sf_scaled_s3"
    val spark = GraftSession.getOrCreate()

    Seq("documents" -> Seq("doc_id"), "embeddings" -> Seq("vec_id"))
      .foreach { case (name, ids) =>
        val t = GraftSession.table(spark, base, name)
        (0 until factor).map { i =>
          val rekeyed = ids.foldLeft(t)((d, c) =>
            d.withColumn(c, col(c) + lit(i * 1000000000L)))
          if (name == "documents" && i > 0)
            rekeyed.withColumn("text",
              concat(col("text"), lit(s" copyvariant$i")))
          else rekeyed
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$out/$name.parquet")
      }

    def docsAt(dir: String) = GraftSession.table(spark, dir, "documents")
    def embsAt(dir: String) = GraftSession.table(spark, dir, "embeddings")
    val nt = when(length(trim(col("text"))) === 0, lit(0L))
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val weights = Map("en" -> 50.0, "de" -> 20.0, "fr" -> 15.0,
      "es" -> 10.0, "zh" -> 5.0)

    // 1. domain mix: plan rows = |domains| (broadcast bound, flat) + wall
    def mixRun(dir: String): Long = {
      val d = docsAt(dir)
      val budget = d.agg(sum(nt)).head().getLong(0) * 3 / 2
      val plan = Mixing.epochPlan(d, col("lang"), nt, weights, budget)
      Mixing.applyPlan(d, col("lang"), col("doc_id"), plan, seed = 7L)
        .write.format("noop").mode("overwrite").save()
      plan.length.toLong
    }
    mixRun(base); mixRun(out) // warm
    var planRowsB = 0L; var planRowsN = 0L
    val mB = timed("domain_mix_base") { planRowsB = mixRun(base) }
    val mN = timed(s"domain_mix_x$factor") { planRowsN = mixRun(out) }
    println(f"""{"mix_plan_rows_base":$planRowsB,"mix_plan_rows_x$factor":$planRowsN,""" +
      f""""mix_wall_ratio":${mN / mB}%.2f}""")

    // 2. incremental MinHash: FIXED batch (base docs ending in 0) probed
    // against a base store vs a ×factor store — per-batch wall must track
    // the batch, not the store (bucket equi-join); store rows grow ~linear
    // but are persisted state, not per-increment work
    def mhStore(dir: String) = Dedup.minHashStore(
      docsAt(dir), col("text"), col("doc_id"), 3, 4)
    val batch = docsAt(base).filter(pmod(col("doc_id"), lit(10)) === 0)
    def mhRun(store: org.apache.spark.sql.DataFrame): Unit =
      Dedup.minHashIncremental(batch, col("text"), col("doc_id"), store, 3, 4)
        .write.format("noop").mode("overwrite").save()
    val storeB = mhStore(base).cache(); val storeN = mhStore(out).cache()
    val srB = storeB.count(); val srN = storeN.count() // materialize + size
    mhRun(storeB); mhRun(storeN) // warm
    val hB = timed("minhash_incr_smallstore")(mhRun(storeB))
    val hN = timed(s"minhash_incr_x${factor}store")(mhRun(storeN))
    println(f"""{"mh_store_rows_base":$srB,"mh_store_rows_x$factor":$srN,""" +
      f""""mh_fixed_batch_wall_ratio":${hN / hB}%.2f}""")
    storeB.unpersist(); storeN.unpersist()

    // 3. JL projection: row-local — wall tracks rows, nothing broadcast
    def rpRun(dir: String): Unit =
      Similarity.randomProject(embsAt(dir), col("vec_id"), col("embedding"),
        outDim = 32, seed = 42L).write.format("noop").mode("overwrite").save()
    rpRun(base); rpRun(out) // warm
    val rB = timed("randproj_base")(rpRun(base))
    val rN = timed(s"randproj_x$factor")(rpRun(out))
    println(f"""{"randproj_wall_ratio":${rN / rB}%.2f}""")

    // 4. outlier screen: threshold rows = k (broadcast bound, flat) + wall
    def outlierRun(dir: String): Long = {
      val o = Similarity.centroidOutliers(embsAt(dir), col("vec_id"),
        col("embedding"), k = 8, iters = 1, flagFraction = 0.1)
      o.write.format("noop").mode("overwrite").save()
      o.select(col("cell")).distinct().count()
    }
    outlierRun(base); outlierRun(out) // warm
    var cellsB = 0L; var cellsN = 0L
    val oB = timed("outliers_base") { cellsB = outlierRun(base) }
    val oN = timed(s"outliers_x$factor") { cellsN = outlierRun(out) }
    println(f"""{"outlier_threshold_rows_base":$cellsB,""" +
      f""""outlier_threshold_rows_x$factor":$cellsN,""" +
      f""""outlier_wall_ratio":${oN / oB}%.2f}""")
    spark.stop()
  }
}
