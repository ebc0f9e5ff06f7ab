package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 generator (dev tool, r12 verdict item 2): a ×10
  * scale-up of the driver's sf0.1 fixtures, so the correctness gate and
  * bench can run one decade closer to the 100 TB target than the largest
  * driver-provided directory. NOT driver testdata — written under
  * /root/repo/target/sf1 and regenerable at will.
  *
  * Construction (copy i of 10, i = 0 is verbatim sf0.1):
  *  - every id/key column shifts by i·10^9, consistently across referrers,
  *    so the TPC-H foreign-key graph (lineitem→orders/part/supplier,
  *    orders→customer) stays closed; region/nation stay fixed (the
  *    nationkey dimension is shared, like the real TPC-H layout)
  *  - events shift ts by i·31 days: the 100 TB shape is a LONGER history
  *    at similar density (same users, ×10 the span), which also keeps
  *    per-user as-of/session history genuinely growing
  *  - documents (copies ≥ 1) are SYNTHESIZED per global doc id — see
  *    [[synthText]] — so the shingle-frequency shape, planted near-dup
  *    density, and candidate-graph family are identical at every scale
  *    factor (the r15 copy-suffix scheme degenerated at ×300: every base
  *    shingle crossed the stop-shingle cap and the residual copy-suffix
  *    shingles formed 112M-edge per-copy near-cliques); n_chars keeps the
  *    n_chars = length(text) invariant the driver data holds
  *  - embeddings perturb element 0 by i·0.001f so ANN distances don't
  *    carry 10-way exact ties across copies (tie-rule stress belongs to
  *    the fuzz layers, not the scale gate)
  *
  * Both engines (Spark and the DuckDB oracle) read the SAME generated
  * parquet, so the gate stays a pure engine-vs-engine differential.
  */
object Sf1Gen {
  private val OFF = 1000000000L

  /** Scale-honest synthetic document text, keyed by GLOBAL doc id only
    * (r15 verdict item 2). The previous copy-suffix scheme replicated the
    * 5000 base documents, so at ×300 every base shingle crossed the
    * maxShingleFreq stop-shingle cap and the sf30 candidate graph was a
    * structurally different (sparser) family than sf10's — the sweep could
    * not measure dedup-family scaling at all (BASELINE.md r15 caveat).
    *
    * This generator makes the shingle-frequency SHAPE scale-invariant:
    *  - two-tier vocabulary. Each word position is, with p=0.4, one of 30
    *    uniform stop words ("w0".."w29") — every stop-stop bigram exceeds
    *    any realistic frequency cap at EVERY generated SF (≥ ~900 docs per
    *    bigram from sf1 up), so the capped-out set is the same family at
    *    every scale — or, with p=0.6, a rare word (syllable-rendered
    *    "r<...>", see [[RareVocab]]) from a fixed 41M-id space, whose
    *    doc-frequency stays O(1)-small per word up to the sf100 decade
    *    probe (≈7 docs/word at 5M docs). Shared-rare-shingle
    *    candidates therefore grow LINEARLY with corpus size.
    *  - planted near-duplicates at constant density. Per 25 consecutive
    *    base slots: one PAIR (slots 0,1) and one QUAD (slots 10-13) share
    *    a content seed; variant v ≥ 1 replaces exactly ONE word at a
    *    v-specific position with a v-specific rare word, so any two group
    *    members differ in ≤ 2 positions → bigram Jaccard ≈ 0.88-0.95,
    *    comfortably above the 0.8 verify threshold, and each group is one
    *    connected component (pairs + 6-edge quad cliques) at every SF.
    *  - ~65 words/doc (50-80, seed-derived): matches the DRIVER fixture's
    *    length family (sf0.1 avg 54 words — the first cut of this
    *    generator used 80-120 and the whole text-scan family benched
    *    2-3× heavier per row than the corpus it claims to scale), while
    *    keeping the one-word perturbations clear of the 0.8 threshold
    *    (worst case at 50 words: ≤4 of 49 bigrams differ between two
    *    group members → J ≥ 0.849 before the cap, which removes stop
    *    shingles from both sides equally). Rare ids render as "r" + four
    *    consonant-vowel syllables (see [[RareVocab]]) — word length and
    *    trigram repetition price every char-level op like real text.
    *
    * Everything derives from xxhash64 of (salt, seed, position): a doc's
    * text is identical whether the corpus holds 50k or 5M docs — one graph
    * family across the whole SF ladder. Copy 0 stays the verbatim driver
    * fixture (its tiny-vocabulary shingles are capped out identically at
    * every generated SF, a constant-size subgraph). */
  /** Rare-word space: 80^4 ≈ 41M ids, rendered as "r" + four
    * consonant-vowel syllables (16 consonants × 5 vowels). Why syllables
    * and not raw digits/base-36: real text has a SMALL, heavily repeated
    * char-trigram vocabulary (Zipf), and the trigram-LM family's reduced
    * per-doc (doc, tri) frame is priced by per-doc DISTINCT trigrams —
    * digit/base-36 ids made ~every trigram unique per doc (a worst case
    * no real corpus exhibits; q_lm_score/q_ccnet/q_dsir benched 200-260 s
    * at sf10 on it) while CV syllables bound the trigram space at ~2.5k
    * with realistic repetition. Word df stays tiny through the sf100
    * decade (300M draws into 41M ids → df ≈ 7, under q_cooccur's
    * support floor) and BIGRAM df stays O(1) at every SF (the dedup
    * family's scale-invariance). */
  private val RareVocab = 40960000L // 80^4
  private val Cons = Seq("b","d","f","g","h","k","l","m",
                         "n","p","s","t","v","z","j","c")
  private val Vows = Seq("a","e","i","o","u")
  private def synthText(g: Column): Column = {
    val b = pmod(g, lit(OFF))
    val m = pmod(b, lit(25L))
    val v = when(m < 2, m).when(m >= 10 && m <= 13, m - 10).otherwise(lit(0L))
    val s = g - v // shared content seed within a planted group
    val len = lit(50L) + pmod(xxhash64(lit(0), s), lit(31L))
    def rare(h: Column): Column = {
      val consArr = array(Cons.map(lit): _*)
      val vowArr = array(Vows.map(lit): _*)
      val id = pmod(h, lit(RareVocab))
      val syls = (0 until 4).map { i =>
        val s = pmod(floor(id / lit(math.pow(80, i).toLong)).cast("long"), lit(80L))
        concat(element_at(consArr, pmod(s, lit(16L)).cast("int") + 1),
               element_at(vowArr, floor(s / lit(16L)).cast("int") + 1))
      }
      concat(lit("r") +: syls: _*)
    }
    val words = transform(sequence(lit(1L), len), j =>
      when(pmod(xxhash64(lit(1), s, j), lit(10L)) < 4,
        concat(lit("w"), pmod(xxhash64(lit(2), s, j), lit(30L))))
      .otherwise(rare(xxhash64(lit(4), s, j))))
    val pos = pmod(xxhash64(lit(5), s, v), len) + 1
    val rep = rare(xxhash64(lit(3), s, v))
    val arr = when(v === 0, words).otherwise(
      transform(words, (w, j0) =>
        when(j0.cast("long") + 1 === pos, rep).otherwise(w)))
    concat_ws(" ", arr)
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/root/repo/target/sf1"
    val copies = if (args.length > 1) args(1).toInt else 10
    // optional table filter (args 3+): the sf100 decade probe only needs
    // documents/embeddings — no reason to write a ×1000 lineitem
    val onlyTables = args.drop(2).toSet
    val base = "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate()

    // One explode per table instead of a `copies`-branch union: at ×1000
    // a thousand-branch plan (each branch re-reading the base parquet)
    // spends minutes in planning alone; the explode is a single scan with
    // a row-local fan-out.
    def scaled(name: String): DataFrame = {
      val t = spark.read.parquet(s"$base/$name.parquet")
      if (Set("region", "nation")(name)) return t
      // The driver's base tables are single parquet files, so without this
      // the row-local ×copies explode runs as ONE map task — a ×1000
      // lineitem build spent 15+ min single-threaded generating 600M rows
      // into the repartition shuffle. Fanning the 600k-row base across the
      // session width first is a trivially cheap shuffle that parallelizes
      // the expensive part (synthText especially). Content is id-derived,
      // so the generated SET is identical either way; only file-internal
      // row order changes, which nothing downstream observes.
      val fan = t.repartition(spark.sparkContext.defaultParallelism)
      val x = fan.withColumn("__i",
        explode(sequence(lit(0L), lit(copies - 1L))))
      def shift(df: DataFrame, cols: String*): DataFrame =
        cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + col("__i") * OFF))
      val out = name match {
        case "customer" => shift(x, "c_custkey")
        case "supplier" => shift(x, "s_suppkey")
        case "part"     => shift(x, "p_partkey")
        case "orders"   => shift(x, "o_orderkey", "o_custkey")
        case "lineitem" => shift(x, "l_orderkey", "l_partkey", "l_suppkey")
        case "events"   => shift(x, "event_id")
          .withColumn("ts", expr("timestampadd(DAY, __i * 31, ts)"))
        case "documents" =>
          // lang must keep the DRIVER fixture's categorical shape at every
          // SF (sf0.1: en 41.2%, zh 15.1%, es 14.9%, fr 14.8%, de 14.0%) —
          // a constant lit("en") froze every minority-language mass at copy
          // 0's 5000 docs, and q_domain_mix's epoch-repetition factor for
          // 'de' then grows linearly with SF until the maxEpochs fail-loud
          // guard trips (caught at sf10: repeat 388× > 64). Per-mille
          // thresholds from the sf0.1 counts (en 41.2 / zh 15.1 / es 14.9 /
          // fr 14.8 / de 14.0) keep domain shares scale-invariant; lang
          // does not need to match the synthetic text's content (both
          // engines recompute from the same columns).
          val langBucket = pmod(xxhash64(lit(8), col("doc_id")), lit(1000L))
          val synthLang = when(langBucket < 412, "en")
            .when(langBucket < 563, "zh").when(langBucket < 712, "es")
            .when(langBucket < 860, "fr").otherwise("de")
          val synth = shift(x.filter(col("__i") > 0).select(col("doc_id"), col("__i")), "doc_id")
            .withColumn("text", synthText(col("doc_id")))
            .select(col("doc_id"), col("text"), synthLang.as("lang"),
              concat(lit("src"),
                pmod(xxhash64(lit(9), col("doc_id")), lit(20L))).as("source"),
              length(col("text")).cast("long").as("n_chars"),
              col("__i"))
          t.withColumn("__i", lit(0L)).unionByName(synth)
        case "embeddings" => shift(x, "vec_id")
          .withColumn("embedding", transform(col("embedding"),
            (v, j) => when(j === 0,
              v + col("__i").cast("float") * lit(0.001f)).otherwise(v)))
      }
      out.drop("__i")
    }

    // Scaled-fixture FILE LAYOUT (r16 verdict item 1): the explode is
    // row-local, so a single-file base table stayed a single-file output
    // at EVERY scale factor — scan parallelism 1, and AQE coalesced the
    // downstream stages from the tiny pre-fanout map stats (q_semdedup
    // read 12-16× slower at sf10 on identical code+data). A real ×N
    // table is ~N× the files; repartition the scaled output to `copies`
    // bounded by the core count, growing past it only when a 64 MB/file
    // target demands more — honest parallelism without a tiny-file
    // explosion. (region/nation are unscaled constant dims: left as-is.)
    def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
    def targetFiles(name: String): Int = {
      val est = dirBytes(new java.io.File(s"$base/$name.parquet")) * copies
      val bySize = ((est + (64L << 20) - 1) / (64L << 20)).toInt
      math.max(math.min(copies, 32), math.max(1, bySize))
    }
    GraftSession.tableNames
      .filter(n => onlyTables.isEmpty || onlyTables(n))
      .foreach { name =>
        val df = scaled(name)
        val parts = if (Set("region", "nation")(name)) 1 else targetFiles(name)
        val sized = if (parts <= 1) df else df.repartition(parts)
        sized.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[sf1gen] $name -> $out/$name.parquet ($parts part target)")
      }
    // the memoized population counts assume immutable dirs; this write
    // may have replaced tables a prior query in this JVM already counted
    Queries.invalidateCounts(out)
    spark.stop()
  }
}
