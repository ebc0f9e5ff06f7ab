package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus — the missing sibling of the ANN
  * family: BM25 (Robertson/Spärck Jones, the Lucene `(1 + (N-df+0.5)/
  * (df+0.5))` idf variant) ranks documents against a bag-of-terms query.
  * Training-data pipelines use exactly this for contamination checks,
  * targeted corpus search, and hard-negative mining next to embedding ANN.
  */
object Retrieval {

  /** ONE corpus tokenize pass (the same lower + `\s+` split convention as
    * the dedup family), reduced IMMEDIATELY to what BM25 needs per doc:
    * the document length and the ALREADY-COUNTED term frequencies over the
    * query vocabulary — one codegen'd kernel pass
    * ([[graft.expressions.WsVocabTokenCounts]]: O(1) hash-set probe per
    * token; the previous HOF spelling ran an interpreted In-chain per
    * corpus token, and its consumers re-aggregated the exploded matches
    * through a corpus-wide (doc, dl, term) hash aggregate + exchange).
    * The lazy localCheckpoint pins the bounded frame (|docs| rows ×
    * ≤|vocab| matched terms — never the corpus text) so every downstream
    * consumer (corpus stats, df stats, scoring) replays the CHECKPOINT:
    * the corpus is scanned exactly once. */
  private def matchedPerDoc(docs: DataFrame, text: Column, id: Column,
                            vocab: Seq[String]): DataFrame =
    docs.select(id.cast("long").as("doc_id"),
        graft.expressions.TextExpressions
          .wsVocabTokenCounts(lower(text), vocab).as("__m"))
      .select(col("doc_id"), col("__m.dl").as("dl"),
        col("__m.terms").as("terms"), col("__m.tfs").as("tfs"))
      .localCheckpoint(false) // lazy: the stats collect materializes it (one fewer job)

  /** (doc_id, dl, term, tf) from the reduced per-doc arrays — a row-local
    * explode, NO aggregation (the kernel already counted); rows are unique
    * per (doc, term) by construction. */
  private def tfRows(perDoc: DataFrame): DataFrame =
    perDoc.select(col("doc_id"), col("dl"),
        explode(arrays_zip(col("terms"), col("tfs"))).as("e"))
      .select(col("doc_id"), col("dl"), col("e.terms").as("term"),
        col("e.tfs").cast("double").as("tf"))

  /** BM25 top-k: (doc_id, score) for the `k` best-matching docs.
    *
    * Scale shape: ONE corpus tokenize pass ([[matchedPerDoc]] — corpus
    * stats, document frequencies, and scoring all read the checkpointed
    * per-doc reduction, never the corpus again). Document-frequency and
    * corpus stats come back to the driver as |query| + 2 scalars; idf
    * values are inlined as literals rounded to 9 dp (the engine-neutral-
    * rounding idiom — ln differs across libms in the last ulp, far below
    * 1e-9). Final ranking is a bounded TakeOrdered with a doc_id
    * tiebreak; scores round to 6 dp for cross-engine hashing.
    *
    * `dl` is integer-valued, so `avgdl` is EXACT in double on any
    * summation order — the one corpus-wide statistic every score shares
    * is bit-identical across engines by construction. */
  def bm25TopK(docs: DataFrame, text: Column, id: Column,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(queryTerms.distinct == queryTerms, "query terms must be distinct")
    val perDoc = matchedPerDoc(docs, text, id, queryTerms)
    val stats = perDoc.agg(count(lit(1)).cast("double"), avg(col("dl"))).collect()(0)
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val tf = tfRows(perDoc)
    // (doc, term) rows are unique by construction, so the document
    // frequency is a plain count — no countDistinct needed
    val dfByTerm = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def round9(x: Double): Double = math.rint(x * 1e9) / 1e9
    val idf = queryTerms.map { t =>
      val df = dfByTerm.getOrElse(t, 0.0)
      t -> round9(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
    }.toMap
    val idfCol = queryTerms.map(t => when(col("term") === t, lit(idf(t))))
      .reduce(coalesce(_, _))
    tf.withColumn("s", idfCol * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Batch BM25: top-k docs for EVERY query in a (query_id, terms array)
    * frame — the production shape (contamination checks score a whole
    * eval set against the corpus; one query per driver literal does not
    * scale past a handful).
    *
    * Same statistics and rounding as [[bm25TopK]]: the query-term
    * vocabulary (exploded, deduped — bounded by the eval set, the same
    * frame the per-query join later broadcasts) is collected once and
    * compiled into the [[matchedPerDoc]] membership probe, so the corpus
    * tokenizes once and keeps only matching terms; df/idf come from a
    * per-term aggregate joined back by broadcast (idf rounded to 9 dp
    * in-plan — same engine-neutral idiom); per-(query, doc) partial sums
    * flow into the typed bounded-heap top-k ([[Similarity.topKByScore]]:
    * ≤ k rows per query per partition into the final shuffle, no
    * unbounded group anywhere). Corpus-side cost is ONE scan + one
    * (doc, term)-bounded shuffle regardless of |queries|. */
  def bm25TopKBatch(docs: DataFrame, text: Column, id: Column,
                    queries: DataFrame, queryId: Column, queryTerms: Column,
                    k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // null elements inside a terms array can never match a token; drop
    // them right after the explode so the vocab cap check and the InSet
    // probe only ever see real terms (a surviving null NPE'd in the
    // driver-side size check before the fail-loud cap could fire)
    val qterms = queries.select(queryId.cast("long").as("query_id"),
        explode(queryTerms).as("term"))
      .filter(col("term").isNotNull).distinct()
    // the distinct vocabulary rides to executors as ONE InSet probe set
    // (isin past the conversion threshold), the same data volume the old
    // broadcast-join path shipped — but it also lives on the driver and in
    // the task closure, so bound it fail-loud: an eval set is vocabulary-
    // bounded by construction; past the cap, split the query set.
    val vocab = qterms.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    require(vocab.map(_.length + 8L).sum <= 64L * 1024 * 1024,
      s"bm25TopKBatch query vocabulary (${vocab.size} terms) exceeds 64 MiB; " +
        "split the eval set into batches")
    val perDoc = matchedPerDoc(docs, text, id, vocab)
    val stats = perDoc.agg(count(lit(1)).cast("double"), avg(col("dl"))).collect()(0)
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val tf = tfRows(perDoc)
    // unique (doc, term) rows: df is a plain count (see tfRows)
    val idfByTerm = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
      .select(col("term"),
        round(log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)), 9)
          .as("idf"))
    val scored = tf
      .join(broadcast(idfByTerm), "term")
      .join(broadcast(qterms), "term")
      .withColumn("s", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col("query_id"), col("doc_id").as("corpus_id"))
      .agg(round(sum(col("s")), 6).as("score"))
      .select(col("query_id"), col("corpus_id"), col("score"))
    Similarity.topKByScore(scored, k)
      .withColumnRenamed("corpus_id", "doc_id")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009): merge
    * several per-query rankings — the hybrid-retrieval primitive that
    * combines lexical BM25 with embedding ANN without score calibration,
    * since only RANKS enter the fused score Σ_lists 1/(rrfK + rank). Each
    * input is a (query_id, doc_id, score) top-k list; ranks are
    * row_number over (score DESC, doc_id ASC) — the deterministic
    * tiebreak every retrieval op here emits, so ranks (and hence the
    * fusion) replay exactly in an independent engine; fused scores round
    * at 9 dp. A doc absent from a list simply contributes nothing (the
    * standard RRF convention).
    *
    * Scale shape: inputs are k-bounded per query by construction, so the
    * rank window and the fusion aggregate run over ≤ Σk rows per query —
    * the whole fusion is narrow no matter the corpus size; the expensive
    * retrieval stages upstream keep their own scale stories. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(rrfK >= 1, "rrfK must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    val contribs = rankings.map { df =>
      df.select(col("query_id"), col("doc_id"), col("score"))
        .withColumn("rank", row_number().over(w))
        .select(col("query_id"), col("doc_id"),
          (lit(1.0) / (lit(rrfK) + col("rank"))).as("contrib"))
    }
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id").as("corpus_id"))
      .agg(round(sum(col("contrib")), 9).as("score"))
    Similarity.topKByScore(fused, k)
      .withColumnRenamed("corpus_id", "doc_id")
  }
}
