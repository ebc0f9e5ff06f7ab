package graft

import org.apache.spark.sql.functions._

/** Pins for the BM25 scan kernel (r18): WsVocabTokenCounts must be
  * bit-identical to the Catalyst spelling it replaced — split(lower, \s+)
  * token count (incl. the leading-empty artifact) and filter-by-vocab term
  * frequencies. */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._
  import graft.expressions.TextExpressions

  private val vocab = Seq("join", "filter", "dup", "hash", "scan")

  test("WsVocabTokenCounts ≡ the split + filter-HOF specification (dl, terms, tfs)") {
    val docs = Seq(
      "join the filter with a dup join",
      "  leading whitespace join", // leading-empty split artifact
      "trailing space scan ",
      "", " ", "\t\n", "JOIN UPPER dup",
      "no matches here at all",
      "hash hash hash scan filter"
    ).toDF("text").withColumn("low", lower(col("text")))
    val kernel = docs.select(
      TextExpressions.wsVocabTokenCounts(col("low"), vocab).as("m"))
      .select(col("m.dl"), col("m.terms"), col("m.tfs"))
      .collect().map(r => (r.getDouble(0), r.getSeq[String](1), r.getSeq[Long](2)))
    // specification: the exact Catalyst spelling the kernel replaced —
    // dl = size(split(low)), per-term counts of filter(toks, isin(vocab))
    // in first-occurrence order
    val spec = docs.select(split(col("low"), "\\s+").as("toks"))
      .select(size(col("toks")).cast("double").as("dl"),
        filter(col("toks"), t => t.isin(vocab: _*)).as("mtoks"))
      .collect().map { r =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        r.getSeq[String](1).foreach(t => m(t) = m.getOrElse(t, 0L) + 1L)
        (r.getDouble(0), m.keys.toSeq, m.values.toSeq)
      }
    assert(kernel.toSeq == spec.toSeq,
      s"kernel diverged:\n${kernel.toSeq}\nvs\n${spec.toSeq}")
  }

  test("WsVocabTokenCounts: null text -> null struct") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TextExpressions.wsVocabTokenCounts(col("text"), vocab))
      .collect()(0)
    assert(r.isNullAt(0))
  }
}
