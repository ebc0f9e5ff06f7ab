package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE merge LEARNING (Sennrich et al. 2016) semantics. */
class BpeLearnSpec extends SparkSpec {

  import spark.implicits._

  test("applyMerge: simultaneous left-to-right non-overlapping sweep") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(Bpe.applyMerge(Seq("x", "a", "b", "y"), "a", "b") == Seq("x", "ab", "y"))
    assert(Bpe.applyMerge(Seq("a"), "a", "a") == Seq("a"))
    assert(Bpe.applyMerge(Seq.empty, "a", "b") == Seq.empty)
  }

  test("learnMerges finds the classic 'low/lower/newest/widest' merges") {
    // Sennrich's worked example shape: a tiny corpus where 'es' ('newest',
    // 'widest' dominate pair counts via their frequencies)
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, col("text"), rounds = 3)
    assert(merges.length == 3)
    // 'e s' appears in newest+widest = 9 — the top first-round pair
    assert(merges.head == ((1, "e", "s", 9L)), merges.toString)
    // second round: 'es t' (9) wins
    assert(merges(1) == ((2, "es", "t", 9L)), merges.toString)
  }

  test("learned merges feed tokenCount: counts drop as merges are learned") {
    val docs = Seq((1L, "the weather is the best"), (2L, "these the theme"))
      .toDF("doc_id", "text")
    val learned = Bpe.learnMerges(docs, col("text"), rounds = 5)
      .map { case (_, a, b, _) => (a, b) }
    val before = Bpe.tokenCount(docs, col("text"), col("doc_id"), Seq.empty)
      .agg(sum("bpe_tokens")).head().getLong(0)
    val after = Bpe.tokenCount(docs, col("text"), col("doc_id"), learned)
      .agg(sum("bpe_tokens")).head().getLong(0)
    assert(after < before, s"learned merges must compress: $before -> $after")
  }

  test("deterministic tiebreak: equal-count pairs resolve lexicographically") {
    // 'ab' and 'cd' each appear once; (a,b) < (c,d) lexicographically
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, col("text"), rounds = 1)
    assert(merges.head == ((1, "a", "b", 1L)), merges.toString)
  }

  test("vocabulary exhaustion stops early instead of looping") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // single-char words
    val merges = Bpe.learnMerges(docs, col("text"), rounds = 4)
    assert(merges.isEmpty)
  }

  test("encode: ids decode back to the pretoken stream; agrees with tokenCount; OOV fails loud") {
    val docs = Seq((1L, "low lower lowest"), (2L, "new newer")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val vocab = Bpe.vocabFromCorpus(docs, col("text"), merges)
    assert(vocab.containsSlice(Seq("lo", "low", "er")) == false ||
      vocab.takeRight(3) == Seq("lo", "low", "er")) // merges appended in learned order
    val enc = Bpe.encode(docs, col("text"), col("doc_id"), merges, vocab)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2))).sortBy(_._1)
    val idToSym = vocab.zipWithIndex.map(_.swap).toMap
    // roundtrip: symbol concat == whitespace-stripped text
    assert(enc(0)._2.map(idToSym).mkString == "lowlowerlowest")
    assert(enc(1)._2.map(idToSym).mkString == "newnewer")
    // "low" → [low]; "lower" → [low, er]; "lowest" → [low, e, s, t]
    assert(enc(0)._3 == 1 + 2 + 4, enc(0).toString)
    // agreement with the counting operator
    val counts = Bpe.tokenCount(docs, col("text"), col("doc_id"), merges)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(enc.forall { case (id, _, n) => counts(id).toLong == n })
    // OOV symbol fails loud naming the symbol
    val e = intercept[Exception] {
      Bpe.encode(docs, col("text"), col("doc_id"), merges,
        vocab.filterNot(_ == "s")).collect()
    }
    assert(e.getMessage != null)
  }
}
