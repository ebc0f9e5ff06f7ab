package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting, fingerprinting. All pure Catalyst expressions (codegen'd,
  * no UDF) — one narrow pass per document at any scale.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token count: word-piece regex (letter runs, digit runs,
    * single punctuation) — the standard cheap estimator for LLM token
    * budgeting when the real tokenizer is off-cluster. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation density, rounded to a cross-engine-stable 6dp. */
  def punctRatio(text: Column): Column =
    round(size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0)))
      / greatest(length(text), lit(1)).cast("double"), 6)

  /** Quality features: length, punctuation ratio, stopword ratio, mean word
    * length — the fastText-style cheap quality signals. */
  def qualityFeatures(docs: DataFrame, text: Column, id: Column): DataFrame = {
    val words = split(lower(trim(text)), "\\s+")
    val stop = array(Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
      .map(lit): _*)
    docs.select(
      id.as("doc_id"),
      length(text).as("n_chars"),
      tokenCountWs(text).as("n_tokens"),
      punctRatio(text).as("punct_ratio"),
      round(size(filter(words, w => array_contains(stop, w)))
        / greatest(size(words), lit(1)).cast("double"), 6).as("stopword_ratio"),
      round(length(regexp_replace(text, "\\s+", ""))
        / greatest(size(words), lit(1)).cast("double"), 6).as("mean_word_len"))
  }

  /** Language-ID by stopword voting: score per language = count of hits of
    * that language's most-frequent function words; argmax wins, 'und' if no
    * hits. N-gram-free heuristic that's one pass + small per-row work.
    * Profile source: public most-common-word lists. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "you", "that", "was", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans", "que"),
    "es" -> Seq("el", "de", "que", "la", "los", "una", "por", "con", "para"),
    "zh" -> Seq("的", "是", "了", "我", "在", "他", "这", "不", "有"))

  def langId(text: Column): Column = {
    // the word array is bound ONCE per row as a lambda variable (the
    // let-binding idiom): higher-order lambdas evaluate interpreted with
    // no CSE, so inlining split(lower(text)) into each language's filter
    // would re-split the text once per language — measured 2× the whole
    // pass at sf0.1
    def scoresOver(words: Column): Column = array(
      langProfiles.toSeq.sortBy(_._1).map { case (lang, ws) =>
        // zh is unsegmented — whitespace tokens would never equal a profile
        // word, so score zh by CHARACTER containment instead (each profile
        // char found anywhere in the text counts once)
        val score =
          if (lang == "zh")
            ws.map(ch => when(contains(text, lit(ch)), 1).otherwise(0))
              .reduce((a, b) => a + b)
          else {
            val profile = array(ws.map(lit): _*)
            size(filter(words, w => array_contains(profile, w)))
          }
        struct(score.as("score"), lit(lang).as("lang"))
      }: _*)
    // argmax by (score, lang): array_max on structs orders by first field,
    // ties broken by lang name — deterministic.
    val best = array_max(element_at(
      transform(array(split(lower(text), "\\s+")), words => scoresOver(words)), 1))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of casefolded, punctuation- and
    * whitespace-normalized text — robust to formatting-only edits.
    * (The rolling-hash variant for shingle fingerprints lives in
    * Dedup.shingles + md5.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(regexp_replace(lower(text), "[\\p{Punct}]", ""), "\\s+", " "))
}
