package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle extractor — the hot kernel of every shingle-based
  * dedup operator (MinHash, SimHash, n-gram Jaccard, near-dup clustering).
  *
  * Replaces the Catalyst higher-order chain
  * `array_distinct(filter(transform(sequence(...), i => concat_ws(" ",
  * slice(split(lower(text), "\\s+"), i+1, n)))))` (Dedup.shingles), whose
  * lambdas evaluate INTERPRETED — per-shingle closure dispatch and
  * intermediate array allocations outside whole-stage codegen. This
  * expression runs one imperative pass per document inside codegen.
  *
  * Semantics are BIT-IDENTICAL to the lambda form (DedupSimilaritySpec
  * pins the equivalence on the real corpus): UTF8String.toLowerCase (the
  * same kernel `lower()` uses), Java `\s+` regex split with limit -1 (the
  * same kernel `split()` uses — leading empty token preserved), shingles
  * of exactly `n` consecutive words joined by single spaces, fewer than
  * `n` words → empty array, duplicates dropped keeping FIRST occurrence
  * (array_distinct order).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // NULL text yields an EMPTY shingle set, exactly like the lambda
  // specification (size(null) = -1 short-circuits it to []), so the
  // expression itself never returns null
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and n >= 1 (got ${child.dataType}, n=$n)")

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  /** One pass: lowercase, split, slide an n-window, dedup first-occurrence.
    * Public so generated code can invoke it via a reference object. */
  def computeShingles(text: UTF8String): ArrayData = {
    val words = ws.split(text.toLowerCase.toString, -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(16, words.length - n + 1))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Shared empty result (GenericArrayData is immutable). Public for the
    * generated code path. */
  val emptyShingles: ArrayData = new GenericArrayData(Array.empty[Any])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyShingles else computeShingles(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one call into the compiled pass — keeps the operator inside
    // WholeStageCodegen (no interpreted lambda tree per element); null
    // input short-circuits to the shared empty array
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    val childGen = child.genCode(ctx)
    val arrayCls = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        |${childGen.code}
        |$arrayCls ${ev.value} = ${childGen.isNull}
        |  ? $ref.emptyShingles() : $ref.computeShingles(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Primitive long → count open-addressing map (linear probing, power-of-2
  * capacity, ≤ 0.5 load, murmur finalizer scramble) preserving insertion
  * order. Keys must be ≥ 0 (−1 marks an empty slot) — callers pack ≤ 63
  * bits. Purpose-built for [[CharNgramCounts]]: the JDK maps box a Long
  * per increment, which dominated the kernel's profile.
  */
private[graft] final class LongCountMap(initialCapacity: Int) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) - 1) << 1
  private var mask = cap - 1
  private var keys = {
    val a = new Array[Long](cap); java.util.Arrays.fill(a, -1L); a
  }
  private var vals = new Array[Long](cap)
  private var order = new Array[Long](16)
  var size = 0

  private def slotOf(k: Long): Int = {
    // murmur3 fmix64 finalizer — full avalanche so sequential packed
    // windows don't cluster under linear probing
    var h = k
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    var idx = (h & mask).toInt
    while (keys(idx) != -1L && keys(idx) != k) idx = (idx + 1) & mask
    idx
  }

  def increment(k: Long): Unit = {
    val idx = slotOf(k)
    if (keys(idx) == k) { vals(idx) += 1; return }
    keys(idx) = k; vals(idx) = 1
    if (size == order.length) order = java.util.Arrays.copyOf(order, size * 2)
    order(size) = k
    size += 1
    if (size * 2 > cap) grow()
  }

  private def grow(): Unit = {
    val oldKeys = keys; val oldVals = vals
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); java.util.Arrays.fill(keys, -1L)
    vals = new Array[Long](cap)
    var i = 0
    while (i < oldKeys.length) {
      if (oldKeys(i) != -1L) {
        val idx = slotOf(oldKeys(i))
        keys(idx) = oldKeys(i); vals(idx) = oldVals(i)
      }
      i += 1
    }
  }

  /** k-th distinct key in first-occurrence order. */
  def orderedKey(i: Int): Long = order(i)
  def count(k: Long): Long = vals(slotOf(k))
}

/** Native per-document character-n-gram COUNTER — the hot kernel of
  * [[graft.operators.TextAnalysis.lmTrigramScore]].
  *
  * Replaces `explode(transform(sequence(1, len-2), i => substr(t, i, 3)))`
  * — whose lambda evaluates INTERPRETED (per-position closure dispatch,
  * one UTF8String allocation per position, an O(chars) array per doc) and
  * whose output is O(corpus chars) single-gram rows that a downstream
  * partial aggregate must then hash back down. One imperative pass per
  * document inside codegen, emitting the already-reduced map
  * n-gram → occurrence count (distinct-per-doc entries, the same frame
  * the `groupBy(doc_id, tri).count()` reduction produced — computed
  * row-locally for free).
  *
  * Semantics pinned to the lambda form (TextMultimodalSpec): code-point
  * (not byte) windows — identical to `substr` on multi-byte text; fewer
  * than `n` chars (or NULL) → empty map; no casefolding (callers pass
  * pre-lowered text so the plan lowercases ONCE per row).
  */
case class CharNgramCounts(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  // NULL text yields an EMPTY map — the expression itself never returns null
  override def nullable: Boolean = false
  override def prettyName: String = "char_ngram_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input and n >= 1 (got ${child.dataType}, n=$n)")

  require(n <= 3, s"$prettyName packs code points into a 63-bit key; n <= 3 (got $n)")

  /** Shared empty result. Public for the generated code path. */
  val emptyCounts: MapData =
    new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]),
      new GenericArrayData(Array.empty[Any]))

  /** One pass: decode the doc to a String ONCE (per-position
    * `UTF8String.substring(i, i+n)` re-scans the byte buffer from 0 every
    * call — O(len²) per doc), slide a code-point n-window packed into one
    * long (≤3 code points × 21 bits), and count in a primitive
    * open-addressing map — no boxed Long and no per-position string
    * allocation; strings materialize only for the DISTINCT grams at the
    * end, in first-occurrence order. Public so generated code can invoke
    * it. */
  def computeCounts(text: UTF8String): MapData = {
    val s = text.toString
    val units = s.length
    if (units < n) return emptyCounts // code points <= UTF-16 units
    val map = new LongCountMap(64)
    // rolling window of the last n code points, packed 21 bits each
    val keepMask = if (n == 3) (1L << 42) - 1 else (1L << (21 * (n - 1))) - 1
    var packed = 0L
    var have = 0
    var i = 0
    while (i < units) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      packed = ((packed & keepMask) << 21) | cp
      have += 1
      if (have >= n) map.increment(packed)
    }
    if (map.size == 0) return emptyCounts
    val keys = new Array[Any](map.size)
    val vals = new Array[Any](map.size)
    val sb = new java.lang.StringBuilder(n * 2)
    var k = 0
    while (k < map.size) {
      val key = map.orderedKey(k)
      sb.setLength(0)
      var j = n - 1
      while (j >= 0) { sb.appendCodePoint(((key >>> (21 * j)) & 0x1FFFFF).toInt); j -= 1 }
      keys(k) = UTF8String.fromString(sb.toString)
      vals(k) = map.count(key)
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyCounts else computeCounts(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("counter", this, classOf[CharNgramCounts].getName)
    val childGen = child.genCode(ctx)
    val mapCls = classOf[MapData].getName
    ev.copy(
      code = code"""
        |${childGen.code}
        |$mapCls ${ev.value} = ${childGen.isNull}
        |  ? $ref.emptyCounts() : $ref.computeCounts(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native DSIR feature extractor: word unigram + bigram counts in one
  * imperative pass per document. Replaces the interpreted lambda chain
  * `filter(split(...)) ++ transform(slice(...), (w,i) => concat(...))`
  * + raw explode in [[graft.operators.Dsir.wordNgrams]] (the semantic
  * specification this kernel is equivalence-tested against in DsirSpec):
  * the lambdas evaluate outside whole-stage codegen with per-ngram closure
  * dispatch, and the raw explode carries one row per ngram INSTANCE where
  * this kernel emits the already-reduced per-doc map.
  *
  * Semantics: words are maximal runs of [a-z] (pass PRE-LOWERED text —
  * same contract as [[CharNgramCounts]]); features are every word and
  * every adjacent pair joined by a single space, counted as a multiset.
  */
case class WordNgramCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_ngram_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input (got ${child.dataType})")

  val emptyCounts: MapData =
    new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]),
      new GenericArrayData(Array.empty[Any]))

  /** One pass: scan for [a-z] runs, emit each word and each adjacent
    * bigram into an insertion-ordered count map. String keys (words are
    * variable-length — no bit-packing shortcut); the map is bounded by
    * DISTINCT ngrams per doc, and downstream explode carries one row per
    * distinct ngram instead of one per instance. */
  def computeCounts(text: UTF8String): MapData = {
    val s = text.toString
    val len = s.length
    val map = new java.util.LinkedHashMap[String, Array[Long]](64)
    def inc(key: String): Unit = {
      val slot = map.get(key)
      if (slot == null) map.put(key, Array(1L)) else slot(0) += 1L
    }
    var prev: String = null
    var i = 0
    while (i < len) {
      // skip separators
      while (i < len && (s.charAt(i) < 'a' || s.charAt(i) > 'z')) i += 1
      val start = i
      while (i < len && s.charAt(i) >= 'a' && s.charAt(i) <= 'z') i += 1
      if (i > start) {
        val w = s.substring(start, i)
        inc(w)
        if (prev != null) inc(prev + " " + w)
        prev = w
      }
    }
    if (map.isEmpty) return emptyCounts
    val n = map.size
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = map.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue()(0)
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyCounts else computeCounts(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("counter", this, classOf[WordNgramCounts].getName)
    val childGen = child.genCode(ctx)
    val mapCls = classOf[MapData].getName
    ev.copy(
      code = code"""
        |${childGen.code}
        |$mapCls ${ev.value} = ${childGen.isNull}
        |  ? $ref.emptyCounts() : $ref.computeCounts(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-doc hashed bag-of-ngram feature ARRAYS — the fused form of
  * `wordNgramCounts` + per-key md5 bucketing that [[graft.operators.Classifier]]
  * keeps at rest: one pass over the (pre-lowered) text builds the
  * insertion-ordered distinct unigram+bigram count map (identical scan to
  * [[WordNgramCounts.computeCounts]] — [a-z] runs, adjacent bigrams), then
  * each distinct ngram hashes through the engine-neutral 60-bit md5 prefix
  * (the exact value of `conv(substring(md5(k),1,15),16,10) % buckets` —
  * DuckDB-replayable) into aligned (bkts, cnts) arrays. Why a native
  * expression: the HOF spelling (`transform(map_keys(m), k -> pmod(...))`)
  * evaluates an interpreted md5→substring→conv tree per ELEMENT with
  * per-element boxing — measured 3.5× the whole-query wall at sf0.1 —
  * while this runs one JVM loop per row (the WordShingles precedent).
  * NULL text → empty arrays (same contract as wordNgramCounts' empty map;
  * callers filter `size(bkts) > 0` to keep featureless docs out of the
  * model, matching the oracle replay which derives its doc set from the
  * feature table). */
case class HashedNgramBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, s"hashed_ngram_buckets needs buckets > 0, got $buckets")

  override def dataType: DataType = StructType(Seq(
    StructField("bkts", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("cnts", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hashed_ngram_buckets"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input (got ${child.dataType})")

  // MessageDigest is stateful and NOT thread-safe; the expression object is
  // shared across task threads via the codegen reference, so give each
  // thread its own instance.
  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** First 15 hex chars of md5(s) as a 60-bit non-negative long, mod
    * buckets — bit-identical to pmod(conv(substring(md5(s),1,15),16,10), B). */
  private def bucketOf(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v = (v << 4) | ((b(7) & 0xffL) >>> 4)
    v % buckets
  }

  val emptyRow: org.apache.spark.sql.catalyst.InternalRow = {
    val e = new GenericArrayData(Array.empty[Any])
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](e, e))
  }

  def computeBuckets(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val len = s.length
    val map = new java.util.LinkedHashMap[String, Array[Long]](64)
    def inc(key: String): Unit = {
      val slot = map.get(key)
      if (slot == null) map.put(key, Array(1L)) else slot(0) += 1L
    }
    var prev: String = null
    var i = 0
    while (i < len) {
      while (i < len && (s.charAt(i) < 'a' || s.charAt(i) > 'z')) i += 1
      val start = i
      while (i < len && s.charAt(i) >= 'a' && s.charAt(i) <= 'z') i += 1
      if (i > start) {
        val w = s.substring(start, i)
        inc(w)
        if (prev != null) inc(prev + " " + w)
        prev = w
      }
    }
    if (map.isEmpty) return emptyRow
    val n = map.size
    val bkts = new Array[Any](n)
    val cnts = new Array[Any](n)
    val it = map.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      bkts(k) = bucketOf(e.getKey)
      cnts(k) = e.getValue()(0)
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(bkts), new GenericArrayData(cnts)))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyRow else computeBuckets(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketer", this, classOf[HashedNgramBuckets].getName)
    val childGen = child.genCode(ctx)
    val rowCls = classOf[org.apache.spark.sql.catalyst.InternalRow].getName
    ev.copy(
      code = code"""
        |${childGen.code}
        |$rowCls ${ev.value} = ${childGen.isNull}
        |  ? $ref.emptyRow() : $ref.computeBuckets(${childGen.value});
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-doc BM25 scan statistics against a FIXED query vocabulary: one JVM
  * pass over the (pre-lowered — pass `lower(text)`) document splits on the
  * exact `\s+` convention (`Pattern.split(s, -1)`, the same limit Spark's
  * `split(str, regex)` uses, so leading-empty artifacts and token counts
  * are bit-identical to the Catalyst spelling), counts the document length
  * `dl`, and emits aligned (terms, tfs) arrays for the tokens that hit the
  * vocabulary — i.e. the per-doc term frequencies ALREADY REDUCED. Why a
  * native expression: the HOF spelling `filter(toks, t -> t.isin(vocab))`
  * evaluates an interpreted In-chain per corpus TOKEN, and its consumer
  * then re-aggregated the exploded matches through a corpus-wide
  * (doc, dl, term) hash aggregate + exchange; this kernel leaves one
  * O(1)-probe hash-set lookup per token inside the scan and makes the
  * downstream tf explode row-local (guide rule 4 + §2.3 "aggregate before
  * you shuffle"). NULL text → NULL (same as split(lower(NULL))). */
case class WsVocabTokenCounts(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty, "ws_vocab_token_counts needs a non-empty vocabulary")

  override def dataType: DataType = StructType(Seq(
    StructField("dl", DoubleType, nullable = false),
    StructField("terms", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("tfs", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ws_vocab_token_counts"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input (got ${child.dataType})")

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val vocabSet = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  def computeCounts(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    // Pattern.split with limit -1: identical token array (incl. the
    // leading-empty artifact on whitespace-initial text and retained
    // trailing empties) to Spark's split(str, "\\s+")
    val toks = ws.split(text.toString, -1)
    val map = new java.util.LinkedHashMap[String, Array[Long]](16)
    var i = 0
    while (i < toks.length) {
      if (vocabSet.contains(toks(i))) {
        val slot = map.get(toks(i))
        if (slot == null) map.put(toks(i), Array(1L)) else slot(0) += 1L
      }
      i += 1
    }
    val n = map.size
    val terms = new Array[Any](n)
    val tfs = new Array[Any](n)
    val it = map.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      terms(k) = UTF8String.fromString(e.getKey)
      tfs(k) = e.getValue()(0)
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toDouble,
        new GenericArrayData(terms), new GenericArrayData(tfs)))
  }

  override protected def nullSafeEval(input: Any): Any =
    computeCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("counter", this, classOf[WsVocabTokenCounts].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.computeCounts($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ_i cnts[i] · weights[bkts[i]] — the logistic-regression margin (and
  * scoring) dot product over a doc's hashed feature arrays against a dense
  * weight vector that rides as ONE plain double[] codegen reference (not a
  * 2^16-literal expression tree, not a per-round broadcast join). Fully
  * codegen'd tight loop; the HOF spelling
  * (`aggregate(zip_with(...element_at(lit(w))...))`) is interpreted per
  * element. Addends accumulate left-to-right in array order — the same
  * float-noise class as any partial-aggregation order, absorbed by the
  * caller's end-of-pipeline rounding. NULL arrays → NULL. Bucket values
  * outside [0, |weights|) fail loud (corrupt input, not a scorable row). */
case class WeightedBucketDot(left: Expression, right: Expression,
                             weights: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(weights.nonEmpty, "weighted_bucket_dot needs a non-empty weight vector")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "weighted_bucket_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<bigint> inputs, got $other")
    }

  def dot(bkts: ArrayData, cnts: ArrayData): Double = {
    val n = bkts.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += cnts.getLong(i).toDouble * weights(bkts.getLong(i).toInt)
      i += 1
    }
    acc
  }

  override protected def nullSafeEval(b: Any, c: Any): Any =
    dot(b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotter", this, classOf[WeightedBucketDot].getName)
    nullSafeCodeGen(ctx, ev, (b, c) => s"${ev.value} = $ref.dot($b, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization (java.text.Normalizer) as a Catalyst expression —
  * the canonicalization step every multilingual corpus needs BEFORE
  * hashing/dedup/tokenization (the same logical text arrives from
  * different sources as precomposed é vs e+U+0301; without NFC the exact
  * dedup digests differ and near-dup shingles fragment). Forms: NFC
  * (default, canonical compose), NFD, NFKC, NFKD — compatibility forms
  * also fold ligatures/width variants, the aggressive cleaning choice.
  * CodegenFallback: Normalizer is a JDK library call, one virtual call
  * per row around it (the QuantizeInt8Vec precedent); ASCII fast-path
  * skips the Normalizer entirely (the overwhelmingly common case in web
  * corpora). NULL in → NULL out. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {

  private val normForm = form.toUpperCase match {
    case "NFC"  => java.text.Normalizer.Form.NFC
    case "NFD"  => java.text.Normalizer.Form.NFD
    case "NFKC" => java.text.Normalizer.Form.NFKC
    case "NFKD" => java.text.Normalizer.Form.NFKD
    case other  => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (want NFC/NFD/NFKC/NFKD)")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    // ASCII is closed under every normalization form — skip the JDK call
    if (s.isFullAscii) s
    else {
      val j = s.toString
      if (java.text.Normalizer.isNormalized(j, normForm)) s
      else UTF8String.fromString(java.text.Normalizer.normalize(j, normForm))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Distinct word n-gram shingles of a string column (codegen'd). */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  /** Per-row map of character n-gram → count (codegen'd, code-point
    * windows, no casefolding — pass pre-lowered text). */
  def charNgramCounts(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgramCounts(ColumnBridge.expression(text), n))

  /** Per-row map of word unigram+bigram → count (codegen'd, [a-z] runs —
    * pass pre-lowered text). */
  def wordNgramCounts(text: Column): Column =
    ColumnBridge.column(WordNgramCounts(ColumnBridge.expression(text)))

  /** Per-row struct(bkts, cnts) of md5-bucketed distinct word
    * unigram+bigram counts (codegen'd; pass pre-lowered text). */
  def hashedNgramBuckets(text: Column, buckets: Int): Column =
    ColumnBridge.column(HashedNgramBuckets(ColumnBridge.expression(text), buckets))

  /** Σ cnts[i]·weights[bkts[i]] (codegen'd dense-weight dot). */
  def weightedBucketDot(bkts: Column, cnts: Column, weights: Array[Double]): Column =
    ColumnBridge.column(WeightedBucketDot(ColumnBridge.expression(bkts),
      ColumnBridge.expression(cnts), weights))

  /** Per-row struct(dl, terms, tfs): whitespace token count + reduced
    * term frequencies over a fixed vocabulary (codegen'd; pass pre-lowered
    * text). */
  def wsVocabTokenCounts(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WsVocabTokenCounts(ColumnBridge.expression(text), vocab))

  /** Unicode-normalize a string column (NFC/NFD/NFKC/NFKD; ASCII
    * fast-path). */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), form))
}
