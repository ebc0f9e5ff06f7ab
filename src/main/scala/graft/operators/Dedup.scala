package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication. Not present in the reference
  * (Beam offers only Distinct — SDK/transforms/Distinct.java); these are the
  * first-class pipeline ops a 100 TB corpus needs, designed shuffle-first:
  * every variant reduces to (doc → bounded signature) → groupBy(signature),
  * so the shuffle carries signatures, never documents.
  */
object Dedup {

  /** Exact dedup by content hash. md5 keeps the shuffle key at 32 bytes
    * regardless of document size; representative = min(doc_id) for
    * determinism. At 100 TB: one shuffle of (hash, id) pairs only. */
  def exact(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.select(md5(text).as("content_hash"), id.as("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("copies"))

  /** Word n-gram shingles, normalized (lowercase, whitespace-split). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(lower(text), "\\s+")
    // transform over a sliding range: shingle i = words[i..i+n-1]
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => when(size(words) >= n, concat_ws(" ",
          slice(words, i + 1, lit(n)))).otherwise(null)),
      x => x.isNotNull))
  }

  /** MinHash+LSH near-dup candidates.
    *
    * Signature: per band b, minhash = min over shingles of md5(b || shingle)
    * (a distinct hash function per band via the band-index prefix; min of the
    * hex strings is a uniform min-hash). Docs sharing any band bucket are
    * candidates — the classic banding scheme. Each row contributes `bands`
    * (bucket, id) pairs of ~50 bytes; the join is a groupBy on the bucket, so
    * at 100 TB the heavy text never shuffles.
    *
    * `rowsPerBand = 1` here (bucket = one minhash); raise bands to raise
    * recall, post-filter with [[ngramJaccard]] for precision.
    */
  def minHashCandidates(docs: DataFrame, text: Column, id: Column,
                        shingleN: Int = 3, bands: Int = 8): DataFrame =
    minHashSignatures(docs, text, id, shingleN, bands)
      .groupBy(col("band"), col("minhash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("bucket_ids"),
           count(lit(1)).as("bucket_size"))
      .filter(col("bucket_size") > 1)

  /** Same signature computation without the self-join (single pass). */
  def minHashSignatures(docs: DataFrame, text: Column, id: Column,
                        shingleN: Int = 3, bands: Int = 8): DataFrame =
    docs.select(id.as("doc_id"), shingles(text, shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            array_min(transform(col("sh"),
              s => md5(concat(b.cast("string"), lit(":"), s)))).as("minhash"))
      )).as("sig"))
      .select(col("doc_id"), col("sig.band").as("band"), col("sig.minhash").as("minhash"))

  /** SimHash: 64-bit locality-sensitive fingerprint. Each shingle votes its
    * hash bits; fingerprint bit i is the sign of the vote sum. Near-dups have
    * small Hamming distance. xxhash64 is Spark-native and codegen'd.
    * At scale: one narrow pass; grouping by fingerprint (or by rotated
    * prefixes for Hamming-k search) is a signature-only shuffle. */
  def simHash(docs: DataFrame, text: Column, id: Column, shingleN: Int = 2): DataFrame = {
    // One pass: per shingle hash, vote +1/-1 per bit into a 64-slot array
    // accumulator; fingerprint bit i set iff vote i > 0. Shift amounts are
    // lambda-bound Columns, so we go through the SQL functions (which accept
    // Column shift amounts) via call_function — still pure codegen'd Catalyst.
    val signs = (h: Column) => transform(sequence(lit(0), lit(63)), bit =>
      when(call_function("shiftright", h, bit).bitwiseAND(1) === 1, 1).otherwise(-1))
    val votes = aggregate(col("__h"), array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, signs(h), (a, v) => a + v))
    val fingerprint = aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, bit) => when(v > 0, call_function("shiftleft", lit(1L), bit)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
    docs.select(id.as("doc_id"), transform(shingles(text, shingleN), s => xxhash64(s)).as("__h"))
      .filter(size(col("__h")) > 0)
      .select(col("doc_id"), fingerprint.as("simhash"))
  }

  /** N-gram Jaccard verification over candidate pairs: docs sharing a
    * shingle become pairs; |A∩B| counted by the join, |A∪B| = |A|+|B|−|∩|.
    * Shuffle carries (shingle, id, size) triples. Pairs with huge fanout
    * (stop-shingles) should be frequency-capped upstream at 100 TB —
    * `maxShingleFreq` drops shingles seen in more than that many docs. */
  def ngramJaccardPairs(docs: DataFrame, text: Column, id: Column,
                        shingleN: Int = 3, threshold: Double = 0.8,
                        maxShingleFreq: Int = 1000): DataFrame = {
    val sh = docs.select(id.as("doc_id"), explode(shingles(text, shingleN)).as("s"))
    val capped = sh.withColumn("__freq",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
      .filter(col("__freq") <= maxShingleFreq).drop("__freq")
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = capped.as("a"); val b = capped.as("b")
    val inter = a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding cosine near-dup: LSH-bucket by random-hyperplane sign bits,
    * verify cosine within buckets. See Similarity.cosine for the kernel. */
  def embeddingNearDup(embs: DataFrame, id: Column, vec: Column,
                       planes: Int = 12, threshold: Double = 0.95,
                       seed: Long = 42L): DataFrame = {
    val bucketed = Similarity.hyperplaneBucket(embs, id, vec, planes, seed)
    val a = bucketed.as("a"); val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cos", Similarity.cosine(col("a.vec"), col("b.vec")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }
}
