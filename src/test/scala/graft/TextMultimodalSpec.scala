package graft

import org.apache.spark.sql.functions._
import graft.operators.{Create, Multimodal, TextAnalysis}

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCountWs: empty, whitespace-only, normal") {
    val t = Create.of(spark, Seq("", "   ", "one two  three")).toDF("s")
    val got = t.select(TextAnalysis.tokenCountWs(col("s"))).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(0, 0, 3))
  }

  test("chunkTokens: boundaries, overlap, short tail, single-chunk and empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, size 4 stride 3 -> 3 chunks
      (2L, "a b c"),                                  // fits one chunk
      (3L, "   ")).toDF("doc_id", "text")             // empty -> 1 empty chunk
    val out = TextAnalysis.chunkTokens(docs, col("doc_id"), col("text"), 4, 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"),
      doc1.mkString("; "))
    assert(doc1.map(_._3).toSeq == Seq(4, 4, 4))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3, "a b c")))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0, 0, "")))
    // every token of doc 1 appears in at least one chunk (coverage law)
    val covered = doc1.flatMap(_._4.split(" ")).toSet
    assert((1 to 10).forall(i => covered(s"t$i")))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(docs, col("doc_id"), col("text"), 4, 4)
    }
  }

  test("lmTrigramScore: hand-computed model, gibberish scores lower, short docs absent") {
    // corpus of "ababab" repeats plus one doc of rare characters: the
    // repeated-trigram docs share high-probability trigrams, the rare doc
    // scores strictly lower
    val docs = Seq(
      (1L, "ababab"), (2L, "ababab"), (3L, "ababab"),
      (4L, "zqxzqx"), (5L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.lmTrigramScore(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(!out.contains(5L), "a 2-char doc has no trigrams")
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    assert(out(1L)._2 == 4 && out(4L)._2 == 4, out.toString)
    assert(out(4L)._1 < out(1L)._1, s"rare trigrams must score lower: $out")
    // hand-check doc 1: trigrams aba,bab,aba,bab; corpus counts:
    // aba=6, bab=6 of 16 total -> each p = 6/16 -> score = ln(0.375)
    val expected = BigDecimal(math.log(6.0 / 16))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(1L)._1 - expected) < 2e-6, s"${out(1L)._1} vs $expected")
  }

  test("lmTrigramScore maxVocab: capped model floors OOV trigrams, cap >= vocab is identical") {
    val docs = Seq(
      (1L, "ababab"), (2L, "ababab"), (3L, "ababab"),
      (4L, "zqxzqx")).toDF("doc_id", "text")
    // corpus trigram counts: aba=6, bab=6, zqx=2, qxz=1, xzq=1 (total 16).
    // cap=2 keeps {aba, bab}; doc 4's trigrams are all OOV -> every
    // instance scores the count-1 floor ln(1/16)
    val capped = TextAnalysis.lmTrigramScore(docs, col("doc_id"), col("text"),
        maxVocab = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(capped(1L)._1 - r6(math.log(6.0 / 16))) < 2e-6,
      s"kept trigrams keep their full-total probability: $capped")
    assert(math.abs(capped(4L)._1 - r6(math.log(1.0 / 16))) < 2e-6,
      s"OOV doc must score the count-1 floor: $capped")
    assert(capped(4L)._2 == 4, "n_tri still counts every instance")
    assert(capped(4L)._1 < capped(1L)._1, "gibberish ordering preserved under the cap")
    // cap >= vocabulary: identical to the uncapped model, row for row
    val un = TextAnalysis.lmTrigramScore(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val wide = TextAnalysis.lmTrigramScore(docs, col("doc_id"), col("text"),
        maxVocab = 100)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(wide == un, s"cap >= vocab must be a no-op: $wide vs $un")
    // deterministic tiebreak: cap=4 keeps exactly {aba,bab,zqx} + the
    // lexicographically FIRST of the two count-1 trigrams (qxz < xzq), so
    // doc 4 scores ln(2/16,1/16,1/16-floor...) — just pin determinism by
    // running twice
    val c4a = TextAnalysis.lmTrigramScore(docs, col("doc_id"), col("text"), maxVocab = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val c4b = TextAnalysis.lmTrigramScore(docs, col("doc_id"), col("text"), maxVocab = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(c4a == c4b, "tie at the cap boundary must resolve deterministically")
  }

  test("charNgramCounts kernel ≡ interpreted transform+substr (multi-byte, surrogates, edges)") {
    // the kernel packs code points, not UTF-16 units or bytes — pin
    // equivalence with the Catalyst lambda form on text where those
    // diverge: 2-byte chars, CJK, an astral (surrogate-pair) emoji
    val texts = Seq(
      "hello world", "héllo wörld", "中文字符串测试", "a😀b😀c", "ababab",
      "ab", "x", "", null)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val kernel = df.select(col("id"),
        explode(graft.expressions.TextExpressions.charNgramCounts(col("t"), 3)))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val lambda = df.select(col("id"),
        explode(when(length(col("t")) < 3, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(col("t")) - 2),
            i => col("t").substr(i, lit(3))))).as("tri"))
      .groupBy(col("id"), col("tri")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(kernel == lambda, s"kernel=$kernel\nlambda=$lambda")
    // first-occurrence order of the distinct grams (map key order)
    val ordered = df.filter(col("id") === 4)
      .select(map_keys(graft.expressions.TextExpressions.charNgramCounts(col("t"), 3)))
      .collect()(0).getSeq[String](0)
    assert(ordered == Seq("aba", "bab"), ordered.toString)
  }

  test("tokenCountApprox counts word-piece regex pieces") {
    val t = Create.of(spark, Seq("hello, world 42")).toDF("s")
    // hello | , | world | 4 | 2
    assert(t.select(TextAnalysis.tokenCountApprox(col("s"))).collect()(0).getInt(0) == 5)
  }

  test("Bpe.tokenizeWord: greedy lowest-rank merge loop, hand-computed law cases") {
    import graft.operators.Bpe
    val ranks = Bpe.defaultMerges.zipWithIndex.toMap
    // (t,h) then (th,e)
    assert(Bpe.tokenizeWord("the", ranks) == Vector("the"))
    // (t,h) -> (a,t)? no: (th,at) wins only after (a,t)=7 loses to... trace:
    // t h a t -> th a t (rank 0) -> th at (rank 7) -> that (rank 28)
    assert(Bpe.tokenizeWord("that", ranks) == Vector("that"))
    // t h i n -> th i n -> th in: no (th,in) merge
    assert(Bpe.tokenizeWord("thin", ranks) == Vector("th", "in"))
    // a n d -> an d -> and
    assert(Bpe.tokenizeWord("and", ranks) == Vector("and"))
    // no ranked pair anywhere: one symbol per char (OOV behavior)
    assert(Bpe.tokenizeWord("zzz", ranks) == Vector("z", "z", "z"))
    // case-sensitive: (t,h) does not match (T,h)
    assert(Bpe.tokenizeWord("Thing", ranks) == Vector("T", "h", "ing"))
    // one merge round rewrites ALL occurrences of the best pair
    assert(Bpe.tokenizeWord("thth", ranks) == Vector("th", "th"))
  }

  test("Bpe.countString: pretoken split + per-word merges; null/empty safe") {
    import graft.operators.Bpe
    val ranks = Bpe.defaultMerges.zipWithIndex.toMap
    // hello->4 (ll), ","->1, world->4 (or), 42->2 (digit run, no merges)
    assert(Bpe.countString("hello, world 42", ranks) == 11)
    assert(Bpe.countString(null, ranks) == 0)
    assert(Bpe.countString("", ranks) == 0)
    assert(Bpe.countString("   ", ranks) == 0)
  }

  test("Bpe.tokenCount distributes and matches countString per doc") {
    import graft.operators.Bpe
    val ranks = Bpe.defaultMerges.zipWithIndex.toMap
    val docs = Create.of(spark, Seq(
      (1L, "the cat and that thing"),
      (2L, "zzz 42!!"),
      (3L, ""))).toDF("doc_id", "text")
    val got = Bpe.tokenCount(docs.repartition(3), col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Map(
      1L -> Bpe.countString("the cat and that thing", ranks),
      2L -> Bpe.countString("zzz 42!!", ranks),
      3L -> 0)
    assert(got == want)
  }

  test("Bpe.parseMerges reads the merges.txt format") {
    import graft.operators.Bpe
    val lines = Iterator("#version: demo", "t h", "th e", "")
    assert(Bpe.parseMerges(lines) == Seq(("t", "h"), ("th", "e")))
  }

  test("langId votes stopwords per language; und when no hits") {
    val t = Create.of(spark, Seq(
      ("en", "the cat and the dog was with you"),
      ("de", "der hund ist nicht mit der katze"),
      ("fr", "le chat est dans les jardins"),
      ("es", "el perro que corre por la casa con los gatos"),
      ("zh", "我在这里他不是你的朋友"), // unsegmented: char containment, not tokens
      ("und", "zxcvb qwerty"))).toDF("expected", "text")
    val got = t.select(col("expected"), TextAnalysis.langId(col("text")))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("fingerprint invariant to case/punct/whitespace edits") {
    val t = Create.of(spark, Seq("Hello,  World!", "hello world")).toDF("s")
    val fps = t.select(TextAnalysis.fingerprint(col("s"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("qualityFeatures computes ratios in [0,1]") {
    val d = Create.of(spark, Seq((1L, "The quick brown fox. It is fast!"))).toDF("id", "text")
    val r = TextAnalysis.qualityFeatures(d, col("text"), col("id")).collect()(0)
    assert(r.getAs[Double]("punct_ratio") > 0 && r.getAs[Double]("punct_ratio") < 0.2)
    assert(r.getAs[Double]("stopword_ratio") > 0 && r.getAs[Double]("stopword_ratio") < 1)
    assert(r.getAs[Int]("n_tokens") == 7)
  }

  test("multimodal decode is deterministic and batched per partition") {
    val media = Multimodal.asMedia(
      Create.of(spark, Seq((1L, "payload-one"), (2L, "payload-two"))).toDF("id", "txt"),
      col("id"), col("txt"), "image")
    val a = Multimodal.decodeImages(spark, media).collect().map(_.toSeq).toSet
    val b = Multimodal.decodeImages(spark, media.repartition(3)).collect().map(_.toSeq).toSet
    assert(a == b && a.size == 2)
  }

  test("multimodal features: L1-normalized histogram of dim 16") {
    val media = Multimodal.asMedia(
      Create.of(spark, Seq((1L, "some payload bytes"))).toDF("id", "txt"),
      col("id"), col("txt"), "image")
    val feats = Multimodal.extractFeatures(spark, media).collect()(0).getSeq[Float](1)
    assert(feats.size == 16)
    assert(math.abs(feats.map(_.toDouble).sum - 1.0) < 1e-6)
  }

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages: REAL PNG payloads decode to true dims; junk falls back with decoded=false") {
    val rows = Seq(
      (1L, pngBytes(37, 11, 0x336699)),
      (2L, pngBytes(200, 150, 0xFFFFFF)),
      (3L, "not an image at all".getBytes("UTF-8")))
    val media = Multimodal.asMedia(
      rows.toDF("id", "bytes"), col("id"), col("bytes"), "image")
    val got = Multimodal.decodeImages(spark, media).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(4)))).toMap
    assert(got(1L) == ((37, 11, true)))
    assert(got(2L) == ((200, 150, true)))
    assert(got(3L)._3 == false) // stub fallback, flagged
  }

  test("extractFeatures: real PNG yields a pixel-luminance histogram") {
    // all-white 8x8: every pixel luma=255 -> bin 15 of 16 holds all mass
    val media = Multimodal.asMedia(
      Seq((1L, pngBytes(8, 8, 0xFFFFFF))).toDF("id", "bytes"),
      col("id"), col("bytes"), "image")
    val feats = Multimodal.extractFeatures(spark, media).collect()(0).getSeq[Float](1)
    assert(feats.size == 16)
    assert(math.abs(feats(15) - 1.0f) < 1e-6)
    assert(math.abs(feats.map(_.toDouble).sum - 1.0) < 1e-6)
  }

  /** 16-bit PCM mono WAV of a sine at `freq` Hz, amplitude `amp` (of
    * full-scale 32767), written through the JDK's own encoder. */
  private def wavBytes(sampleRate: Int, nFrames: Int, freq: Double,
                       amp: Double): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = math.round(amp * 32767 *
        math.sin(2 * math.Pi * freq * i / sampleRate)).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio: REAL WAV payloads decode to true header + pcm stats; junk falls back") {
    val rows = Seq(
      (1L, wavBytes(8000, 8000, freq = 440, amp = 0.5)),   // 1s @ 8 kHz
      (2L, wavBytes(16000, 4000, freq = 1000, amp = 1.0)), // 0.25s @ 16 kHz
      (3L, "definitely not audio".getBytes("UTF-8")))
    val media = Multimodal.asMedia(
      rows.toDF("id", "bytes"), col("id"), col("bytes"), "audio")
    val got = Multimodal.decodeAudio(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap

    val a = got(1L)
    assert(a.getInt(1) == 8000 && a.getInt(2) == 1 && a.getLong(3) == 8000)
    assert(a.getLong(4) == 1000000L) // exactly 1s in µs
    // full-period sine: rms = amp/√2, peak = amp (2% slack for quantization)
    assert(math.abs(a.getDouble(5) - 0.5 / math.sqrt(2)) < 0.01, s"rms=${a.getDouble(5)}")
    assert(math.abs(a.getDouble(6) - 0.5) < 0.01, s"peak=${a.getDouble(6)}")
    assert(a.getBoolean(8))

    val b = got(2L)
    assert(b.getInt(1) == 16000 && b.getLong(3) == 4000 && b.getLong(4) == 250000L)
    assert(math.abs(b.getDouble(5) - 1.0 / math.sqrt(2)) < 0.01)

    val junk = got(3L)
    assert(!junk.getBoolean(8) && junk.isNullAt(5) && junk.isNullAt(6))
    // fallback header matches the engine-neutral stub derivation exactly
    val (sr, ch, fr, durUs) = Multimodal.StubCodec.audioInfo(
      "definitely not audio".getBytes("UTF-8"))
    assert(junk.getInt(1) == sr && junk.getInt(2) == ch &&
      junk.getLong(3) == fr && junk.getLong(4) == durUs)
  }

  test("multimodal frame sampling takes every k-th block") {
    val big = "x" * 2048 // 8 blocks of 256
    val media = Multimodal.asMedia(
      Create.of(spark, Seq((1L, big))).toDF("id", "txt"), col("id"), col("txt"), "video")
    val frames = Multimodal.sampleFrames(spark, media, everyK = 4).collect()
    assert(frames.length == 2) // blocks 0 and 4
    assert(frames.forall(r => r.isNullAt(3) && r.isNullAt(4))) // stub: no dims
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, ((x * 7) << 16) | (y * 5))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("VideoCodec: MJPEG AVI round-trips build -> parse -> ImageIO decode") {
    import Multimodal.VideoCodec
    val f0 = jpegBytes(32, 24); val f1 = jpegBytes(32, 24); val f2 = jpegBytes(32, 24)
    val avi = VideoCodec.buildMjpegAvi(Seq(f0, f1, f2), width = 32, height = 24, fps = 10)
    val parsed = VideoCodec.parseAvi(avi)
    assert(parsed.isDefined, "built AVI must parse")
    val v = parsed.get
    assert(v.width == 32 && v.height == 24 && v.declaredFrames == 3)
    assert(v.frames.size == 3)
    assert(v.frames(0).sameElements(f0) && v.frames(1).sameElements(f1) &&
      v.frames(2).sameElements(f2)) // frame bytes survive the container intact
    // the REAL decode: each recovered frame is a standalone JPEG
    val img = Multimodal.ImageCodec.decode(v.frames(0))
    assert(img.isDefined && img.get.getWidth == 32 && img.get.getHeight == 24)
  }

  test("VideoCodec: non-AVI, truncated, and hostile-size payloads parse to None") {
    import Multimodal.VideoCodec
    assert(VideoCodec.parseAvi(null).isEmpty)
    assert(VideoCodec.parseAvi("plain text payload".getBytes("UTF-8")).isEmpty)
    assert(VideoCodec.parseAvi("RIFF".getBytes("UTF-8")).isEmpty) // too short
    val good = VideoCodec.buildMjpegAvi(Seq(jpegBytes(8, 8)), 8, 8)
    assert(VideoCodec.parseAvi(java.util.Arrays.copyOf(good, 20)).isEmpty ||
      VideoCodec.parseAvi(java.util.Arrays.copyOf(good, 20)).get.frames.isEmpty)
    // hostile chunk size (0xFFFFFFFF) inside movi: walk aborts, no OOB/loop
    val hostile = good.clone()
    // find "00dc" and corrupt its size field to u32 max
    val idx = hostile.indices.find(i => i + 4 <= hostile.length &&
      new String(hostile, i, 4, "ISO-8859-1") == "00dc").get
    hostile(idx + 4) = 0xFF.toByte; hostile(idx + 5) = 0xFF.toByte
    hostile(idx + 6) = 0xFF.toByte; hostile(idx + 7) = 0xFF.toByte
    VideoCodec.parseAvi(hostile) // must terminate without throwing
  }

  test("sampleFrames: AVI payloads take the real path, text the stub path") {
    import Multimodal.VideoCodec
    val frames3 = Seq(jpegBytes(16, 12), jpegBytes(16, 12), jpegBytes(16, 12))
    val avi = VideoCodec.buildMjpegAvi(frames3, 16, 12)
    val rows = Seq((1L, avi), (2L, ("y" * 600).getBytes("UTF-8")))
    val media = Multimodal.asMedia(
      rows.toDF("id", "bytes"), col("id"), col("bytes"), "video")
    val got = Multimodal.sampleFrames(spark, media, everyK = 2).collect()
      .groupBy(_.getLong(0))
    // real path: frames 0 and 2 sampled, renumbered 0/1, real decoded dims
    val real = got(1L).sortBy(_.getInt(1))
    assert(real.length == 2)
    assert(real(0).getAs[Array[Byte]](2).sameElements(frames3(0)))
    assert(real(1).getAs[Array[Byte]](2).sameElements(frames3(2)))
    assert(real.forall(r => r.getInt(3) == 16 && r.getInt(4) == 12))
    // stub path: 600 bytes -> blocks 0 and 2 of 256, NULL dims
    val stub = got(2L).sortBy(_.getInt(1))
    assert(stub.length == 2 && stub.forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("goldenJpeg fixture: 649 bytes, ImageIO-decodes at 8x8") {
    // q_mm_frames' oracle hardcodes these three facts; pin them here so a
    // fixture edit fails fast in CI rather than as an oracle hash mismatch
    assert(Queries.goldenJpeg.length == 649)
    val img = Multimodal.ImageCodec.decode(Queries.goldenJpeg)
    assert(img.isDefined && img.get.getWidth == 8 && img.get.getHeight == 8)
  }

  test("Metrics counter accumulates across a distributed action") {
    import spark.implicits._
    val c = Metrics.counter(spark, "rows_seen")
    c.reset()
    Create.of(spark, 1 to 100).map { x => c.add(1); x }.count()
    assert(Metrics.counterValue(spark, "rows_seen").contains(100L))
  }

  test("Metrics observedDistribution returns min/max/count/sum") {
    val df = Create.of(spark, Seq(1L, 2L, 3L)).toDF("v")
    val r = Metrics.observedDistribution(df, "dist_test", col("v"))
    assert(r.toSeq == Seq(1L, 3L, 3L, 6L))
  }

  test("Clean: markup stripped, URL/email/IP/phone redacted, whitespace collapsed") {
    import TextAnalysis.Clean
    val cases = Seq(
      ("<p>Hi  <b>there</b></p>\twrite to a.b+c@mail.example.org now",
        "Hi there write to <EMAIL> now"),
      ("see https://ex.com/a?b=1#c and http://10.1.2.3/x for details",
        "see <URL> and <URL> for details"),
      ("server at 192.168.0.1 port 80; version 1.2.3.4 too",
        "server at <IP> port 80; version <IP> too"),
      ("call +14155550123 or +4930123456 today", "call <PHONE> or <PHONE> today"),
      // interactions: address inside markup attributes survives as text is
      // stripped, the email itself still redacts; IP inside a URL is
      // already consumed by <URL>
      ("<a href=\"https://spam.example.com\">x</a> mail@example.com at 8.8.8.8",
        "x mail@example.com at <IP>".replace("mail@example.com", "<EMAIL>")),
      ("no pii here, just words", "no pii here, just words"))
    val got = cases.map(_._1).toDF("t").select(Clean.clean(col("t"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, e) => assert(g == e, s"got [$g]") }
  }

  test("unicodeNormalize: NFC composes combining marks, NFKC folds compatibility, " +
       "ASCII fast-path, NULL in -> NULL out, bad form fails loud") {
    import graft.expressions.TextExpressions.unicodeNormalize
    val rows = Seq(
      "cafe\u0301",   // e + combining acute -> precomposed e-acute
      "A\u030A",      // A + combining ring -> precomposed Angstrom A
      "\uFB01le",     // fi ligature: NFC keeps, NFKC folds to "fi"
      "plain ascii",
      null
    ).toDF("t")
    val nfc = rows.select(unicodeNormalize(col("t"), "NFC")).as[String].collect()
    assert(nfc(0) == "caf\u00E9" && nfc(1) == "\u00C5")
    assert(nfc(2) == "\uFB01le" && nfc(3) == "plain ascii" && nfc(4) == null)
    val nfkc = rows.select(unicodeNormalize(col("t"), "NFKC")).as[String].collect()
    assert(nfkc(2) == "file", s"NFKC must fold the ligature, got ${nfkc(2)}")
    val e = intercept[Exception] {
      rows.select(unicodeNormalize(col("t"), "NFX")).collect()
    }
    assert(e.getMessage.contains("NFX") || e.getCause != null)
  }
}
