package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.unsafe.types.UTF8String

/**
 * C100: unigram-LM subword tokenizer (the SentencePiece family), the
 * OTHER production tokenizer besides BPE (C11b/C11c): a piece
 * vocabulary with log-probabilities, applied by Viterbi segmentation,
 * trained by hard-EM (Viterbi re-estimation) with a final prune to the
 * target vocabulary size.
 *
 * The 100 TB trainer shape ([[learnDistributed]]): the ONLY corpus-
 * sized pass is one map-side-combining (pre-token word form → count)
 * aggregate — identical to the C11c BPE trainer's. Everything after
 * runs over the bounded word-form histogram: the seed vocabulary is a
 * combining substring-count aggregate (codegen'd [[CharSubstrings]]
 * explode) truncated to `seedSize` pieces, and each EM round is a
 * map-only codegen Viterbi ([[UnigramWordPieces]]) over the persisted
 * histogram plus one combining piece aggregate whose result — at most
 * |vocab| rows — is the only driver state. No UDFs, no driver loops
 * over data.
 *
 * Determinism (the dynamic-oracle contract, the C11c device): all
 * counts are exact Longs; piece scores are `round(StrictMath.log(c/N)
 * · 1e6)` micro-nats (StrictMath for bit-stable logs); Viterbi runs
 * over Long sums with strict-improvement updates scanning piece
 * lengths ascending, so ties resolve to the shortest final piece; and
 * every top-K truncation orders by (count desc, piece asc) under
 * UTF8String BINARY order — the local oracle path sorts with the same
 * comparator so Spark's string sort and the driver replay agree even
 * off the BMP.
 */
object UnigramLm {

  /** Pre-tokenizer: the same GPT-2-family split as BPE (C11). */
  private[functions] def preTokens(text: String): Vector[String] =
    Bpe.preTokens(text)

  private val utf8Order: Ordering[String] =
    (a: String, b: String) => UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** Code-point substrings of length 1..maxLen (codegen static target). */
  def charSubstringsJava(word: UTF8String, maxLen: Int): GenericArrayData = {
    val s = word.toString
    // code-point start offsets (UTF-16 indices), plus the end sentinel
    val starts = Array.newBuilder[Int]
    var i = 0
    while (i < s.length) { starts += i; i += Character.charCount(s.codePointAt(i)) }
    starts += s.length
    val off = starts.result()
    val n = off.length - 1
    val out = Array.newBuilder[Any]
    var a = 0
    while (a < n) {
      var len = 1
      while (len <= maxLen && a + len <= n) {
        out += UTF8String.fromString(s.substring(off(a), off(a + len)))
        len += 1
      }
      a += 1
    }
    new GenericArrayData(out.result())
  }

  private def charSubstrings(word: Column, maxLen: Int): Column =
    Shim.column(CharSubstrings(Shim.expression(word), maxLen))

  private def wordPieces(word: Column, model: UnigramModel): Column =
    Shim.column(UnigramWordPieces(Shim.expression(word), model))

  /** Unigram-LM token count column (codegen'd, map-only). */
  def tokenCount(text: Column, model: UnigramModel): Column =
    Shim.column(UnigramTokenCount(Shim.expression(text), model))

  private def buildModel(
      charCounts: Seq[(String, Long)],
      multiCounts: Seq[(String, Long)],
      maxPieceLen: Int): UnigramModel = {
    // chars always survive (coverage floor count 1); multi as given
    val chars = charCounts.map { case (p, c) => (p, math.max(c, 1L)) }
    val all = (chars ++ multiCounts).sortBy(_._1)(utf8Order)
    new UnigramModel(all.map(_._1).toArray, all.map(_._2).toArray, maxPieceLen)
  }

  /**
   * Train on the whole corpus: one combining histogram aggregate, then
   * seed + EM + prune over the bounded word-form table (see class doc).
   */
  def learnDistributed(
      docs: DataFrame,
      textCol: String,
      vocabSize: Int,
      emRounds: Int = 2,
      seedSize: Int = 1 << 14,
      maxPieceLen: Int = 5,
      maxWordForms: Int = 1 << 20): UnigramModel = {
    import org.apache.spark.sql.functions._
    require(vocabSize > 0 && emRounds >= 0 && seedSize > 0 && maxPieceLen >= 1)
    val hist = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(TextFunctions.BpeTokenRe), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWordForms)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val subCounts = hist
        .select(col("c"), explode(charSubstrings(col("w"), maxPieceLen)).as("p"))
        .groupBy("p").agg(sum(col("c")).as("pc"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (chars, multi) =
        try {
          val cs = subCounts.filter(length(col("p")) === 1)
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          val ms = subCounts.filter(length(col("p")) > 1)
            .orderBy(col("pc").desc, col("p")).limit(seedSize)
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          (cs, ms)
        } finally subCounts.unpersist()
      var model = buildModel(chars, multi, maxPieceLen)
      var round = 0
      while (round < emRounds) {
        val counts = hist
          .select(col("c"), explode(wordPieces(col("w"), model)).as("p"))
          .groupBy("p").agg(sum(col("c")).as("pc"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        model = reestimate(model, counts)
        round += 1
      }
      prune(model, vocabSize)
    } finally hist.unpersist()
  }

  /**
   * The INDEPENDENT driver path for the dynamic oracle (the C11c
   * device): local histogram, local seed counting, local EM loops —
   * shares only the Viterbi core and the score formula with the
   * distributed trainer, so a divergence in any Spark aggregate
   * hash-fails the oracle compare.
   */
  def learnLocal(
      texts: Seq[String],
      vocabSize: Int,
      emRounds: Int = 2,
      seedSize: Int = 1 << 14,
      maxPieceLen: Int = 5,
      maxWordForms: Int = 1 << 20): UnigramModel = {
    val hist0 = mutable.HashMap.empty[String, Long]
    texts.foreach { t =>
      if (t != null) preTokens(t).foreach { w =>
        hist0.updateWith(w)(c => Some(c.getOrElse(0L) + 1))
      }
    }
    val hist = hist0.toSeq
      .sortBy { case (w, c) => (-c, w) }(Ordering.Tuple2(Ordering.Long, utf8Order))
      .take(maxWordForms)
    val subs = mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, c) =>
      val arr = charSubstringsJava(UTF8String.fromString(w), maxPieceLen)
      var i = 0
      while (i < arr.numElements()) {
        subs.updateWith(arr.getUTF8String(i).toString)(x => Some(x.getOrElse(0L) + c))
        i += 1
      }
    }
    val chars = subs.iterator
      .filter { case (p, _) => p.codePointCount(0, p.length) == 1 }
      .toSeq.sortBy(_._1)(utf8Order)
    val multi = subs.iterator
      .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .toSeq
      .sortBy { case (p, c) => (-c, p) }(Ordering.Tuple2(Ordering.Long, utf8Order))
      .take(seedSize)
    var model = buildModel(chars, multi, maxPieceLen)
    var round = 0
    while (round < emRounds) {
      val counts = mutable.HashMap.empty[String, Long]
      hist.foreach { case (w, c) =>
        model.encodeWord(w).foreach { p =>
          counts.updateWith(p)(x => Some(x.getOrElse(0L) + c))
        }
      }
      model = reestimate(model, counts.toMap)
      round += 1
    }
    prune(model, vocabSize)
  }

  /** M-step: chars keep a coverage floor of 1; unused multi drop. */
  private def reestimate(model: UnigramModel, counts: Map[String, Long]): UnigramModel = {
    val chars = mutable.ArrayBuffer.empty[(String, Long)]
    val multi = mutable.ArrayBuffer.empty[(String, Long)]
    var i = 0
    while (i < model.pieces.length) {
      val p = model.pieces(i)
      val c = counts.getOrElse(p, 0L)
      if (p.codePointCount(0, p.length) == 1) chars += ((p, c))
      else if (c > 0L) multi += ((p, c))
      i += 1
    }
    buildModel(chars.toSeq, multi.toSeq, model.maxPieceLen)
  }

  /** Keep every char piece + the top multi pieces up to vocabSize. */
  private def prune(model: UnigramModel, vocabSize: Int): UnigramModel = {
    val (chars, multi) = model.pieces.zip(model.counts)
      .partition { case (p, _) => p.codePointCount(0, p.length) == 1 }
    val keep = multi.toSeq
      .sortBy { case (p, c) => (-c, p) }(Ordering.Tuple2(Ordering.Long, utf8Order))
      .take(math.max(vocabSize - chars.length, 0))
    buildModel(chars.toSeq, keep, model.maxPieceLen)
  }
}

/**
 * The shipped unigram model: pieces + exact counts; micro-nat Long
 * scores derive deterministically at construction. Serializable for
 * `addReferenceObj`; the per-executor memo cache is transient and
 * bounded (the [[BpeCodec]] pattern).
 */
class UnigramModel(
    val pieces: Array[String],
    val counts: Array[Long],
    val maxPieceLen: Int) extends Serializable {

  /** Fixed out-of-vocabulary single-char penalty (micro-nats). */
  private val UnkScore = -30000000L
  private val NegInf = Long.MinValue / 4

  private val total: Long = { var s = 0L; counts.foreach(s += _); math.max(s, 1L) }

  @transient private lazy val scoreMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), Long.box(math.round(
        StrictMath.log(counts(i).toDouble / total.toDouble) * 1e6)))
      i += 1
    }
    m
  }

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]
  private val MemoCap = 65536

  /** Viterbi segmentation of ONE word form (no pre-tokenization).
   * Strict-improvement updates with piece length ascending: ties
   * resolve to the shortest piece ending each position. */
  def encodeWord(word: String): Seq[String] = {
    val s = word
    val starts = Array.newBuilder[Int]
    var i = 0
    while (i < s.length) { starts += i; i += Character.charCount(s.codePointAt(i)) }
    starts += s.length
    val off = starts.result()
    val n = off.length - 1
    if (n == 0) return Nil
    val dp = Array.fill(n + 1)(NegInf)
    val back = Array.fill(n + 1)(0)
    dp(0) = 0L
    var end = 1
    while (end <= n) {
      var len = 1
      val maxL = math.min(maxPieceLen, end)
      while (len <= maxL) {
        val start = end - len
        if (dp(start) > NegInf) {
          val sub = s.substring(off(start), off(end))
          val sc = scoreMap.get(sub)
          val v: Long =
            if (sc != null) sc.longValue
            else if (len == 1) UnkScore
            else NegInf
          if (v > NegInf && dp(start) + v > dp(end)) {
            dp(end) = dp(start) + v
            back(end) = len
          }
        }
        len += 1
      }
      end += 1
    }
    var out = List.empty[String]
    var pos = n
    while (pos > 0) {
      val len = back(pos)
      out = s.substring(off(pos - len), off(pos)) :: out
      pos -= len
    }
    out
  }

  private def countWord(word: String): Int = {
    var c = memo.get(word)
    if (c == null) {
      c = encodeWord(word).length
      if (memo.size >= MemoCap) memo.clear()
      memo.put(word, c)
    }
    c.intValue
  }

  /** Full-text token count: pre-tokenize, Viterbi each pre-token. */
  def countTokens(text: UTF8String): Int = {
    if (text == null) return 0
    val m = Bpe.PreTokenRe.matcher(text.toString)
    var n = 0
    while (m.find()) n += countWord(m.group())
    n
  }

  /** Viterbi pieces of one word form, for the E-step explode. */
  def wordPiecesArray(word: UTF8String): GenericArrayData =
    new GenericArrayData(
      encodeWord(word.toString).map(UTF8String.fromString).toArray[Any])

  /** Full-text segmentation (spec/oracle driver path). */
  def encode(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    UnigramLm.preTokens(text).foreach(w => out ++= encodeWord(w))
    out.result()
  }
}

/** Code-point substrings of length 1..maxLen — the seed-vocabulary
 * explode, one codegen'd static call per word form. */
case class CharSubstrings(child: Expression, maxLen: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_substrings"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    UnigramLm.charSubstringsJava(input.asInstanceOf[UTF8String], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.functions.UnigramLm.charSubstringsJava($str, $maxLen);")

  override protected def withNewChildInternal(newChild: Expression): CharSubstrings =
    copy(child = newChild)
}

/** Viterbi pieces of one WORD FORM under the embedded model — the
 * EM E-step explode (map-only codegen over the histogram). */
case class UnigramWordPieces(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_word_pieces"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.wordPiecesArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model, "graft.functions.UnigramModel")
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $ref.wordPiecesArray($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramWordPieces =
    copy(child = newChild)
}

/** Unigram-LM token count of a full text column (pre-tokenize +
 * Viterbi) — codegen'd, map-only, memoized per executor. */
case class UnigramTokenCount(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "unigram_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    model.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model, "graft.functions.UnigramModel")
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $ref.countTokens($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramTokenCount =
    copy(child = newChild)
}
