package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Real byte-pair-encoding tokenization (C11's learned-merge path; the
 * regex in [[TextFunctions.bpeTokenCount]] is the PRE-tokenizer only).
 *
 * Shape: merges are LEARNED on the driver from a bounded corpus sample
 * (classic Sennrich-style highest-frequency pair iteration --
 * deterministic: count ties break to the lexicographically smallest
 * pair), then shipped to executors inside a serializable [[BpeCodec]]
 * and applied by the codegen'd [[BpeTokenCount]] expression -- one
 * static call per row, no UDF, no shuffle. This mirrors how production
 * tokenizers run in Spark pipelines: the merge table is the model
 * (GPT-2's is 50k learned merges), the application is a map-only pass.
 *
 * Encoding matches the GPT-2 algorithm per pre-token: repeatedly merge
 * the adjacent symbol pair with the LOWEST merge rank until no ranked
 * pair remains; the token count is the number of surviving symbols.
 * Symbols are unicode code points (never split surrogate pairs).
 */
object Bpe {

  private[functions] val PreTokenRe =
    java.util.regex.Pattern.compile(TextFunctions.BpeTokenRe)

  /** Pre-tokenize exactly like the C11 regex (GPT-2-family word split). */
  def preTokens(text: String): Vector[String] = {
    val m = PreTokenRe.matcher(text)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  private def toSymbols(word: String): Vector[String] =
    word.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /**
   * Learn `numMerges` merges from sample texts (driver-side; bound the
   * sample like any trainSample collect). Deterministic: each round
   * merges the most frequent adjacent symbol pair, ties to the
   * lexicographically smallest (pair-left, pair-right).
   */
  def learn(sample: Seq[String], numMerges: Int): Vector[(String, String)] = {
    val hist = mutable.HashMap.empty[String, Long]
    sample.foreach { t =>
      preTokens(t).foreach { w => hist.updateWith(w)(c => Some(c.getOrElse(0L) + 1)) }
    }
    learnFromHistogram(hist.toSeq, numMerges)
  }

  /**
   * The merge loop over a (pre-token word form, count) HISTOGRAM — the
   * state real BPE trainers iterate on: O(distinct word forms), not
   * O(corpus). [[learn]] builds the histogram from raw texts;
   * [[learnDistributed]] builds it with one corpus-wide combining
   * aggregate. Same deterministic rule either way: merge the most
   * frequent adjacent pair, ties to the lexicographically smallest.
   */
  def learnFromHistogram(
      wordCounts: Seq[(String, Long)], numMerges: Int): Vector[(String, String)] = {
    require(numMerges >= 0)
    var words = mutable.HashMap.empty[Vector[String], Long]
    wordCounts.foreach { case (w, n) =>
      val s = toSymbols(w)
      if (s.length > 1) words.updateWith(s)(c => Some(c.getOrElse(0L) + n))
    }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCounts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        val next = mutable.HashMap.empty[Vector[String], Long]
        words.foreach { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2
            } else { out += syms(i); i += 1 }
          }
          val ns = out.result()
          if (ns.length > 1) next.updateWith(ns)(c => Some(c.getOrElse(0L) + f))
        }
        words = next
        if (words.isEmpty) done = true
      }
      round += 1
    }
    merges.result()
  }

  /**
   * Learn a codec from the WHOLE corpus — the 100 TB trainer shape:
   * the only full-data pass is ONE map-side-combining (pre-token word
   * form → count) aggregate (the codegen'd `regexp_extract_all` split,
   * no UDF), the driver collects at most `maxWordForms` histogram rows
   * (top by count, word tiebreak — a deterministic truncation of the
   * Zipf tail, whose pair mass is negligible by construction), and the
   * merge loop runs on that vocab-sized state. Contrast
   * [[learnFromCorpus]], which trains on the first `sampleDocs`
   * documents: sampling skews counts toward whatever the sample saw;
   * the histogram path weighs every occurrence in the corpus.
   */
  def learnDistributed(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      numMerges: Int,
      maxWordForms: Int = 1 << 20): BpeCodec = {
    import org.apache.spark.sql.functions._
    val hist = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(TextFunctions.BpeTokenRe), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWordForms)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    new BpeCodec(learnFromHistogram(hist, numMerges))
  }

  /** Learn a codec from the first `sampleDocs` rows by `idCol` -- a
   * bounded, deterministic driver collect (the IVF trainSample shape). */
  def learnFromCorpus(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int,
      sampleDocs: Int = 1000): BpeCodec = {
    val sample = docs.orderBy(idCol).limit(sampleDocs)
      .select(textCol).collect().map(_.getString(0)).toSeq
    new BpeCodec(learn(sample, numMerges))
  }

  /** Learned-BPE token count column (codegen'd, map-only). */
  def tokenCount(text: Column, codec: BpeCodec): Column =
    Shim.column(BpeTokenCount(Shim.expression(text), codec))

  /** Learned-BPE vocabulary-id encode column (codegen'd, map-only). */
  def encodeIdsCol(text: Column, codec: BpeCodec): Column =
    Shim.column(BpeEncodeIds(Shim.expression(text), codec))
}

/**
 * The shipped merge model: rank table + per-executor memo cache.
 * Serializable so `addReferenceObj` can embed it in a codegen'd plan;
 * the cache is transient (rebuilt empty per executor) and bounded.
 */
class BpeCodec(val merges: Vector[(String, String)]) extends Serializable {

  // Rank-key separator: NUL can't appear inside a merge symbol built
  // from matched text, unlike a space (BPE symbols may contain spaces).
  private val Sep = "\u0000"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + Sep + b, i) }
    m
  }

  // Zipfian corpora hit the same pre-tokens constantly; memoize counts.
  // Bounded: cleared when it outgrows the cap (deterministic output
  // regardless -- the cache only skips recomputation).
  @transient private lazy val memo = new java.util.concurrent.ConcurrentHashMap[String, Integer]
  private val MemoCap = 65536

  /** GPT-2-style merge loop over one pre-token; returns symbol count. */
  private[functions] def encodeCount(word: String): Int = {
    var syms = word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    if (syms.length < 2) return syms.length
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + Sep + syms(i + 1))
        if (r != null && r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val (a, b) = merges(bestRank)
        val merged = a + b
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += merged; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
    }
    syms.length
  }

  /** Full-text learned-BPE token count (pre-tokenize, then merge). */
  def countTokens(text: UTF8String): Int = {
    if (text == null) return 0
    val m = Bpe.PreTokenRe.matcher(text.toString)
    var n = 0
    while (m.find()) {
      val w = m.group()
      var c = memo.get(w)
      if (c == null) {
        c = encodeCount(w)
        if (memo.size >= MemoCap) memo.clear()
        memo.put(w, c)
      }
      n += c
    }
    n
  }

  // Deterministic vocabulary ids without a stored vocab table: a final
  // symbol is either a single code point (id = the code point) or a
  // merge product (id = 0x110000 + FIRST merge rank producing that
  // string — above the Unicode range, so the two id spaces can't
  // collide; two merges CAN produce the same string, first wins).
  @transient private lazy val mergeIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val s = a + b
      if (!m.containsKey(s)) m.put(s, 0x110000 + i)
    }
    m
  }

  /** Vocabulary id of one final symbol (see [[mergeIds]] contract). */
  def symbolId(sym: String): Int = {
    val r = mergeIds.get(sym)
    if (r != null) r.intValue
    else sym.codePointAt(0)
  }

  /** Learned-BPE encode to vocabulary ids (the training-data shape). */
  def encodeIds(text: UTF8String): Array[Int] =
    if (text == null) Array.emptyIntArray
    else encode(text.toString).iterator.map(symbolId).toArray

  /** Reference segmentation (spec/debug surface): the actual subwords. */
  def encode(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    Bpe.preTokens(text).foreach { w =>
      var syms = w.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toVector
      var continue = true
      while (continue && syms.length > 1) {
        val ranked = syms.indices.dropRight(1)
          .flatMap { i =>
            val r = ranks.get(syms(i) + Sep + syms(i + 1))
            if (r == null) None else Some((r.intValue, i))
          }
        if (ranked.isEmpty) continue = false
        else {
          val bestRank = ranked.map(_._1).min
          val (a, b) = merges(bestRank)
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              nb += (a + b); j += 2
            } else { nb += syms(j); j += 1 }
          }
          syms = nb.result()
        }
      }
      out ++= syms
    }
    out.result()
  }
}

/** Learned-BPE token count of a string column -- codegen'd single
 * static-style call per row against the embedded [[BpeCodec]]. */
case class BpeTokenCount(child: Expression, codec: BpeCodec)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count_learned"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    codec.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, "graft.functions.BpeCodec")
    nullSafeCodeGen(ctx, ev, str => s"${ev.value} = $ref.countTokens($str);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Learned-BPE encode of a string column to vocabulary ids
 * (`array<int>`) — codegen'd single call per row against the embedded
 * [[BpeCodec]]; the id scheme is deterministic without a stored vocab
 * (single code point → the code point, merge product → 0x110000 +
 * first producing merge rank), so an independent driver-side
 * `codec.encodeIds` replay reproduces every id exactly. */
case class BpeEncodeIds(child: Expression, codec: BpeCodec)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      codec.encodeIds(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, "graft.functions.BpeCodec")
    nullSafeCodeGen(ctx, ev, str =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $ref.encodeIds($str));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}
