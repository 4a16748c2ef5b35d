package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * C109: HTML → text extraction + boilerplate removal — the front door
 * of every crawl-derived training corpus (the CCNet/RefinedWeb/Dolma
 * "step zero" that turns WARC payloads into the `text` column all the
 * C-tier operators consume). One single-pass parser per row, codegen
 * as one static call (the [[WordShingles]] escalation pattern — no
 * interpreted lambda, no Generate, no shuffle): map-only at any
 * corpus size, which is the only acceptable shape for a step that
 * touches 100 TB of raw HTML bytes.
 *
 * The reference engine has no HTML surface (it parses access logs;
 * DuckDB itself has none either) — this operator exists for the
 * LLM-pipeline tier, with an analytically-replayable contract (the
 * Multimodal withSynthetic* discipline) so a SQL oracle can derive
 * the expected extraction without replaying the parser.
 *
 * Extraction contract (all of it is the contract — specs pin each
 * clause):
 *  - `<head>…</head>` content is dropped whole (raw scan to the
 *    case-insensitive `</head`; unterminated head drops the rest).
 *  - `<script>`/`<style>` content is dropped (raw scan to the
 *    case-insensitive `</script`/`</style` — fake tags inside, e.g.
 *    string literals, never surface). Self-closing forms skip no
 *    content.
 *  - `<!--…-->` comments are dropped (unterminated → rest dropped);
 *    other `<!…>`/`<?…>` declarations are dropped to the next `>`.
 *  - BLOCK tags (p, div, h1–h6, ul/ol/li, table/thead/tbody/tr/td/th,
 *    nav, header, footer, section, article, aside, main, blockquote,
 *    pre, form, figure, figcaption, dl/dt/dd, html, body, title —
 *    plus void br/hr) terminate the current text block on BOTH open
 *    and close; inline tags (a, b, span, …) contribute nothing.
 *  - Text nodes are entity-decoded: named amp/lt/gt/quot/apos/nbsp
 *    (nbsp → a REGULAR space, so it participates in collapsing) and
 *    numeric `&#NNN;` / `&#xHH;`; anything else stays literal. A `<`
 *    not opening a tag/comment/declaration is literal text.
 *  - Whitespace runs collapse to one space; blocks are trimmed;
 *    empty blocks vanish; surviving blocks join with `\n`.
 *  - Each block is labeled with the nearest enclosing block tag
 *    (stack-tracked; mis-nested closes pop through — the label of
 *    text AFTER `<div>a<p>b</div>` is the div's parent). Characters
 *    emitted while inside `<a>…</a>` count as `anchor_chars`.
 *  - Boilerplate gate (jusText-class structural + link-density +
 *    stopword-density + context): blocks classify three ways —
 *    BAD if the label ∈ {nav, header, footer, aside, form}, or
 *    2·anchor_chars > chars, or under 70 chars with ZERO stopword
 *    tokens (menus / headings / copyright lines — no context can
 *    rescue them); GOOD if ≥ 70 chars or 8·stopword_tokens ≥ tokens
 *    (tokens = single-space split of the collapsed text; stopwords =
 *    the C9/C20 seven-word English set {the, a, and, is, of, to, in},
 *    case-insensitive — ~20% of typical English tokens, so the 1-in-8
 *    floor passes prose; jusText's 0.3 uses a full ~170-word list);
 *    SHORT otherwise (under 70 chars, ≥ 1 stopword, low density).
 *    The context pass (jusText's block-class propagation, simplified
 *    deterministic rule): a SHORT block is KEPT iff its nearest
 *    non-SHORT neighbor on EITHER side is GOOD — a short sentence
 *    between body paragraphs survives, the same sentence inside
 *    chrome does not. kept = GOOD or context-rescued SHORT;
 *    `main_text` joins kept blocks.
 *
 * Returns ONE struct per document so a single parse feeds every
 * consumer:
 *   struct(text, main_text, n_blocks, total_chars, anchor_chars,
 *          blocks: array<struct<tag, text, chars, anchor_chars,
 *                               kept>>,
 *          links: array<string>)
 *
 * `links` collects each `<a>` tag's href value in document order
 * (quoted or unquoted, entity-decoded — an `&amp;` in a URL decodes
 * to `&` per HTML), the input to link-graph operators (C113 → C21
 * URL analytics / C57 PageRank): the crawl frontier IS the href
 * stream of fetched pages.
 */
case class HtmlExtract(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = HtmlExtract.schema
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "html_extract"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string html, string lang), got $other")
    }

  override protected def nullSafeEval(html: Any, lang: Any): Any =
    HtmlExtract.compute(html.asInstanceOf[UTF8String],
      lang.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (html, lang) =>
      s"${ev.value} = graft.functions.HtmlExtract.compute($html, $lang);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HtmlExtract =
    copy(left = newLeft, right = newRight)
}

object HtmlExtract {

  def apply(html: Column): Column = apply(html, lit("en"))

  /** Language-keyed gate (r15 stretch item): the stopword set used by
   * the boilerplate density test is selected PER ROW by `lang` (the
   * C9/C104 language decision) — unknown/NULL codes fall back to
   * English, so the one-argument form is the historical behavior
   * exactly. */
  def apply(html: Column, lang: Column): Column =
    Shim.column(HtmlExtract(Shim.expression(html),
      Shim.expression(coalesce(lang, lit("en")))))

  val blockSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("chars", IntegerType, nullable = false),
    StructField("anchor_chars", IntegerType, nullable = false),
    StructField("kept", BooleanType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("main_text", StringType, nullable = false),
    StructField("n_blocks", IntegerType, nullable = false),
    StructField("total_chars", LongType, nullable = false),
    StructField("anchor_chars", LongType, nullable = false),
    StructField("blocks", ArrayType(blockSchema, containsNull = false),
      nullable = false),
    StructField("links", ArrayType(StringType, containsNull = false),
      nullable = false)))

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "body", "title", "p", "div", "h1", "h2", "h3", "h4", "h5",
      "h6", "ul", "ol", "li", "table", "thead", "tbody", "tr", "td", "th",
      "nav", "header", "footer", "section", "article", "aside", "main",
      "blockquote", "pre", "form", "figure", "figcaption", "dl", "dt", "dd")
      .foreach(s.add)
    s
  }

  private val VoidBreaks = Set("br", "hr")

  private val DropTags = Set("nav", "header", "footer", "aside", "form")

  /** Blocks at least this long skip the stopword-density test. */
  private val LongBlockChars = 70

  /** Per-language stopword sets for the density gate (jusText ships
   * per-language lists; these are compact ≤3-char function-word sets
   * with the same ~1-in-8 coverage the gate's threshold is tuned
   * for). English stays the C9/C20 seven-word list (TextFunctions
   * .stopwordCount's exact list — oracle-replayable as a regex);
   * unknown/NULL codes fall back to it. The ≤3-char bound is a
   * CONTRACT here: [[stopwordStats]] skips the set probe for longer
   * tokens. */
  private val StopwordSets: java.util.HashMap[String, java.util.HashSet[String]] = {
    val m = new java.util.HashMap[String, java.util.HashSet[String]]()
    def add(code: String, ws: Seq[String]): Unit = {
      val s = new java.util.HashSet[String]()
      ws.foreach { w =>
        require(w.length <= 3, s"stopword '$w' breaks the <=3-char probe skip")
        s.add(w)
      }
      m.put(code, s)
    }
    add("en", Seq("the", "a", "and", "is", "of", "to", "in"))
    add("de", Seq("der", "die", "das", "und", "ist", "zu", "in"))
    add("fr", Seq("le", "la", "et", "les", "de", "un", "est"))
    add("es", Seq("el", "la", "de", "y", "que", "en", "es"))
    add("zh", Seq("的", "了", "是", "和", "在", "有", "我"))
    m
  }

  private val EnglishStopwords = StopwordSets.get("en")

  private[functions] def stopwordsFor(lang: UTF8String): java.util.HashSet[String] = {
    if (lang == null) return EnglishStopwords
    val s = StopwordSets.get(lang.toString.toLowerCase(java.util.Locale.ROOT))
    if (s == null) EnglishStopwords else s
  }

  private val ClsBad = 0
  private val ClsShort = 1
  private val ClsGood = 2

  /** (stopword tokens, tokens) over the collapsed block text. All
   * stopwords are ≤ 3 chars (registry contract), so longer tokens
   * skip the set probe. */
  private def stopwordStats(
      text: String, stops: java.util.HashSet[String]): (Int, Int) = {
    var words = 0
    var sw = 0
    var i = 0
    val n = text.length
    while (i < n) {
      var j = i
      while (j < n && text.charAt(j) != ' ') j += 1
      if (j > i) {
        words += 1
        if (j - i <= 3 && stops.contains(
            text.substring(i, j).toLowerCase(java.util.Locale.ROOT))) sw += 1
      }
      i = j + 1
    }
    (sw, words)
  }

  private final class Block(val tag: String, val text: String, val anchor: Int,
      stops: java.util.HashSet[String]) {
    val cls: Int = {
      val structural =
        !DropTags.contains(tag) && 2L * anchor <= text.length.toLong
      if (!structural) ClsBad
      else if (text.length >= LongBlockChars) ClsGood
      else {
        val (sw, words) = stopwordStats(text, stops)
        if (sw == 0) ClsBad
        else if (8 * sw >= words) ClsGood
        else ClsShort
      }
    }
    // resolved by the context pass after all blocks exist
    var kept: Boolean = cls == ClsGood
  }

  /** jusText context pass: a SHORT block is kept iff its nearest
   * non-SHORT neighbor on either side is GOOD. One linear sweep each
   * way carrying the last non-SHORT class seen. */
  private def resolveContext(
      blocks: scala.collection.mutable.ArrayBuffer[Block]): Unit = {
    val n = blocks.length
    var prev = ClsBad
    val prevGood = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      prevGood(i) = prev == ClsGood
      if (blocks(i).cls != ClsShort) prev = blocks(i).cls
      i += 1
    }
    var next = ClsBad
    i = n - 1
    while (i >= 0) {
      val b = blocks(i)
      if (b.cls == ClsShort) b.kept = prevGood(i) || next == ClsGood
      else next = b.cls
      i -= 1
    }
  }

  /** Case-insensitive scan for `"</" + name` starting at `from`;
   * returns the index AFTER the closing '>' of that end tag (or
   * `html.length` if absent — unterminated raw content drops the
   * rest, by contract). */
  private def skipRawContent(html: String, from: Int, name: String): Int = {
    val n = html.length
    var i = from
    val target = "</" + name
    val tl = target.length
    while (i + tl <= n) {
      if (html.regionMatches(true, i, target, 0, tl)) {
        var j = i + tl
        while (j < n && html.charAt(j) != '>') j += 1
        return if (j < n) j + 1 else n
      }
      i += 1
    }
    n
  }

  /** Parses one document; shared by interpreted eval and codegen. */
  def compute(html: UTF8String, lang: UTF8String): GenericInternalRow = {
    val stops = stopwordsFor(lang)
    val s = html.toString
    val n = s.length
    val blocks = new scala.collection.mutable.ArrayBuffer[Block]()
    val links = new scala.collection.mutable.ArrayBuffer[String]()
    val stack = new java.util.ArrayDeque[String]()
    val sb = new java.lang.StringBuilder()
    var blockAnchor = 0
    var anchorDepth = 0
    var pendingSpace = false

    def label: String = {
      val t = stack.peek()
      if (t == null) "body" else t
    }

    def flush(): Unit = {
      if (sb.length > 0) {
        blocks += new Block(label, sb.toString, blockAnchor, stops)
        sb.setLength(0)
      }
      blockAnchor = 0
      pendingSpace = false
    }

    def emit(cp: Int): Unit = {
      if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
          cp == '\f' || cp == 0x0b || Character.isWhitespace(cp)) {
        pendingSpace = true
      } else {
        if (pendingSpace && sb.length > 0) {
          sb.append(' ')
          if (anchorDepth > 0) blockAnchor += 1
        }
        pendingSpace = false
        val before = sb.length
        sb.appendCodePoint(cp)
        if (anchorDepth > 0) blockAnchor += sb.length - before
      }
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '!' || c1 == '?') {
          if (s.regionMatches(false, i, "<!--", 0, 4)) {
            val end = s.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = s.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '/' && i + 2 < n && isNameStart(s.charAt(i + 2))) {
          // closing tag
          var j = i + 2
          val t0 = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = s.substring(t0, j).toLowerCase(java.util.Locale.ROOT)
          while (j < n && s.charAt(j) != '>') j += 1
          i = if (j < n) j + 1 else n
          if (BlockTags.contains(name)) {
            flush()
            // pop through mis-nested opens until `name` comes off
            var done = false
            while (!done && !stack.isEmpty) {
              val top = stack.pop()
              if (top == name) done = true
            }
          } else if (name == "a" && anchorDepth > 0) {
            anchorDepth -= 1
          }
        } else if (isNameStart(c1)) {
          // opening tag: read name, then attributes respecting quotes
          var j = i + 1
          val t0 = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          val name = s.substring(t0, j).toLowerCase(java.util.Locale.ROOT)
          val attrStart = j
          var selfClosed = false
          var quote = 0
          var closed = false
          while (j < n && !closed) {
            val cj = s.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '"' || cj == '\'') quote = cj
            else if (cj == '>') {
              selfClosed = j > 0 && s.charAt(j - 1) == '/'
              closed = true
            }
            j += 1
          }
          val attrEnd = if (closed) j - 1 else n
          i = j
          if (name == "head" && !selfClosed) {
            flush()
            i = skipRawContent(s, i, "head")
          } else if ((name == "script" || name == "style") && !selfClosed) {
            i = skipRawContent(s, i, name)
          } else if (VoidBreaks.contains(name)) {
            flush()
          } else if (BlockTags.contains(name)) {
            flush()
            if (!selfClosed) stack.push(name)
          } else if (name == "a") {
            val href = hrefOf(s, attrStart, attrEnd)
            if (href != null) links += href
            if (!selfClosed) anchorDepth += 1
          }
        } else {
          emit('<')
          i += 1
        }
      } else if (c == '&') {
        val (cp, next) = decodeEntity(s, i)
        if (cp >= 0) { emit(cp); i = next }
        else { emit('&'); i += 1 }
      } else {
        val cp = s.codePointAt(i)
        emit(cp)
        i += Character.charCount(cp)
      }
    }
    flush()
    resolveContext(blocks)

    val full = new java.lang.StringBuilder()
    val mainT = new java.lang.StringBuilder()
    var totalChars = 0L
    var anchorChars = 0L
    val rows = new Array[Any](blocks.length)
    var bi = 0
    while (bi < blocks.length) {
      val b = blocks(bi)
      if (full.length > 0) full.append('\n')
      full.append(b.text)
      if (b.kept) {
        if (mainT.length > 0) mainT.append('\n')
        mainT.append(b.text)
      }
      totalChars += b.text.length
      anchorChars += b.anchor
      rows(bi) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(b.tag), UTF8String.fromString(b.text),
        b.text.length, b.anchor, b.kept))
      bi += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(full.toString),
      UTF8String.fromString(mainT.toString),
      blocks.length, totalChars, anchorChars,
      new GenericArrayData(rows),
      new GenericArrayData(
        links.map(UTF8String.fromString(_): Any).toArray)))
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** First href attribute value in `s[from, until)` — quoted (either
   * quote) or unquoted-to-whitespace, entity-decoded; null if none.
   * Quoted values of OTHER attributes are skipped wholesale, so
   * literal `href=` text inside e.g. a title="see href=x" value never
   * reads as the link (r14 advice). */
  private def hrefOf(s: String, from: Int, until: Int): String = {
    var k = from
    while (k < until) {
      val ck = s.charAt(k)
      if (ck == '"' || ck == '\'') {
        // a quoted attribute value we did not open via href= — skip it
        val e = s.indexOf(ck, k + 1)
        k = if (e < 0 || e >= until) until else e + 1
      } else
      if ((k == from || isWs(s.charAt(k - 1)) ||
            s.charAt(k - 1) == '"' || s.charAt(k - 1) == '\'') &&
          s.regionMatches(true, k, "href", 0, 4)) {
        var m = k + 4
        while (m < until && isWs(s.charAt(m))) m += 1
        if (m < until && s.charAt(m) == '=') {
          m += 1
          while (m < until && isWs(s.charAt(m))) m += 1
          if (m < until) {
            val q = s.charAt(m)
            if (q == '"' || q == '\'') {
              val e = s.indexOf(q, m + 1)
              val stop = if (e < 0 || e > until) until else e
              return decodeAll(s.substring(m + 1, stop))
            } else {
              var e = m
              while (e < until && !isWs(s.charAt(e))) e += 1
              return decodeAll(s.substring(m, e))
            }
          }
        }
      }
      k += 1
    }
    null
  }

  /** Entity-decodes a plain attribute value (same entity set as text
   * nodes — an `&amp;` inside a URL decodes to `&` per HTML). */
  private def decodeAll(v: String): String = {
    if (v.indexOf('&') < 0) return v
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '&') {
        val (cp, next) = decodeEntity(v, i)
        if (cp >= 0) { sb.appendCodePoint(cp); i = next }
        else { sb.append('&'); i += 1 }
      } else { sb.append(v.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9')

  /** Returns (codepoint, indexAfterEntity) or (-1, _) when `s(at)`
   * does not start a recognized entity — the '&' stays literal. */
  private def decodeEntity(s: String, at: Int): (Int, Int) = {
    val n = s.length
    var j = at + 1
    if (j < n && s.charAt(j) == '#') {
      j += 1
      var radix = 10
      if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) { radix = 16; j += 1 }
      val d0 = j
      var v = 0L
      while (j < n && Character.digit(s.charAt(j), radix) >= 0 && j - d0 < 8) {
        v = v * radix + Character.digit(s.charAt(j), radix)
        j += 1
      }
      if (j > d0 && j < n && s.charAt(j) == ';' && v > 0 && v <= 0x10ffff &&
          !(v >= 0xd800 && v <= 0xdfff))
        (v.toInt, j + 1)
      else (-1, at)
    } else {
      val named = Seq(("amp;", '&'), ("lt;", '<'), ("gt;", '>'),
        ("quot;", '"'), ("apos;", '\''), ("nbsp;", ' '))
      named.collectFirst {
        case (ent, ch) if s.regionMatches(false, j, ent, 0, ent.length) =>
          (ch.toInt, j + ent.length)
      }.getOrElse((-1, at))
    }
  }
}
