package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** C109 extraction contract, clause by clause — every expectation here
 * is hand-computed from the documented rules in [[HtmlExtract]]. */
class HtmlExtractSpec extends SparkSpec {

  import spark.implicits._

  private def extract(html: String): Row =
    Seq(html).toDF("h").select(HtmlExtract(col("h")).as("e"))
      .select("e.*").head()

  private def fullText(html: String): String = extract(html).getString(0)
  private def mainText(html: String): String = extract(html).getString(1)

  test("block tags break lines, inline tags vanish, whitespace collapses") {
    val h = "<html><body><h1>Title  here</h1><p>one <b>two</b>\n three</p>" +
      "<div>four</div>tail</body></html>"
    assert(fullText(h) == "Title here\none two three\nfour\ntail")
  }

  test("head, script, style, and comments are dropped — including fake tags inside") {
    val h = "<html><head><title>NOT this</title><meta x=1></head><body>" +
      "<script>var s = \"<p>fake</p>\";</script>" +
      "<style>.a > p { color: red; }</style>" +
      "<!-- comment with <p>fake</p> -->" +
      "<p>real</p></body></html>"
    assert(fullText(h) == "real")
  }

  test("script end-tag match is case-insensitive and quote-blind") {
    val h = "<body><SCRIPT>if (a<b) { x = '</div>'; }</SCRIPT><p>kept</p>" +
      "<script>unterminated... <p>gone</p>"
    assert(fullText(h) == "kept")
  }

  test("literal '<' that opens no tag stays text; unclosed tag at EOF is consumed") {
    assert(fullText("<p>3 < 5 and 2 <= 4</p>") == "3 < 5 and 2 <= 4")
    assert(fullText("<p>hi<div") == "hi")
  }

  test("attributes with '>' inside quotes do not end the tag") {
    val h = """<p><a href="/x?a>b" title='1>2'>link</a> text</p>"""
    assert(fullText(h) == "link text")
  }

  test("entities: named, numeric dec/hex, nbsp->space, unknown stays literal") {
    val h = "<p>&amp;&lt;&gt;&quot;&apos; A&nbsp;B &#65;&#x42; &bogus; &#; &#xZZ;</p>"
    assert(fullText(h) == "&<>\"' A B AB &bogus; &#; &#xZZ;")
  }

  test("br/hr split blocks; mis-nested close pops through") {
    assert(fullText("<p>a<br>b<hr>c</p>") == "a\nb\nc")
    // text after the premature </div> labels as the div's PARENT
    val e = extract("<body><div>a<p>b</div>c</body>")
    val blocks = e.getSeq[Row](5)
    assert(blocks.map(b => (b.getString(0), b.getString(1))) ==
      Seq(("div", "a"), ("p", "b"), ("body", "c")))
  }

  test("anchor chars count text inside <a>, including a collapsed space between anchors") {
    val e = extract("<body><nav><a href='/'>Home</a> <a href='/a'>About &amp; more</a></nav></body>")
    val blocks = e.getSeq[Row](5)
    assert(blocks.size == 1)
    val b = blocks.head
    assert(b.getString(0) == "nav" && b.getString(1) == "Home About & more")
    assert(b.getInt(2) == 17 && b.getInt(3) == 17) // fully anchored
    assert(!b.getBoolean(4))                       // dropped: tag + density
  }

  test("boilerplate gate: structural tags and link-dense blocks drop from main_text") {
    val h = "<body><header>Site name</header><p>the body of the text is here</p>" +
      "<div><a href='/'>mostly</a><a href='/'>links</a>!</div>" +
      "<aside>related</aside><footer>(c) 2026</footer></body>"
    // div: chars = "mostlylinks!".length = 12, anchor = 11 -> 22 > 12 dropped
    assert(mainText(h) == "the body of the text is here")
    assert(fullText(h) ==
      "Site name\nthe body of the text is here\nmostlylinks!\nrelated\n(c) 2026")
  }

  test("half-anchored block survives the density gate at exactly 2*anchor == chars") {
    // "links is a" -> chars 10, anchor 5 (10 <= 10, boundary inclusive)
    // and 2 stopwords in 3 tokens passes the stopword floor
    val e = extract("<body><p><a href='/'>links</a> is a</p></body>")
    val b = e.getSeq[Row](5).head
    assert(b.getInt(2) == 10 && b.getInt(3) == 5 && b.getBoolean(4))
  }

  test("stopword-density gate: short stopword-poor blocks are boilerplate") {
    // menu / heading / copyright shapes: short, zero stopwords -> drop
    val h = "<body><h1>Site News</h1><p>Home Products About Contact</p>" +
      "<p>Copyright 2026 Example Corp All Rights Reserved</p>" +
      "<p>the cat sat</p></body>"
    assert(mainText(h) == "the cat sat") // 1 stopword in 3 tokens passes
    // full text keeps everything — the gate only affects main_text
    assert(fullText(h).count(_ == '\n') == 3)
  }

  test("context pass: a short stopword-bearing block survives next to good content") {
    val good = "the long body paragraph is full of the words a reader wants to see"
    // "the quick brown fox jumps over that lazy dog again now" — 11
    // tokens, 1 stopword (8 < 11) → SHORT; rescued by the good neighbor
    val short = "the quick brown fox jumps over that lazy dog again now"
    assert(mainText(s"<p>$good</p><p>$short</p>") == s"$good\n$short")
    assert(mainText(s"<p>$short</p><p>$good</p>") == s"$good\n$short"
      .split("\n").reverse.mkString("\n"))
    // the SAME short block with only bad neighbors stays boilerplate
    assert(mainText(s"<nav>Home About</nav><p>$short</p><footer>x</footer>") == "")
    // and alone in the document it stays boilerplate too
    assert(mainText(s"<p>$short</p>") == "")
  }

  test("context pass: zero-stopword shorts are BAD — no rescue; shorts chain through shorts") {
    val good = "the long body paragraph is full of the words a reader wants to see"
    // menu has 0 stopwords → BAD even beside good content
    assert(mainText(s"<p>$good</p><p>Home Products Contact</p>") == good)
    // two chained SHORT blocks both rescue off the same good neighbor
    val s1 = "the quick brown fox jumps over that lazy dog again now"
    val s2 = "is red pear plum kiwi fig date lime peach grape melon"
    assert(mainText(s"<p>$good</p><p>$s1</p><p>$s2</p>") ==
      s"$good\n$s1\n$s2")
  }

  test("stopword-density gate: >= 70 chars skips the test; 1-in-8 boundary; case-blind") {
    val long = "zzzz " * 14 + "zzzz" // 74 chars, zero stopwords
    assert(mainText(s"<p>$long</p>") == long)
    assert(mainText("<p>The CAT sat</p>") == "The CAT sat") // 'The' counts
    assert(mainText("<p>the q w e r t y u</p>") == "the q w e r t y u") // 8*1 >= 8
    assert(mainText("<p>the q w e r t y u i</p>") == "")                // 8*1 < 9
  }

  test("totals roll up across blocks; empty and null inputs behave") {
    val e = extract("<body><p>ab</p><p><a href='/'>cd</a></p></body>")
    assert(e.getInt(2) == 2)   // n_blocks
    assert(e.getLong(3) == 4L) // total_chars
    assert(e.getLong(4) == 2L) // anchor_chars
    assert(fullText("") == "" && extract("").getInt(2) == 0)
    val nullRow = Seq[Option[String]](None).toDF("h")
      .select(HtmlExtract(col("h")).as("e")).head()
    assert(nullRow.isNullAt(0))
  }

  test("links: href values in document order — quoted, unquoted, entity-decoded, self-closed") {
    val h = """<body><a href="/a?x=1&amp;y=2">one</a><a href='/b'>two</a>""" +
      """<a href = /c >three</a><a class="x" href="/d"/>""" +
      """<a name="no-href">four</a><A HREF="/E">five</A></body>"""
    val links = extract(h).getSeq[String](6)
    assert(links == Seq("/a?x=1&y=2", "/b", "/c", "/d", "/E"))
    // href inside script/comment never surfaces; empty doc → empty list
    assert(extract("<script>var a='<a href=/no>';</script><!--<a href=/no2>-->")
      .getSeq[String](6).isEmpty)
    assert(extract("").getSeq[String](6).isEmpty)
  }

  test("'href=' inside another quoted attribute value is not a link (r14 advice)") {
    val h = """<body><a title="see href=/bogus here" href="/real">x</a>""" +
      """<a data-note='href="/bogus2"'>no link attr</a>""" +
      """<a title='q' href=/unq>y</a></body>"""
    assert(extract(h).getSeq[String](6) == Seq("/real", "/unq"))
  }

  test("per-language stopword gate: a non-English body survives under its language, dies under the default") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // < 70 chars, rich in GERMAN function words, zero English ones —
    // the r15 stretch item: jusText keys its lists by language
    val h = "<body><nav><a href='/'>Home</a></nav>" +
      "<p>der kleine zug und das alte haus</p></body>"
    val de = HtmlExtract.compute(u(h), u("de")).getUTF8String(1).toString
    assert(de == "der kleine zug und das alte haus", s"de gate: '$de'")
    val en = HtmlExtract.compute(u(h), u("en")).getUTF8String(1).toString
    assert(en == "", s"en gate must drop it: '$en'")
    // unknown code falls back to English (historical behavior)
    val xx = HtmlExtract.compute(u(h), u("xx")).getUTF8String(1).toString
    assert(xx == "")
    // null lang at the Column surface = English default
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val viaCol = Seq((h, null: String)).toDF("h", "l")
      .select(HtmlExtract(col("h"), col("l")).getField("main_text"))
      .head().getString(0)
    assert(viaCol == "")
    // zh list works on whitespace-tokenized CJK
    val hz = "<body><p>的 火车 和 房子 是 大 的</p></body>"
    assert(HtmlExtract.compute(u(hz), u("zh"))
      .getUTF8String(1).toString == "的 火车 和 房子 是 大 的")
  }

  test("codegen and interpreted agree (strict codegen, no fallback)") {
    val h = "<body><nav><a href='/'>x</a></nav><p>body &amp; soul</p></body>"
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val viaDf = fullText(h)
      val interp = HtmlExtract.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(h),
        org.apache.spark.unsafe.types.UTF8String.fromString("en"))
        .getUTF8String(0).toString
      assert(viaDf == interp && viaDf == "x\nbody & soul")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
