package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C83: URL canonicalization (functions/UrlCanon.scala). */
class UrlCanonSpec extends SparkSpec {

  import spark.implicits._

  private def canon(s: String): String =
    UrlCanon.canonical(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  test("case, default port, fragment, tracking params and param order all normalize") {
    assert(canon("HTTP://Site.Example/Path?b=2&a=1&utm_source=x") ==
      "http://site.example/Path?a=1&b=2")
    assert(canon("http://site.example:80/Path?a=1&b=2") ==
      "http://site.example/Path?a=1&b=2")
    assert(canon("https://CDN.example/img#frag") == "https://cdn.example/img")
    assert(canon("https://cdn.example:443/img?gclid=abc") == "https://cdn.example/img")
  }

  test("edge cases: non-URL text, bare tracking names, non-default ports, empty query") {
    assert(canon("not a url at all") == "not a url at all")
    assert(canon("relative/path?x=1#f") == "relative/path?x=1") // no scheme: only the fragment is cut
    assert(canon("http://h.example/p?fbclid") == "http://h.example/p")
    assert(canon("http://h.example/p?") == "http://h.example/p")
    assert(canon("https://h.example:8443/p") == "https://h.example:8443/p") // non-default port kept
    assert(canon("http://h.example:443/p") == "http://h.example:443/p")    // 443 is NOT http's default
    assert(canon("HTTP://H.Example") == "http://h.example")                 // authority-only
    assert(canon("http://h.example?b=1&a=2") == "http://h.example?a=2&b=1") // query, no path
    assert(canon("http://h.example/p?utm_campaign=c&utm_") == "http://h.example/p")
  }

  test("IPv6 bracket literals keep their final hextet; bracketed real ports still strip") {
    assert(canon("http://[::80]/p") == "http://[::80]/p")
    assert(canon("https://[fe80::443]/x") == "https://[fe80::443]/x")
    assert(canon("http://[2001:db8::1]:80/p") == "http://[2001:db8::1]/p")
    assert(canon("https://[2001:db8::1]:443/p") == "https://[2001:db8::1]/p")
  }

  test("percent triplets uppercase in path and query; invalid triplets stay data") {
    assert(canon("http://h.example/a%2fb") == "http://h.example/a%2Fb")
    assert(canon("http://h.example/a%2Fb") == "http://h.example/a%2Fb")
    assert(canon("http://h.example/p?x=%e9&y=1") == "http://h.example/p?x=%E9&y=1")
    // normalization happens BEFORE the param sort: %2f and %2F keys
    // must land on the same canonical byte order
    assert(canon("http://h.example/p?%2f=1&b=2") == canon("http://h.example/p?b=2&%2F=1"))
    // '%' not followed by two hex digits is not an encoding
    assert(canon("http://h.example/50%25off") == "http://h.example/50%25off")
    assert(canon("http://h.example/a%2gb") == "http://h.example/a%2gb")
    assert(canon("http://h.example/a%f") == "http://h.example/a%f")
    assert(canon("http://h.example/a%") == "http://h.example/a%")
    // the authority is case-folded wholesale (documented: more
    // aggressive than RFC 3986), so its triplets fold DOWN
    assert(canon("http://h%2Fx.example/p") == "http://h%2fx.example/p")
  }

  test("param sort is UTF-8 byte order (surrogates after U+E000..FFFF, matching binary list_sort)") {
    // U+1F600 (surrogate pair in UTF-16, 4 bytes F0 9F 98 80 in UTF-8)
    // vs U+FFFD (EF BF BD): byte order puts FFFD FIRST; Java
    // String.compareTo would order the surrogate pair first instead
    val emoji = new String(Character.toChars(0x1F600))
    val out = canon(s"http://h.example/p?$emoji=1&�=2")
    assert(out == s"http://h.example/p?�=2&$emoji=1")
  }

  test("column + SQL surfaces agree with the helper") {
    graft.sql.GraftSql.register(spark)
    val raw = "HTTP://Site.Example:80/P?b=2&a=1&fbclid=z#top"
    val viaCol = Seq(raw).toDF("u").select(CanonicalUrl($"u")).head.getString(0)
    val viaSql = spark.sql(s"SELECT canonical_url('$raw')").head.getString(0)
    assert(viaCol == "http://site.example/P?a=1&b=2")
    assert(viaSql == viaCol)
  }
}
