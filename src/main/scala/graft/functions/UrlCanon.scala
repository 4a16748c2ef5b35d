package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * C83: URL canonicalization — the normalization rung of crawl dedup:
 * the same page arrives as `HTTP://Site.Example/p?b=2&a=1&utm_source=x`,
 * `http://site.example:80/p?a=1&b=2`, and `http://site.example/p?a=1&b=2#top`,
 * and exact dedup (C1) sees three distinct documents unless the URL
 * key is canonicalized first. The rule set is a conservative SUBSET of
 * RFC 3986 §6 plus tracking-param stripping — implemented: scheme/host
 * case-folding (§6.2.2.1), percent-triplet hex uppercasing in path and
 * query (§6.2.2.1), default-port and fragment removal, param sort.
 * Deliberately NOT implemented: dot-segment removal (§6.2.2.3 — a
 * crawler should resolve relative refs before keying) and
 * scheme-relative `//host/p` inputs (returned unchanged: not absolute
 * URLs). Each step is chosen to be replayable with SQL string
 * primitives:
 *
 *   1. cut the fragment (first `#` onward);
 *   2. no `://` → return the input unchanged (not an absolute URL);
 *   3. lowercase the scheme (Locale.ROOT — a tr-TR default locale
 *      would turn I into dotless ı and break the contract);
 *   4. authority = up to the first `/` or `?`; lowercase it WHOLE —
 *      deliberately more aggressive than RFC 3986 §6.2.2.1, which
 *      keeps userinfo case-sensitive (URLs carrying credentials make
 *      poor dedup keys regardless); strip a default port (`:80` for
 *      http, `:443` for https) unless the authority is a bare
 *      bracketed IPv6 literal (`[::80]` ends in ":80" but has no
 *      port; `[2001:db8::1]:80` still strips);
 *   5. path is left byte-exact (case is significant in paths) EXCEPT
 *      valid percent triplets (`%` + two hex digits), whose hex is
 *      uppercased (`%2f` → `%2F`); a `%` not followed by two hex
 *      digits is left alone (it is not an encoding);
 *   6. query params (`&`-separated, first `?` onward): percent
 *      triplets uppercased as in the path (BEFORE the sort, so the
 *      order is over canonical bytes), then drop empties
 *      and tracking params (name starts with `utm_`, or name is
 *      `fbclid`/`gclid` — bare or `=`-valued), UTF-8 BYTE-sort the
 *      rest (UTF8String.compareTo, which is what DuckDB's binary
 *      list_sort collation does — Java String.compareTo would order
 *      surrogate pairs differently), rejoin; an emptied query drops
 *      its `?`.
 *
 * One codegen static call per row — no regex, no UDF; the oracle
 * replays the identical steps with strpos/substr/list_filter/
 * list_sort. Feed the result to C1/C14/C38 as the dedup or
 * partition key.
 */
object UrlCanon {

  private def tracking(p: String): Boolean =
    p.startsWith("utm_") || p == "fbclid" || p == "gclid" ||
      p.startsWith("fbclid=") || p.startsWith("gclid=")

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  // RFC 3986 §6.2.2.1: the hex of a VALID percent triplet is
  // case-insensitive — uppercase it so %2f and %2F collapse to one
  // dedup key. A '%' not followed by two hex digits is plain data.
  private def pctUpper(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        b.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  def canonical(u: UTF8String): UTF8String = {
    val raw = u.toString
    val hash = raw.indexOf('#')
    val s = if (hash >= 0) raw.substring(0, hash) else raw
    val sp = s.indexOf("://")
    if (sp < 0) return UTF8String.fromString(s)
    val scheme = s.substring(0, sp).toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(sp + 3)
    var cut = rest.length
    val slash = rest.indexOf('/')
    val qm = rest.indexOf('?')
    if (slash >= 0 && (qm < 0 || slash < qm)) cut = slash
    else if (qm >= 0) cut = qm
    var auth = rest.substring(0, cut).toLowerCase(java.util.Locale.ROOT)
    // "[::80]" is a bracketed IPv6 literal whose LAST HEXTET happens to
    // spell a default port — only strip when the suffix is a real port
    // (i.e. the authority does not end inside brackets)
    if (!auth.endsWith("]")) {
      if (scheme == "http" && auth.endsWith(":80")) auth = auth.dropRight(3)
      else if (scheme == "https" && auth.endsWith(":443")) auth = auth.dropRight(4)
    }
    val tail = rest.substring(cut)
    val tq = tail.indexOf('?')
    val path = pctUpper(if (tq >= 0) tail.substring(0, tq) else tail)
    val query = if (tq >= 0) tail.substring(tq + 1) else ""
    // UTF-8 byte order (UTF8String.compareTo), NOT String.compareTo:
    // UTF-16 code-unit order places surrogate pairs before U+E000..FFFF
    // while the oracle's binary list_sort does the opposite
    val params = query.split("&", -1).map(pctUpper)
      .filter(p => p.nonEmpty && !tracking(p))
      .sortWith((a, b) =>
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0)
    val canon = scheme + "://" + auth + path +
      (if (params.nonEmpty) "?" + params.mkString("&") else "")
    UTF8String.fromString(canon)
  }
}

case class CanonicalUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    UrlCanon.canonical(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UrlCanon.canonical($s)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
}

object CanonicalUrl {
  def apply(url: Column): Column =
    Shim.column(CanonicalUrl(Shim.expression(url)))
}
