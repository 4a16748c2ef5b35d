package graft.logs

/**
 * LogFormat → line-matching regex generation. One capturing group per
 * field; skipped non-%t fields become non-capturing groups so a single
 * regex execution yields every needed value
 * (reference: src/httpd_log_format_parser.cpp:536-648).
 */
object LogRegex {

  private val regexMeta = Set('.', '*', '+', '?', '^', '$', '(', ')', '{', '}', '|', '\\', '[', ']')

  private def escape(c: Char): String =
    if (regexMeta.contains(c)) "\\" + c else c.toString

  /** strftime format → regex fragment (reference: format_parser.cpp:104). */
  def strftimeToRegex(format: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < format.length) {
      if (format.charAt(i) == '%' && i + 1 < format.length) {
        val spec =
          if (format.charAt(i + 1) == '-' && i + 2 < format.length) { i += 3; format.substring(i - 3, i) }
          else { i += 2; format.substring(i - 2, i) }
        sb.append(spec match {
          case "%Y"        => "\\d{4}"
          case "%y"        => "\\d{2}"
          case "%m"        => "\\d{2}"
          case "%-m"       => "\\d{1,2}"
          case "%d"        => "\\d{2}"
          case "%-d"       => "\\d{1,2}"
          case "%e"        => "[\\s\\d]\\d"
          case "%b" | "%h" => "[A-Za-z]{3}"
          case "%B"        => "[A-Za-z]+"
          case "%H"        => "\\d{2}"
          case "%-H"       => "\\d{1,2}"
          case "%I"        => "\\d{2}"
          case "%-I"       => "\\d{1,2}"
          case "%M"        => "\\d{2}"
          case "%S"        => "\\d{2}"
          case "%f"        => "\\d{6}"
          case "%z"        => "[+-]\\d{4}"
          case "%Z"        => "[A-Za-z/_]+"
          case "%T"        => "\\d{2}:\\d{2}:\\d{2}"
          case "%R"        => "\\d{2}:\\d{2}"
          case "%j"        => "\\d{3}"
          case "%a"        => "[A-Za-z]{3}"
          case "%A"        => "[A-Za-z]+"
          case "%p" | "%P" => "[AaPp][Mm]"
          case "%n"        => "\\n"
          case "%t"        => "\\t"
          case "%%"        => "%"
          case _           => "\\S+"
        })
      } else {
        sb.append(escape(format.charAt(i)))
        i += 1
      }
    }
    sb.toString
  }

  /** Escape a literal format-string segment: whitespace runs match
   * `\\s+`, `%%` is a literal percent, quotes pass through. */
  private def literalPattern(seg: String, sb: StringBuilder): Unit = {
    var i = 0
    while (i < seg.length) {
      val c = seg.charAt(i)
      if (c == ' ' || c == '\t') {
        sb.append("\\s+")
        while (i < seg.length && (seg.charAt(i) == ' ' || seg.charAt(i) == '\t')) i += 1
      } else if (c == '%' && i + 1 < seg.length && seg.charAt(i + 1) == '%') {
        sb.append('%'); i += 2
      } else if (c == '"') { sb.append('"'); i += 1 }
      else { sb.append(escape(c)); i += 1 }
    }
  }

  /** Build the full line pattern from the fields' recorded source spans —
   * a single walk driven by `LogFormat.scan`'s output, so the regex can
   * never mis-align with the field list (the reference re-walks the
   * format string in GenerateRegexPattern and relies on the two walks
   * agreeing; spans make that agreement structural). */
  def linePattern(formatStr: String, fields: Vector[LogField]): String = {
    val sb = new StringBuilder("^")
    var last = 0
    for (f <- fields) {
      if (f.spanStart > last) literalPattern(formatStr.substring(last, f.spanStart), sb)
      if (f.quoted) {
        // quoted wins over every directive-specific pattern — even %t
        // matches [^"]* inside quotes (reference: format_parser.cpp:575,
        // is_quoted is checked before the timestamp branch; a quoted
        // Apache %t therefore captures its brackets and fails timestamp
        // conversion to NULL, which we mirror)
        if (f.isTimestamp || !f.skip) sb.append("([^\"]*)")
        else sb.append("(?:[^\"]*)")
      } else if (f.isTimestamp) {
        // %t always captures (group members are combined downstream)
        f.tsKind match {
          case TsKind.Apache => sb.append("\\[([^\\]]+)\\]")
          case TsKind.EpochSec | TsKind.EpochMsec | TsKind.EpochUsec => sb.append("(\\d+)")
          case TsKind.FracMsec => sb.append("(\\d{3})")
          case TsKind.FracUsec => sb.append("(\\d{6})")
          case TsKind.Strftime(fmt) => sb.append("(").append(strftimeToRegex(fmt)).append(")")
        }
      } else {
        if (f.skip) sb.append("(?:\\S+)")
        else sb.append("(\\S+)")
      }
      last = f.spanEnd max last
    }
    if (last < formatStr.length) literalPattern(formatStr.substring(last), sb)
    sb.toString
  }

  /** strftime → Spark/Java DateTimeFormatter pattern for `to_timestamp`.
   * Returns None when the format contains specifiers we can't map (the
   * caller falls back to a null timestamp, matching the reference's
   * best-effort parser). */
  def strftimeToJavaPattern(format: String): Option[String] = {
    val sb = new StringBuilder
    var i = 0
    var ok = true
    while (i < format.length && ok) {
      if (format.charAt(i) == '%' && i + 1 < format.length) {
        val spec =
          if (format.charAt(i + 1) == '-' && i + 2 < format.length) { i += 3; format.substring(i - 3, i) }
          else { i += 2; format.substring(i - 2, i) }
        spec match {
          case "%Y"        => sb.append("yyyy")
          case "%y"        => sb.append("yy")
          case "%m"        => sb.append("MM")
          case "%-m"       => sb.append("M")
          case "%d"        => sb.append("dd")
          case "%-d"       => sb.append("d")
          case "%b" | "%h" => sb.append("MMM")
          case "%B"        => sb.append("MMMM")
          case "%H"        => sb.append("HH")
          case "%-H"       => sb.append("H")
          case "%M"        => sb.append("mm")
          case "%S"        => sb.append("ss")
          case "%T"        => sb.append("HH:mm:ss")
          case "%R"        => sb.append("HH:mm")
          case "%z"        => sb.append("xx") // +0900
          case "%Z"        => sb.append("zzz")
          case "%a"        => sb.append("EEE")
          case "%%"        => sb.append("%")
          case _           => ok = false
        }
      } else {
        val ch = format.charAt(i)
        // quote literal letters for DateTimeFormatter
        if (ch.isLetter) sb.append('\'').append(ch).append('\'') else sb.append(ch)
        i += 1
      }
    }
    if (ok) Some(sb.toString) else None
  }
}
