package graft.logs

import org.apache.spark.sql.types._

/** Flavor of a `%t` / `%{...}t` timestamp directive. */
sealed trait TsKind
object TsKind {
  case object Apache extends TsKind // [dd/MMM/yyyy:HH:mm:ss Z]
  case object EpochSec extends TsKind // %{sec}t
  case object EpochMsec extends TsKind // %{msec}t
  case object EpochUsec extends TsKind // %{usec}t
  case object FracMsec extends TsKind // %{msec_frac}t
  case object FracUsec extends TsKind // %{usec_frac}t
  final case class Strftime(format: String) extends TsKind // %{strftime}t
}

/**
 * One directive occurrence in an Apache LogFormat string.
 *
 * Semantics follow the reference engine's directive table
 * (reference: src/httpd_log_format_parser.cpp:14-96) re-expressed for
 * Spark: `dataType` is a Spark SQL type; durations surface as
 * `DayTimeIntervalType` (microsecond precision, like DuckDB INTERVAL).
 */
final case class LogField(
    directive: String, // "%h", "%>s", "%i", "%^ti", ...
    modifier: String, // "Referer", "c", "ms", "sec", strftime fmt, ...
    columnName: String,
    dataType: DataType,
    quoted: Boolean,
    skip: Boolean = false, // matched but not output (merged/duplicate)
    skipMethod: Boolean = false, // %r sub-column overrides by %m/%U/%q/%H
    skipPath: Boolean = false,
    skipQuery: Boolean = false,
    skipProtocol: Boolean = false,
    tsGroup: Int = -1, // group id for combined %t runs, -1 = none
    tsKind: TsKind = TsKind.Apache,
    endTs: Boolean = false, // %{end:...}t
    spanStart: Int = -1, // directive's [start, end) span in the format string
    spanEnd: Int = -1
) {
  def isRequestLine: Boolean =
    directive == "%r" || directive == "%>r" || directive == "%<r"
  def isTimestamp: Boolean = directive == "%t"
}

/** Indices (into `fields`) of a run of %t directives combined into one column. */
final case class TsGroup(fieldIdx: Vector[Int])

/**
 * A parsed Apache LogFormat: ordered fields, timestamp groups, and the
 * single line-matching regex (one capturing group per field; skipped
 * non-%t fields are non-capturing).
 */
final case class LogFormat(
    original: String,
    fields: Vector[LogField],
    tsGroups: Vector[TsGroup],
    lineRegex: String
) {

  /** Output columns (name, type) excluding metadata columns. */
  def outputColumns: Vector[(String, DataType)] = fields.flatMap { f =>
    if (f.skip) Vector.empty
    else if (f.isTimestamp) Vector(f.columnName -> TimestampType)
    else if (f.isRequestLine) {
      val b = Vector.newBuilder[(String, DataType)]
      if (!f.skipMethod) b += ("method" -> StringType)
      if (!f.skipPath) b += ("path" -> StringType)
      if (!f.skipQuery) b += ("query_string" -> StringType)
      if (!f.skipProtocol) b += ("protocol" -> StringType)
      b.result()
    } else Vector(f.columnName -> f.dataType)
  }

  /**
   * Full schema including metadata columns: `log_file` always; raw mode
   * adds `line_number`, `parse_error`, `raw_line`
   * (reference: src/httpd_log_format_parser.cpp:650).
   */
  def schema(raw: Boolean): StructType = {
    val base = outputColumns.map { case (n, t) => StructField(n, t) }
    val meta = StructField("log_file", StringType) +: (if (raw)
      Seq(
        StructField("line_number", LongType),
        StructField("parse_error", BooleanType),
        StructField("raw_line", StringType)
      )
    else Seq.empty)
    StructType(base ++ meta)
  }

  /** Index of each field's capturing group in `lineRegex` (1-based), or -1 if non-capturing. */
  lazy val captureGroupOf: Vector[Int] = {
    var g = 0
    fields.map { f =>
      // %t fields always capture (group members are combined); other
      // skipped fields are non-capturing (reference: format_parser.cpp:574)
      if (f.isTimestamp || !f.skip) { g += 1; g }
      else -1
    }
  }
}

object LogFormat {
  val Common = "%h %l %u %t \"%r\" %>s %b"
  val Combined = Common + " \"%{Referer}i\" \"%{User-agent}i\""

  /** directive -> (column name, type, collision suffix, collision priority).
   * Priority 0 keeps the base name in a collision; higher gets the suffix.
   * (reference: src/httpd_log_format_parser.cpp:14-88)
   */
  private final case class Def(name: String, dt: DataType, suffix: String = "", priority: Int = 0)

  // Spark has no bare INTERVAL storage type that round-trips through
  // parquet cleanly; DayTimeIntervalType (µs precision) is the ANSI
  // equivalent of the reference's INTERVAL durations.
  private val Dur = DayTimeIntervalType()

  private val defs: Map[String, Def] = Map(
    "%h" -> Def("client_host", StringType),
    "%a" -> Def("remote_ip", StringType),
    "%A" -> Def("local_ip", StringType),
    "%l" -> Def("ident", StringType),
    "%u" -> Def("auth_user", StringType),
    "%t" -> Def("timestamp", TimestampType),
    "%>r" -> Def("request", StringType, "", 0),
    "%r" -> Def("request", StringType, "_original", 1),
    "%<r" -> Def("request", StringType, "_original", 1),
    "%m" -> Def("method", StringType),
    "%>U" -> Def("path", StringType, "", 0),
    "%U" -> Def("path", StringType, "_original", 1),
    "%<U" -> Def("path", StringType, "_original", 1),
    "%q" -> Def("query_string", StringType),
    "%H" -> Def("protocol", StringType),
    "%p" -> Def("server_port", IntegerType),
    "%k" -> Def("keepalive_count", IntegerType),
    "%X" -> Def("connection_status", StringType),
    "%P" -> Def("process_id", IntegerType),
    "%>D" -> Def("duration", Dur, "", 0),
    "%D" -> Def("duration", Dur, "_original", 1),
    "%<D" -> Def("duration", Dur, "_original", 1),
    "%>T" -> Def("duration", Dur, "", 0),
    "%T" -> Def("duration", Dur, "_original", 1),
    "%<T" -> Def("duration", Dur, "_original", 1),
    "%>s" -> Def("status", IntegerType, "", 0),
    "%s" -> Def("status", IntegerType, "_original", 1),
    "%<s" -> Def("status", IntegerType, "_original", 1),
    "%v" -> Def("server_name", StringType, "", 0),
    "%V" -> Def("server_name", StringType, "_used", 1),
    "%B" -> Def("bytes", LongType),
    "%b" -> Def("bytes", LongType),
    "%I" -> Def("bytes_received", LongType),
    "%O" -> Def("bytes_sent", LongType),
    "%S" -> Def("bytes_transferred", LongType),
    "%f" -> Def("filename", StringType),
    "%L" -> Def("request_log_id", StringType),
    "%R" -> Def("handler", StringType),
    // dynamic-name directives: column name comes from the modifier
    "%i" -> Def("", StringType, "_in", 2),
    "%o" -> Def("", StringType, "_out", 3),
    "%C" -> Def("", StringType, "_cookie", 4),
    "%e" -> Def("", StringType, "_env", 5),
    "%n" -> Def("", StringType, "_note", 6),
    "%^ti" -> Def("", StringType, "_trail_in", 7),
    "%^to" -> Def("", StringType, "_trail_out", 8)
  )

  /** Header names with typed overrides: name -> (type, applies to %i, applies to %o)
   * (reference: format_parser.cpp:92-96) */
  private val typedHeaders: Map[String, (DataType, Boolean, Boolean)] = Map(
    "content-length" -> ((LongType, true, true)),
    "age" -> ((IntegerType, false, true)),
    "max-forwards" -> ((IntegerType, true, false))
  )

  private def collisionPriority(directive: String): Int =
    defs.get(directive).map(_.priority).getOrElse(999)

  private def collisionSuffix(directive: String): String =
    defs.get(directive).map(_.suffix).getOrElse("")

  /** Column name for a directive+modifier (reference: format_parser.cpp:261). */
  def columnName(directive: String, modifier: String): String = directive match {
    case "%i" | "%o" | "%C" | "%e" | "%n" | "%^ti" | "%^to" if modifier.nonEmpty =>
      modifier.toLowerCase.replace('-', '_')
    case "%a" if modifier == "c" => "peer_ip"
    case "%h" if modifier == "c" => "peer_host"
    case "%P" =>
      modifier match {
        case "" | "pid" => "process_id"
        case "tid"      => "thread_id"
        case "hextid"   => "thread_id_hex"
        case _          => "process_id"
      }
    case "%p" =>
      modifier match {
        case "" | "canonical" => "server_port"
        case "local"          => "local_port"
        case "remote"         => "remote_port"
        case _                => "server_port"
      }
    case d =>
      defs.get(d).filter(_.name.nonEmpty).map(_.name).getOrElse("field_" + d.stripPrefix("%"))
  }

  /** Spark type for a directive+modifier (reference: format_parser.cpp:339). */
  def dataType(directive: String, modifier: String): DataType = directive match {
    case "%i" | "%o" if modifier.nonEmpty =>
      typedHeaders.get(modifier.toLowerCase) match {
        case Some((t, req, resp)) if (directive == "%i" && req) || (directive == "%o" && resp) => t
        case _ => StringType
      }
    case "%C" | "%e" | "%n" | "%^ti" | "%^to" => StringType
    case "%P" =>
      modifier match {
        case "" | "pid" => IntegerType
        case "tid"      => LongType
        case "hextid"   => StringType
        case _          => IntegerType
      }
    case d => defs.get(d).map(_.dt).getOrElse(StringType)
  }

  /** Duration precision rank: lower = higher precision wins the `duration`
   * column when several duration directives coexist
   * (reference: format_parser.cpp:198). -1 = not a duration. */
  private def durationRank(directive: String, modifier: String): Int = directive match {
    case "%D" | "%>D" | "%<D" => 0
    case "%T" | "%>T" | "%<T" =>
      modifier match {
        case "us" => 1
        case "ms" => 2
        case "s"  => 4
        case _    => 3
      }
    case _ => -1
  }

  // ---------------------------------------------------------------------
  // Format-string scanning
  // ---------------------------------------------------------------------

  /** Parse a LogFormat string into an ordered field list + regex + groups. */
  def parse(formatStr: String): LogFormat = {
    var fields = scan(formatStr)
    fields = resolveRequestLineOverrides(fields)
    val (fields2, groups) = groupTimestamps(fields)
    fields = renameBeginEnd(fields2)
    fields = resolveCollisions(fields)
    val regex = LogRegex.linePattern(formatStr, fields)
    LogFormat(formatStr, fields, groups, regex)
  }

  /** Raw-only format used when auto-detection fails: no fields, every line
   * is a parse error (reference: multi_file_info.cpp:220). */
  val Unknown: LogFormat = LogFormat("", Vector.empty, Vector.empty, "(?!)")

  private def scan(formatStr: String): Vector[LogField] = {
    val out = Vector.newBuilder[LogField]
    var pos = 0
    var inQuotes = false
    val n = formatStr.length
    while (pos < n) {
      val c = formatStr.charAt(pos)
      if (c == '"') { inQuotes = !inQuotes; pos += 1 }
      else if (c == '%' && pos + 1 < n && formatStr.charAt(pos + 1) == '%') {
        pos += 2 // Apache %% is a literal percent, not a directive
      } else if (c == '%' && pos + 1 < n) {
        val spanStart = pos
        // skip status-code conditions: %400,501{...} / %!200s
        var dirStart = pos + 1
        if (dirStart < n && formatStr.charAt(dirStart) == '!') dirStart += 1
        while (dirStart < n && (formatStr.charAt(dirStart).isDigit || formatStr.charAt(dirStart) == ',')) dirStart += 1

        var directive = ""
        var modifier = ""
        var malformed = false
        if (dirStart < n && formatStr.charAt(dirStart) == '{') {
          val close = formatStr.indexOf('}', dirStart + 1)
          if (close >= 0 && close + 1 < n) {
            modifier = formatStr.substring(dirStart + 1, close)
            if (formatStr.charAt(close + 1) == '^' && close + 3 < n) {
              directive = "%" + formatStr.substring(close + 1, close + 4) // %^ti / %^to
              pos = close + 4
            } else {
              directive = "%" + formatStr.charAt(close + 1)
              pos = close + 2
            }
          } else { malformed = true; pos += 1 }
        } else if (dirStart == pos + 1 && pos + 2 < n &&
          (formatStr.charAt(pos + 1) == '>' || formatStr.charAt(pos + 1) == '<')) {
          directive = formatStr.substring(pos, pos + 3) // %>s, %<U, ...
          pos += 3
        } else if (dirStart > pos + 1) {
          // status condition present: single-char directive follows it
          if (dirStart < n) { directive = "%" + formatStr.charAt(dirStart); pos = dirStart + 1 }
          else { malformed = true; pos = n }
        } else {
          directive = formatStr.substring(pos, math.min(pos + 2, n))
          pos += 2
        }

        if (!malformed) {
          var endTs = false
          val tsKind: TsKind =
            if (directive == "%t") {
              // begin:/end: prefixes apply to every timestamp kind
              // (reference: format_parser.cpp:898-930)
              val m =
                if (modifier.startsWith("begin:")) modifier.stripPrefix("begin:")
                else if (modifier.startsWith("end:")) { endTs = true; modifier.stripPrefix("end:") }
                else modifier
              m match {
                case ""          => TsKind.Apache
                case "sec"       => TsKind.EpochSec
                case "msec"      => TsKind.EpochMsec
                case "usec"      => TsKind.EpochUsec
                case "msec_frac" => TsKind.FracMsec
                case "usec_frac" => TsKind.FracUsec
                case fmt         => TsKind.Strftime(fmt)
              }
            } else TsKind.Apache
          out += LogField(
            directive, modifier,
            columnName(directive, modifier), dataType(directive, modifier),
            quoted = inQuotes, tsKind = tsKind, endTs = endTs,
            spanStart = spanStart, spanEnd = pos)
        }
      } else pos += 1
    }
    out.result()
  }

  /** %m/%U/%q/%H override the corresponding %r sub-columns
   * (reference: format_parser.cpp:859-896). */
  private def resolveRequestLineOverrides(fields: Vector[LogField]): Vector[LogField] = {
    val hasM = fields.exists(_.directive == "%m")
    val hasU = fields.exists(f => f.directive == "%U" || f.directive == "%>U" || f.directive == "%<U")
    val hasQ = fields.exists(_.directive == "%q")
    val hasH = fields.exists(_.directive == "%H")
    val lastR = fields.lastIndexWhere(_.isRequestLine)
    if (lastR < 0) fields
    else fields.updated(lastR, fields(lastR).copy(
      skipMethod = hasM, skipPath = hasU, skipQuery = hasQ, skipProtocol = hasH))
  }

  /** Group consecutive %t directives; a begin/end flip starts a new group.
   * Non-leading members are skipped in the schema and combined into the
   * leader's single timestamp (reference: format_parser.cpp:898-986). */
  private def groupTimestamps(fields: Vector[LogField]): (Vector[LogField], Vector[TsGroup]) = {
    val updated = fields.toArray
    val groups = Vector.newBuilder[TsGroup]
    var current = Vector.newBuilder[Int]
    var inGroup = false
    var groupIsEnd = false
    var groupId = -1

    def closeGroup(): Unit = if (inGroup) { groups += TsGroup(current.result()); current = Vector.newBuilder[Int]; inGroup = false }

    for (i <- fields.indices) {
      val f = fields(i)
      if (f.isTimestamp) {
        val startNew = !inGroup || f.endTs != groupIsEnd
        if (startNew) {
          closeGroup()
          inGroup = true; groupIsEnd = f.endTs; groupId += 1
          updated(i) = f.copy(tsGroup = groupId)
          current += i
        } else {
          updated(i) = f.copy(tsGroup = groupId, skip = true)
          current += i
        }
      } else closeGroup()
    }
    closeGroup()
    (updated.toVector, groups.result())
  }

  /** When both begin: and end: groups exist, the begin leader becomes
   * `timestamp_original` (reference: format_parser.cpp:988-1013). */
  private def renameBeginEnd(fields: Vector[LogField]): Vector[LogField] = {
    val leaders = fields.filter(f => f.isTimestamp && !f.skip)
    if (leaders.exists(_.endTs) && leaders.exists(!_.endTs))
      fields.map(f => if (f.isTimestamp && !f.skip && !f.endTs) f.copy(columnName = "timestamp_original") else f)
    else fields
  }

  /** Rule-based collision resolution (reference: format_parser.cpp:1015-1215). */
  private def resolveCollisions(fields: Vector[LogField]): Vector[LogField] = {
    val arr = fields.toArray
    val byName = fields.indices.groupBy(i => fields(i).columnName)

    for ((name, idxs) <- byName if idxs.size > 1) {
      name match {
        case "duration" | "duration_original" =>
          // keep only the highest-precision duration directive
          val best = idxs.minBy { i =>
            val r = durationRank(arr(i).directive, arr(i).modifier)
            if (r < 0) Int.MaxValue else r
          }
          for (i <- idxs if i != best) arr(i) = arr(i).copy(skip = true)

        case "process_id" =>
          val best = idxs.find(i => arr(i).directive == "%P" && arr(i).modifier.isEmpty)
            .orElse(idxs.find(i => arr(i).directive == "%P" && arr(i).modifier == "pid"))
            .getOrElse(idxs.head)
          for (i <- idxs if i != best) arr(i) = arr(i).copy(skip = true)

        case "server_port" =>
          val best = idxs.find(i => arr(i).directive == "%p" && arr(i).modifier.isEmpty)
            .orElse(idxs.find(i => arr(i).directive == "%p" && arr(i).modifier == "canonical"))
            .getOrElse(idxs.head)
          for (i <- idxs if i != best) arr(i) = arr(i).copy(skip = true)

        case "bytes" =>
          // %b and %B are value-equivalent; first occurrence wins
          for (i <- idxs.tail) arr(i) = arr(i).copy(skip = true)

        case _ =>
          val directives = idxs.map(i => arr(i).directive).distinct
          if (directives.size == 1) {
            // duplicates of the same directive: x, x_2, x_3, ...
            for ((i, k) <- idxs.zipWithIndex if k > 0)
              arr(i) = arr(i).copy(columnName = s"${name}_${k + 1}")
          } else {
            // different directives: lowest priority keeps base name,
            // others take their suffix; then number residual duplicates
            val sorted = idxs.sortBy(i => collisionPriority(arr(i).directive)) // stable
            for ((i, k) <- sorted.zipWithIndex) {
              if (k == 0) arr(i) = arr(i).copy(columnName = name)
              else {
                val sfx = collisionSuffix(arr(i).directive)
                val nn = if (sfx.nonEmpty) name + sfx else s"${name}_${collisionPriority(arr(i).directive)}"
                arr(i) = arr(i).copy(columnName = nn)
              }
            }
            val counts = scala.collection.mutable.Map.empty[String, Int]
            for (i <- sorted) {
              val cur = arr(i).columnName
              val c = counts.getOrElse(cur, 0) + 1
              counts(cur) = c
              if (c > 1) arr(i) = arr(i).copy(columnName = s"${cur}_$c")
            }
          }
      }
    }
    arr.toVector
  }
}
