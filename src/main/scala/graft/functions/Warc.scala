package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * C111: WARC record parsing — the step BEFORE C109 in a real crawl
 * pipeline (Common-Crawl-class corpora arrive as WARC/1.x archives;
 * ISO 28500): one segment of WARC bytes → the array of records it
 * frames, each with its WARC headers, and for `response` records the
 * HTTP status/Content-Type/body split out so the payload feeds
 * [[HtmlExtract]] directly. Single pass, codegen as one static call
 * (the WordShingles escalation pattern) — map-only at any archive
 * size; scan parallelism is per-FILE (`binaryFile` source), which
 * matches how WARC ships (~1 GiB gzip members, not splittable).
 *
 * Framing contract (spec-pinned):
 *  - A record = version line (`WARC/…`), header lines to the first
 *    empty line, then exactly `Content-Length` bytes of block, then
 *    CRLF/LF separators before the next record. Lines tolerate bare
 *    LF; header names match case-insensitively.
 *  - A missing/garbled version line or Content-Length stops the parse
 *    at that point (records already framed are returned — truncated
 *    tails are a fact of crawl archives).
 *  - `response` records with an `application/http` Content-Type parse
 *    the HTTP layer: status-line code, `Content-Type` header, body
 *    after the first blank line. Other records carry the raw block as
 *    payload with NULL http fields.
 *  - gzip (1f 8b) and zstd (28 b5 2f fd) segments are sniffed and
 *    decompressed first (zstd via the same zstd-jni path as
 *    [[graft.sources.ZstdJniCodec]]); decompressed size is capped at
 *    1 GiB — a bomb fails loudly rather than OOMing the executor.
 */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WarcRecords.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "warc_records"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WarcRecords.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes =>
      s"${ev.value} = graft.functions.WarcRecords.compute($bytes);")

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {

  def apply(content: Column): Column =
    Shim.column(WarcRecords(Shim.expression(content)))

  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("payload", StringType, nullable = true),
    // the honest schema for non-text payloads (r14 verdict #9): the
    // SAME bytes as `payload` but BinaryType, so WARC-borne media feed
    // C8/C86 (image decode, dHash) without a lossy string hop. The
    // string twin stays — UTF8String preserves raw bytes, and every
    // text consumer (HtmlExtract, md5) reads it directly.
    StructField("payload_bytes", BinaryType, nullable = true),
    // C111c: record framing coordinates for the CDX-style archive
    // index — byte offset of the record's version line and record
    // length (version line through block end, excluding inter-record
    // separators) in the DECOMPRESSED segment stream. Our members are
    // whole-file gzip, so decompressed offsets ARE the random-access
    // contract (re-read = inflate + seek); per-record-gzip archives
    // would carry member-relative compressed offsets instead.
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    // C129: the revisit linkage headers [[graft.sources.Warc]] writes
    // (sources/Warc.scala revisitRecord) — surfacing them makes a
    // deduplicated archive READABLE, not write-only: `refers_to` is
    // the owner record's WARC-Record-ID, `payload_digest` the owner
    // payload's digest (`md5:<hex>` as written). NULL on records
    // without the headers; appended so earlier ordinals are stable.
    StructField("refers_to", StringType, nullable = true),
    StructField("payload_digest", StringType, nullable = true)))

  val schema: DataType = ArrayType(recordSchema, containsNull = false)

  private val MaxDecompressed = 1L << 30

  // private[graft]: the archive GC rewrite (sources/Warc
  // rewriteMembers) re-slices member streams at the framer's
  // (offset, length) coordinates and needs the same magic-sniff
  // decompression this parse uses — one decoder, one contract.
  private[graft] def sniff(bytes: Array[Byte]): Array[Byte] = {
    def inflate(in: java.io.InputStream): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(math.min(
        bytes.length.toLong * 4, 1L << 20).toInt)
      val buf = new Array[Byte](1 << 16)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        require(total <= MaxDecompressed,
          s"warc_records: decompressed segment exceeds $MaxDecompressed bytes")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    }
    if (bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte)
      inflate(new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    else if (bytes.length >= 4 && bytes(0) == 0x28.toByte &&
        bytes(1) == 0xb5.toByte && bytes(2) == 0x2f.toByte &&
        bytes(3) == 0xfd.toByte) {
      val z = new com.github.luben.zstd.ZstdInputStream(
        new java.io.ByteArrayInputStream(bytes))
      z.setContinuous(true)
      inflate(z)
    } else bytes
  }

  /** Reads the line starting at `i` (up to LF or EOF, trailing CR
   * stripped); returns (line, indexAfterTerminator). */
  private def line(d: Array[Byte], i: Int): (String, Int) = {
    var j = i
    while (j < d.length && d(j) != '\n') j += 1
    val end = if (j > i && d(j - 1) == '\r') j - 1 else j
    (new String(d, i, end - i, java.nio.charset.StandardCharsets.UTF_8),
      math.min(j + 1, d.length))
  }

  def compute(raw: Array[Byte]): GenericArrayData = {
    val d = sniff(raw)
    val n = d.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    var ok = true
    while (ok && i < n) {
      // skip inter-record CR/LF padding
      while (i < n && (d(i) == '\r' || d(i) == '\n')) i += 1
      if (i >= n) ok = false
      else {
        val recordStart = i
        val (ver, afterVer) = line(d, i)
        if (!ver.startsWith("WARC/")) ok = false
        else {
          i = afterVer
          val headers = scala.collection.mutable.Map.empty[String, String]
          var blank = false
          while (!blank && i < n) {
            val (h, next) = line(d, i)
            i = next
            if (h.isEmpty) blank = true
            else {
              val c = h.indexOf(':')
              if (c > 0) headers(
                h.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)) =
                h.substring(c + 1).trim
            }
          }
          val len = headers.get("content-length").flatMap(v =>
            try Some(v.toLong) catch { case _: NumberFormatException => None })
          len match {
            case None => ok = false
            case Some(l) if l < 0 || i + l > n => ok = false
            case Some(l) =>
              val blockStart = i
              val blockEnd = i + l.toInt
              i = blockEnd
              val wtype = headers.get("warc-type").orNull
              val ctype = headers.get("content-type").orNull
              var status: Any = null
              var httpCt: Any = null
              var payloadStart = blockStart
              if (wtype == "response" && ctype != null &&
                  ctype.startsWith("application/http")) {
                val (statusLine, afterStatus) = line(d, blockStart)
                val parts = statusLine.split(" ")
                if (parts.length >= 2 && parts(0).startsWith("HTTP/")) {
                  try status = parts(1).toInt
                  catch { case _: NumberFormatException => () }
                  var j = afterStatus
                  var hBlank = false
                  while (!hBlank && j < blockEnd) {
                    val (h, next) = line(d, j)
                    j = next
                    if (h.isEmpty) hBlank = true
                    else {
                      val c = h.indexOf(':')
                      if (c > 0 && h.substring(0, c).trim
                          .equalsIgnoreCase("content-type"))
                        httpCt = UTF8String.fromString(h.substring(c + 1).trim)
                    }
                  }
                  payloadStart = math.min(j, blockEnd)
                }
              }
              val payloadBytes =
                java.util.Arrays.copyOfRange(d, payloadStart, blockEnd)
              out += new GenericInternalRow(Array[Any](
                UTF8String.fromString(wtype),
                headers.get("warc-target-uri")
                  .map(UTF8String.fromString).orNull,
                headers.get("warc-record-id")
                  .map(UTF8String.fromString).orNull,
                UTF8String.fromString(ctype),
                headers.get("warc-date").map(UTF8String.fromString).orNull,
                status, httpCt, UTF8String.fromBytes(payloadBytes),
                payloadBytes,
                recordStart.toLong, (blockEnd - recordStart).toLong,
                headers.get("warc-refers-to")
                  .map(UTF8String.fromString).orNull,
                headers.get("warc-payload-digest")
                  .map(UTF8String.fromString).orNull))
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}
