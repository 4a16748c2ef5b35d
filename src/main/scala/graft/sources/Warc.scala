package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * C111: WARC archive reader — `binaryFile` source (one task per
 * archive member, the right parallelism for how WARC ships: ~1 GiB
 * non-splittable gzip members, 100 TB = ~100k files) + the
 * [[graft.functions.WarcRecords]] single-pass framer (which
 * magic-sniffs gzip/zstd per segment, so `.warc`, `.warc.gz`, and
 * `.warc.zst` all read through one call). One row per record:
 * `warc_file` + the record struct's fields, with `response` records
 * carrying their HTTP status/Content-Type/body — the body feeds
 * [[graft.functions.HtmlExtract]] directly (the full crawl front
 * door: WARC → HTML → text).
 */
object Warc {

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path").as("warc_file"),
        explode(graft.functions.WarcRecords(col("content"))).as("r"))
      .select(col("warc_file"), col("r.*"))

  /**
   * C124: WET conversion record bytes — the Common-Crawl sibling
   * artifact downstream text consumers expect (WARC/1.0 record,
   * `WARC-Type: conversion`, `Content-Type: text/plain`, payload =
   * the extracted text). Pure column arithmetic (concat/octet_length/
   * md5 — all codegen builtins, record assembly never leaves the
   * executors); the record id is DETERMINISTIC (md5 of uri+payload)
   * so re-emission is idempotent and oracle-checkable. `Content-Length`
   * is the BYTE length of the UTF-8 payload, per the spec.
   */
  def wetRecord(
      uri: Column, refersTo: Column, date: Column, text: Column): Column = {
    val payload = coalesce(text, lit(""))
    val rid = concat(lit("<urn:uuid:"),
      md5(concat_ws("|", uri, payload)), lit(">"))
    concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nWARC-Record-ID: "), rid, lit("\r\n"),
      when(refersTo.isNotNull,
        concat(lit("WARC-Refers-To: "), refersTo, lit("\r\n")))
        .otherwise(lit("")),
      lit("Content-Type: text/plain\r\nContent-Length: "),
      octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload).cast("binary")
  }

  /**
   * C124: WAT metadata record bytes — `WARC-Type: metadata` with an
   * `application/json` envelope carrying the response headers and the
   * extracted link list (the fields a frontier/link-graph consumer
   * reads WITHOUT touching payload bytes). JSON is built by the
   * codegen `to_json` over a nested struct shaped like the WAT
   * envelope (`Envelope.Payload-Metadata.HTTP-Response-Metadata`).
   */
  def watRecord(
      uri: Column, refersTo: Column, date: Column,
      status: Column, mime: Column, links: Column): Column = {
    val payload = to_json(struct(
      struct(
        struct(uri.as("WARC-Target-URI"), date.as("WARC-Date"))
          .as("WARC-Header-Metadata"),
        struct(
          struct(
            struct(status.as("Status")).as("Response-Message"),
            struct(mime.as("Content-Type")).as("Headers"),
            struct(transform(coalesce(links, array()),
              u => struct(u.as("url"))).as("Links")).as("HTML-Metadata"))
            .as("HTTP-Response-Metadata")).as("Payload-Metadata"))
        .as("Envelope")))
    val rid = concat(lit("<urn:uuid:"),
      md5(concat_ws("|", uri, payload)), lit(">"))
    concat(
      lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nWARC-Record-ID: "), rid, lit("\r\n"),
      when(refersTo.isNotNull,
        concat(lit("WARC-Refers-To: "), refersTo, lit("\r\n")))
        .otherwise(lit("")),
      lit("Content-Type: application/json\r\nContent-Length: "),
      octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload).cast("binary")
  }

  /** RFC 7231 reason phrases for the statuses a crawl archive actually
   * sees; unknown codes emit a bare status line (`HTTP/1.1 418\r\n`),
   * which every tolerant HTTP parser (ours included) accepts — r17
   * advice: the previous hardcoded ` OK` emitted `HTTP/1.1 404 OK`. */
  private val ReasonPhrases: Map[Int, String] = Map(
    200 -> "OK", 201 -> "Created", 204 -> "No Content",
    206 -> "Partial Content", 301 -> "Moved Permanently", 302 -> "Found",
    304 -> "Not Modified", 307 -> "Temporary Redirect",
    308 -> "Permanent Redirect", 400 -> "Bad Request",
    401 -> "Unauthorized", 403 -> "Forbidden", 404 -> "Not Found",
    410 -> "Gone", 429 -> "Too Many Requests",
    500 -> "Internal Server Error", 502 -> "Bad Gateway",
    503 -> "Service Unavailable", 504 -> "Gateway Timeout")

  /** C128: full response record bytes (WARC/1.0, `application/http`
   * block with status/mime/Content-Length, then the payload bytes) —
   * the normalized-archive twin of what [[read]] parses. Binary-safe:
   * the record is a concat of UTF-8 header bytes and the raw payload. */
  def responseRecord(
      uri: Column, rid: Column, date: Column,
      status: Column, mime: Column, payloadBytes: Column): Column = {
    val body = coalesce(payloadBytes, lit(Array.emptyByteArray))
    // try_element_at, not element_at: under ANSI mode (Spark 4's
    // default; our sessions disable it but callers' may not) a plain
    // element_at on a missing map key THROWS — a crawl's 999/451/520
    // status would fail the whole write job instead of emitting the
    // documented bare status line. try_element_at is NULL either way;
    // concat propagates it and coalesce drops the phrase.
    val reason = coalesce(
      concat(lit(" "),
        try_element_at(typedlit(ReasonPhrases), status.cast("int"))),
      lit(""))
    val http = concat(
      concat(lit("HTTP/1.1 "), status.cast("string"), reason,
        lit("\r\nContent-Type: "), mime,
        lit("\r\nContent-Length: "), octet_length(body).cast("string"),
        lit("\r\n\r\n")).cast("binary"),
      body)
    concat(
      concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        uri, lit("\r\nWARC-Date: "), date,
        lit("\r\nWARC-Record-ID: "), rid,
        lit("\r\nContent-Type: application/http;msgtype=response" +
          "\r\nContent-Length: "),
        octet_length(http).cast("string"), lit("\r\n\r\n")).cast("binary"),
      http)
  }

  /** C128: revisit record bytes — the Common-Crawl device for a
   * re-fetch whose payload was already archived: a header-only record
   * (`WARC-Type: revisit`, `WARC-Refers-To` the canonical record,
   * `WARC-Payload-Digest`, Content-Length 0) replaces the duplicate
   * payload, so a 100 TB archive stops paying for re-crawls. */
  def revisitRecord(
      uri: Column, refersTo: Column, date: Column, digest: Column): Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nWARC-Record-ID: "), concat(lit("<urn:uuid:rv-"),
        md5(concat_ws("|", uri, digest)), lit(">")),
      lit("\r\nWARC-Refers-To: "), refersTo,
      lit("\r\nWARC-Payload-Digest: md5:"), digest,
      lit("\r\nContent-Length: 0\r\n\r\n")).cast("binary")

  /**
   * C128: deduplicating archive writer — per payload digest, the
   * fetch with the smallest `orderCol` (fetch sequence / crawl time;
   * must be unique per duplicate group) keeps its FULL response
   * record; every later fetch of identical bytes becomes a REVISIT
   * record referencing the owner. One combining aggregate keyed on
   * (xxhash64(payload), byte length) — 16-byte shuffle keys, the
   * attritionFunnel collision guard — plus a keyed join back; never
   * all-pairs, never payload-keyed shuffles. Appends `is_owner`,
   * `digest`, `rec` (record bytes, ready for [[writeMembers]]), and
   * `saved_bytes` (payload bytes a revisit avoids re-storing).
   */
  def dedupArchive(
      fetches: DataFrame, uriCol: String, ridCol: String, dateCol: String,
      statusCol: String, mimeCol: String, payloadCol: String,
      orderCol: String): DataFrame = {
    // null payloads fold into the empty-bytes family (a failed fetch
    // is "the same bytes" as any other failed fetch) — without the
    // coalesce a null would null the digest and the revisit record
    val pl = coalesce(col(payloadCol), lit(Array.emptyByteArray))
    val keyed = fetches
      .withColumn("__pl", pl)
      .withColumn("__dk", xxhash64(col("__pl")))
      .withColumn("__dl", octet_length(col("__pl")).cast("long"))
    val owners = keyed.groupBy("__dk", "__dl")
      .agg(min(col(orderCol)).as("__own"),
        min_by(col(ridCol), col(orderCol)).as("__own_rid"))
    keyed.join(owners, Seq("__dk", "__dl"))
      .withColumn("is_owner", col(orderCol) === col("__own"))
      .withColumn("digest", md5(col("__pl")))
      .withColumn("rec", when(col("is_owner"),
        responseRecord(col(uriCol), col(ridCol), col(dateCol),
          col(statusCol), col(mimeCol), col("__pl")))
        .otherwise(revisitRecord(col(uriCol), col("__own_rid"),
          col(dateCol), col("digest"))))
      .withColumn("saved_bytes",
        when(col("is_owner"), lit(0L))
          .otherwise(octet_length(col("__pl")).cast("long")))
      .drop("__pl", "__dk", "__dl", "__own", "__own_rid")
  }

  /**
   * C129: revisit hydration — the READ half of [[dedupArchive]]'s
   * contract (r17 verdict #1): a deduplicated archive stores each
   * payload once, so re-materializing the ORIGINAL per-fetch view
   * means joining every `revisit` record back to the `response`
   * record its `WARC-Refers-To` header names and restoring the owner's
   * payload (+ HTTP fields). Input is [[read]] output (or any frame
   * with the framer's columns); returns the same rows with revisit
   * rows' `payload`/`payload_bytes`/`http_status`/`http_content_type`
   * replaced by the owner's, plus `hydrated` (this row's payload came
   * from its owner) and `digest_ok` (the owner's payload md5 matches
   * the revisit's recorded `WARC-Payload-Digest` — the end-to-end
   * integrity check a consumer should gate on; NULL on non-hydrated
   * rows).
   *
   * Scale shape (r18 verdict #1): ONLY `revisit` rows enter the
   * owner join — `refers_to` is NULL on every response, so keying the
   * whole archive on it would fold the corpus bulk (payload bytes
   * included) into ONE constant-key shuffle partition. Responses (and
   * any other non-revisit record) take the map-only union branch and
   * never touch an exchange. The join itself shuffles on
   * (xxhash64(record id), length) — 16-byte keys, the attritionFunnel
   * guard, so the ~40-char id strings never ride the exchange as
   * keys; the exact-id equality is a post-match residual (wrapped in
   * coalesce so the planner can NOT lift it into the shuffle key),
   * which also keeps left-join semantics — a dangling revisit (owner
   * vacuumed or in an unread member) survives unhydrated rather than
   * disappearing. Response record ids are unique per the WARC spec;
   * duplicates would fan out the join like any keyed join.
   *
   * `digest_ok` compares only when the revisit's recorded digest
   * carries the `md5:` scheme (what [[revisitRecord]] writes); a
   * foreign archive's `sha1:` digests yield NULL, not a false alarm.
   *
   * Callers hydrating a binaryFile-backed archive pay two framer
   * parses (owners + revisits) plus the map-only pass — persist the
   * framed frame first to parse once if the archive is re-read anyway.
   */
  def hydrateRevisits(records: DataFrame): DataFrame = {
    val owners = records.filter(col("warc_type") === "response")
      .select(xxhash64(col("record_id")).as("__ok"),
        length(col("record_id")).cast("long").as("__ol"),
        col("record_id").as("__oid"),
        col("payload").as("__opl"),
        col("payload_bytes").as("__opb"),
        col("http_status").as("__ost"),
        col("http_content_type").as("__oct"))
    val revisits = records.filter(col("warc_type") === "revisit")
      .withColumn("__rk", xxhash64(col("refers_to")))
      .withColumn("__rl", length(col("refers_to")).cast("long"))
    val joined = revisits.join(owners,
      revisits("__rk") === owners("__ok") &&
        revisits("__rl") === owners("__ol") &&
        coalesce(revisits("refers_to") === owners("__oid"), lit(false)),
      "left")
    val isHyd = col("__oid").isNotNull
    val outCols = records.columns.map {
      case "payload" =>
        when(isHyd, col("__opl")).otherwise(col("payload")).as("payload")
      case "payload_bytes" =>
        when(isHyd, col("__opb")).otherwise(col("payload_bytes"))
          .as("payload_bytes")
      case "http_status" =>
        when(isHyd, col("__ost")).otherwise(col("http_status"))
          .as("http_status")
      case "http_content_type" =>
        when(isHyd, col("__oct")).otherwise(col("http_content_type"))
          .as("http_content_type")
      case c => col(c)
    }
    val hydrated = joined.select(outCols :+ isHyd.as("hydrated") :+
      when(isHyd && col("payload_digest").startsWith("md5:"),
        col("payload_digest") ===
          concat(lit("md5:"), md5(col("__opb")))).as("digest_ok"): _*)
    val passthrough = records
      .filter(!(col("warc_type") <=> lit("revisit")))
      .select(records.columns.map(col) :+ lit(false).as("hydrated") :+
        lit(null).cast("boolean").as("digest_ok"): _*)
    hydrated.unionByName(passthrough)
  }

  /**
   * C131: archive GC with revisit-aware liveness — the retention step
   * a DEDUPLICATED archive needs that a plain one doesn't: records
   * outside the retention predicate can be dropped, EXCEPT an owner
   * response some live revisit still refers to — dropping it would
   * orphan the revisit's payload forever (the whole point of C128 was
   * that the owner holds the only copy). Keep set = `keep` rows ∪
   * expired owners referenced by a kept revisit; every kept revisit's
   * owner is kept by construction, so [[hydrateRevisits]] over the GC
   * output never dangles (spec-pinned). Returns the kept rows plus
   * `gc_reason` ('live' | 'pinned_by_revisit').
   *
   * Scale shape: one distinct over the live revisits' referent ids and
   * one semi-join of expired owners against it — both on (xxhash64(id),
   * length) 16-byte keys with the exact-id residual coalesce-wrapped
   * out of the shuffle key (the [[hydrateRevisits]] device). `keep`
   * must be null-safe (evaluate to true/false, not NULL) — rows where
   * it evaluates NULL are treated as expired.
   *
   * `records` is consumed by three branches (live filter, expired
   * owners, live-revisit referents) plus the union — over a
   * binaryFile-backed archive each is a full gzip re-parse, so
   * callers GCing a real archive should persist the framed frame
   * first (parse once, serve all branches from cache/disk); the
   * branches themselves never shuffle payload bytes either way.
   */
  def gcArchive(records: DataFrame, keep: Column): DataFrame = {
    val live = records.filter(coalesce(keep, lit(false)))
    val expiredOwners = records.filter(!coalesce(keep, lit(false)))
      .filter(col("warc_type") === "response")
      .withColumn("__ek", xxhash64(col("record_id")))
      .withColumn("__el", length(col("record_id")).cast("long"))
    val refs = live.filter(col("warc_type") === "revisit")
      .select(xxhash64(col("refers_to")).as("__qk"),
        length(col("refers_to")).cast("long").as("__ql"),
        col("refers_to").as("__qid"))
      .distinct()
    val pinned = expiredOwners.join(refs,
        expiredOwners("__ek") === refs("__qk") &&
          expiredOwners("__el") === refs("__ql") &&
          coalesce(expiredOwners("record_id") === refs("__qid"), lit(false)),
        "left_semi")
      .drop("__ek", "__el")
    live.withColumn("gc_reason", lit("live"))
      .unionByName(pinned.withColumn("gc_reason", lit("pinned_by_revisit")))
  }

  /**
   * D34: streaming WET/WAT export — the live twin of [[writeMembers]]:
   * every micro-batch's records land as that batch's OWN `.warc.gz`
   * members under `batch_id=N/` (the D7 idempotency rule: member file
   * names derive from (batch, partition), so a checkpoint-replayed
   * batch rewrites byte-identical members instead of appending
   * duplicates), and the whole tree reads back through [[read]] —
   * partition discovery surfaces `batch_id` beside each member. The
   * caller picks the trigger/checkpoint and starts the query.
   */
  def streamMemberWriter(
      records: DataFrame, recordCol: String, outDir: String,
      prefix: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    records.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      writeMembers(batch, recordCol, s"$outDir/batch_id=$batchId", prefix)
    }

  /**
   * Write a column of WARC record bytes as gzip archive members, one
   * `.warc.gz` per non-empty partition — the layout [[read]] (and any
   * WARC consumer) expects, and the write parallelism 100 TB needs:
   * each task streams its own member, no driver collect, no
   * coordination beyond the per-file tmp→rename commit (task retries
   * and speculative attempts write attempt-unique tmp names and the
   * last rename wins with identical content). Caller controls member
   * sizing via the frame's partitioning.
   */
  def writeMembers(
      records: DataFrame, recordCol: String, outDir: String,
      prefix: String): Unit = {
    records.select(col(recordCol).cast("binary")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val conf = new org.apache.hadoop.conf.Configuration()
          val dir = new org.apache.hadoop.fs.Path(outDir)
          val f = dir.getFileSystem(conf)
          f.mkdirs(dir)
          val fin = new org.apache.hadoop.fs.Path(dir,
            f"$prefix-${tc.partitionId()}%05d.warc.gz")
          val tmp = new org.apache.hadoop.fs.Path(dir,
            s".${fin.getName}.${tc.taskAttemptId()}.tmp")
          val sep = "\r\n\r\n".getBytes("US-ASCII")
          val os = new java.util.zip.GZIPOutputStream(f.create(tmp, true))
          try it.foreach { r =>
            os.write(r.getAs[Array[Byte]](0)); os.write(sep)
          } finally os.close()
          // Commit by ATOMIC overwrite-rename (r17 verdict + r18
          // review): the old exists→delete→rename let two racing
          // attempts (speculation, zombie retry) interleave so one
          // deleted the other's committed member and died before its
          // own rename — member gone. FileContext.rename(OVERWRITE)
          // replaces in one FS operation: last writer wins with no
          // delete window, and re-running into a reused outDir with
          // CHANGED data still replaces the stale member (racing
          // attempts within one job write byte-identical bytes, so
          // which one lands is immaterial). Filesystems without a
          // FileContext binding fall back to first-writer-wins:
          // rename-refused-because-present is a successful commit —
          // keep the peer's member, drop our tmp.
          try {
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(
              fin.toUri, conf)
            fc.rename(tmp, fin, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          } catch {
            case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
              if (!f.rename(tmp, fin)) {
                require(f.exists(fin), s"member commit failed: $tmp -> $fin")
                f.delete(tmp, false)
                ()
              }
          }
        }
    }
  }
}
