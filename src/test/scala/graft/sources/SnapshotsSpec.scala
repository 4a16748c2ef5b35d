package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C122: atomic versioned snapshot publishing (Snapshots). */
class SnapshotsSpec extends SparkSpec {

  import spark.implicits._

  private def freshBase(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_snap_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("versions are immutable, ordered, and time-travelable") {
    val base = freshBase()
    assert(Snapshots.latestVersion(spark, base) == -1L)
    val v1 = Snapshots.publish(Seq((1L, "a")).toDF("id", "s"), base)
    val v2 = Snapshots.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), base)
    assert(v1 == 1L && v2 == 2L)
    assert(Snapshots.latestVersion(spark, base) == 2L)
    assert(Snapshots.read(spark, base).count() == 2)
    assert(Snapshots.read(spark, base, v1).count() == 1) // time travel
  }

  test("a crashed writer (dir without marker) is INVISIBLE; next publish skips its slot") {
    val base = freshBase()
    Snapshots.publish(Seq((1L, "a")).toDF("id", "s"), base)
    // simulate an in-flight/crashed v=2: parquet present, no marker
    Seq((9L, "half")).toDF("id", "s").write.parquet(s"$base/v=2")
    assert(Snapshots.latestVersion(spark, base) == 1L,
      "unpublished version must be invisible")
    assert(Snapshots.read(spark, base).count() == 1)
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, base, 2L) // pinned read of unpublished fails
    }
    // the retry publishes the NEXT slot, never overwriting the corpse
    val v3 = Snapshots.publish(Seq((1L, "a"), (3L, "c")).toDF("id", "s"), base)
    assert(v3 == 3L && Snapshots.read(spark, base).count() == 2)
  }

  test("empty base reads fail loudly") {
    val base = freshBase()
    intercept[IllegalArgumentException] { Snapshots.read(spark, base) }
  }

  test("racing publishers land in DISTINCT slots (claim collision walks forward)") {
    val base = freshBase()
    Snapshots.publish(Seq((1L, "a")).toDF("id", "s"), base)
    // simulate publisher B having just CLAIMED slot 2 (the exact
    // window of r16 verdict #4: both publishers computed next=2)
    val f = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.create(new org.apache.hadoop.fs.Path(s"$base/v=2/_CLAIM"), false).close()
    // publisher A's claim of 2 must LOSE and walk to 3
    assert(Snapshots.claimSlot(spark, base, 2L) == 3L)
    // a claimed-but-uncommitted slot stays invisible to readers
    assert(Snapshots.latestVersion(spark, base) == 1L)
    intercept[IllegalArgumentException] { Snapshots.read(spark, base, 2L) }
    // and a full publish now lands in slot 4 (2 claimed, 3 claimed)
    val v = Snapshots.publish(Seq((2L, "b")).toDF("id", "s"), base)
    assert(v == 4L && Snapshots.read(spark, base, 4L).count() == 1)
  }

  test("manifest carries rows/schema/digest + data-card stats; verified read passes") {
    val base = freshBase()
    val df = Seq((1L, "web", 10L), (2L, "web", 20L), (3L, "book", 5L))
      .toDF("id", "source", "tokens")
    Snapshots.publish(df, base, statsCols = Seq("source"),
      sumCols = Seq("tokens"))
    val m = Snapshots.manifest(spark, base)
    assert(m.contains("\"rows\":3"))
    assert(m.contains("\"schema\":\"id BIGINT,source STRING,tokens BIGINT\""))
    assert(m.contains("\"v\":\"book\",\"rows\":1,\"sums\":{\"tokens\":5}"))
    assert(m.contains("\"v\":\"web\",\"rows\":2,\"sums\":{\"tokens\":30}"))
    // verify recomputes rows+digest against the data — must pass on
    // untampered bytes, and the digest is row-order independent
    assert(Snapshots.read(spark, base, verify = true).count() == 3)
  }

  test("digest mismatch REJECTS the read (tampered manifest)") {
    val base = freshBase()
    Snapshots.publish(Seq((1L, "a")).toDF("id", "s"), base)
    val p = new org.apache.hadoop.fs.Path(s"$base/v=1/_MANIFEST")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    // flip the digest: the data no longer matches what the card claims
    val bad = txt.replaceAll("\"digest\":\"-?\\d+\"", "\"digest\":\"12345\"")
    assert(bad != txt)
    f.delete(p, false)
    val out = f.create(p, false)
    try out.write(bad.getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalArgumentException] {
      Snapshots.read(spark, base, verify = true)
    }
    assert(e.getMessage.contains("FAILED verification"))
    // unverified reads still work — verification is the caller's call
    assert(Snapshots.read(spark, base).count() == 1)
  }

  test("D33: streaming publication survives kill-and-resume; final version digest-matches the batch publish") {
    val base = freshBase()
    val root = java.nio.file.Files.createTempDirectory("graft_d33spec_").toFile
    root.deleteOnExit()
    val src = new java.io.File(root, "src").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val all = (1L to 40L).map(i => (i, s"s${i % 3}", i * 10))
    def writeChunk(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("id", "source", "tokens").coalesce(1)
        .write.mode("append").parquet(src)
    def run(): Unit = {
      val sch = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/part-*")
      val q = Snapshots.publishStream(stream, base, ckpt, everyBatches = 2,
          statsCols = Seq("source"), sumCols = Seq("tokens"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // phase 1: two files → batches 0,1 → one published version (rows 1..20)
    writeChunk(all.take(10)); writeChunk(all.slice(10, 20))
    run()
    val v1 = Snapshots.latestVersion(spark, base)
    assert(v1 == 1L)
    assert(Snapshots.read(spark, base, verify = true).count() == 20)
    // "kill": the query is down while new data arrives; "resume" reuses
    // the SAME checkpoint, so only the two new files are ingested —
    // batches 2,3 → the next version holds the cumulative 40 rows
    writeChunk(all.slice(20, 30)); writeChunk(all.slice(30, 40))
    run()
    assert(Snapshots.latestVersion(spark, base) == 2L)
    val streamed = Snapshots.read(spark, base, verify = true)
    assert(streamed.count() == 40)
    // epoch versions stay time-travelable (immutable mid-ingest reads)
    assert(Snapshots.read(spark, base, 1L).count() == 20)
    // and the final version is INDISTINGUISHABLE from a batch publish
    // of the same data: identical manifest digest (order-independent)
    val batchBase = freshBase()
    Snapshots.publish(all.toDF("id", "source", "tokens"), batchBase,
      statsCols = Seq("source"), sumCols = Seq("tokens"))
    def dig(b: String) =
      "\"digest\":\"(-?\\d+)\"".r.findFirstMatchIn(Snapshots.manifest(spark, b))
        .get.group(1)
    assert(dig(base) == dig(batchBase))
  }

  test("dedup against a PINNED version is repeatable while HEAD moves (daily-crawl shape)") {
    // the audit contract: running today's crawl against snapshot v=N
    // twice gives BIT-IDENTICAL results even though the corpus has
    // moved to v=N+1 in between — impossible against a mutable frame
    val base = freshBase()
    val v1docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val vN = Snapshots.publish(v1docs, base)
    val crawl = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // dup of doc 1
      (11L, "completely novel content here")).toDF("doc_id", "text")
    def audit() = graft.operators.Dedup.incrementalNearDup(
      Snapshots.read(spark, base, vN), crawl, "doc_id", "text",
      numHashes = 16, bands = 4)
      .orderBy("new_id").collect().toSeq
    val run1 = audit()
    // HEAD moves: v=N+1 adds a doc that WOULD match crawl doc 11
    Snapshots.publish(
      v1docs.unionAll(Seq((3L, "completely novel content here"))
        .toDF("doc_id", "text")), base)
    val run2 = audit()
    assert(run1 == run2, "pinned-version audit must be repeatable")
    // and the same crawl against LATEST sees the new corpus state
    val latest = graft.operators.Dedup.incrementalNearDup(
      Snapshots.read(spark, base), crawl, "doc_id", "text",
      numHashes = 16, bands = 4).collect().toSeq
    assert(latest != run1, "latest-version audit must see v=N+1")
  }

  test("C125: manifest diff is metadata-only and handles one-sided values") {
    val base = freshBase()
    Snapshots.publish(Seq((1L, "web", 10L), (2L, "book", 5L))
      .toDF("id", "source", "tokens"), base, Seq("source"), Seq("tokens"))
    Snapshots.publish(Seq((1L, "web", 10L), (3L, "web", 7L), (4L, "wiki", 2L))
      .toDF("id", "source", "tokens"), base, Seq("source"), Seq("tokens"))
    val diff = Snapshots.diffManifests(spark, base, 1L, 2L, "source")
    val d = diff.orderBy("value").collect()
    // book removed (1 → 0), web grew (1 → 2), wiki added (0 → 1)
    assert(d.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("book", 1L, 0L, -1L), ("web", 1L, 2L, 1L), ("wiki", 0L, 1L, 1L)))
    // sums ride the same card: web tokens 10 → 17
    val web = d.find(_.getString(0) == "web").get
    assert(web.getMap[String, java.math.BigDecimal](4)("tokens")
      .longValue == 10L)
    assert(web.getMap[String, java.math.BigDecimal](5)("tokens")
      .longValue == 17L)
    // the point: ZERO data I/O — no parquet scan anywhere in the plan
    assert(!diff.queryExecution.executedPlan.toString.contains("Scan parquet"))
  }

  test("C126: vacuum keeps the newest k published, deletes old+corpses, spares in-flight slots") {
    val base = freshBase()
    val f = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Snapshots.publish(Seq((1L, "a")).toDF("id", "s"), base) // v1
    Snapshots.publish(Seq((2L, "b")).toDF("id", "s"), base) // v2
    // dead corpse at slot 3 (dir, no marker), then v4 publishes past it
    Seq((9L, "x")).toDF("id", "s").write.parquet(s"$base/v=3")
    Snapshots.publish(Seq((3L, "c")).toDF("id", "s"), base) // v4
    // in-flight claim ABOVE the newest published slot — must survive
    f.create(new org.apache.hadoop.fs.Path(s"$base/v=5/_CLAIM"), false)
      .close()
    // leftover stage dir
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$base/.stage-999-dead"))
    val (nPub, nGarbage) = Snapshots.vacuum(spark, base, keepLast = 1,
      minAgeMs = 0L)
    assert((nPub, nGarbage) == (2, 2)) // v1+v2; corpse v3 + stage dir
    assert(Snapshots.latestVersion(spark, base) == 4L)
    assert(Snapshots.read(spark, base, verify = true).count() == 1)
    intercept[IllegalArgumentException] { Snapshots.read(spark, base, 1L) }
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$base/v=5/_CLAIM")),
      "in-flight claim above latest must survive vacuum")
    // a fresh corpse younger than minAge survives (slow-publisher rule)
    Seq((8L, "y")).toDF("id", "s").write.parquet(s"$base/v=0")
    val (p2, g2) = Snapshots.vacuum(spark, base, keepLast = 1,
      minAgeMs = 60L * 60 * 1000)
    assert((p2, g2) == (0, 0))
    // idempotent at age 0: the young corpse now deletable
    val (p3, g3) = Snapshots.vacuum(spark, base, keepLast = 1, minAgeMs = 0L)
    assert((p3, g3) == (0, 1))
  }

  test("C127: delta chain reads, compaction digest equality, delta-aware vacuum") {
    val base = freshBase()
    val full = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val d1 = Seq((3L, "c")).toDF("id", "s")
    val d2 = Seq((4L, "d")).toDF("id", "s")
    // a delta with no base must refuse
    intercept[IllegalArgumentException] {
      Snapshots.publishDelta(d1, freshBase())
    }
    Snapshots.publish(full, base)       // v1 full
    Snapshots.publishDelta(d1, base)    // v2 delta
    Snapshots.publishDelta(d2, base)    // v3 delta
    assert(Snapshots.kindOf(spark, base, 1L) == "full")
    assert(Snapshots.kindOf(spark, base, 2L) == "delta")
    // readAt materializes full + deltas up to the pinned version
    assert(Snapshots.readAt(spark, base, 2L).count() == 3)
    assert(Snapshots.readAt(spark, base, verify = true).count() == 4)
    // row-level provenance: which publication introduced each row
    val prov = Snapshots.readAt(spark, base, withVersion = true)
      .orderBy("id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("__snapshot_version"))
    assert(prov.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // read() still reads ONE version's own rows (the delta alone)
    assert(Snapshots.read(spark, base, 2L).count() == 1)
    // vacuum must NOT retire v1: the kept delta chain depends on it
    val (p0, _) = Snapshots.vacuum(spark, base, keepLast = 2, minAgeMs = 0L)
    assert(p0 == 0 && Snapshots.readAt(spark, base).count() == 4)
    // compaction folds the chain into one full whose digest equals a
    // direct full publish of the same rows (commutative-sum property)
    val cv = Snapshots.compact(spark, base)
    assert(Snapshots.kindOf(spark, base, cv) == "full")
    val direct = freshBase()
    Snapshots.publish(full.unionByName(d1).unionByName(d2), direct)
    def dig(b: String, v: Long) =
      "\"digest\":\"(-?\\d+)\"".r
        .findFirstMatchIn(Snapshots.manifest(spark, b, v)).get.group(1)
    assert(dig(base, cv) == dig(direct, 1L))
    // post-compaction vacuum retires the whole chain
    val (p1, _) = Snapshots.vacuum(spark, base, keepLast = 1, minAgeMs = 0L)
    assert(p1 == 3 && Snapshots.readAt(spark, base).count() == 4)
    intercept[IllegalArgumentException] { Snapshots.readAt(spark, base, 2L) }
  }

  test("D35: streaming delta publication — O(batch) epochs, replay-idempotent, compacts on schedule") {
    val base = freshBase()
    val root = java.nio.file.Files.createTempDirectory("graft_d35spec_").toFile
    root.deleteOnExit()
    val src = new java.io.File(root, "src").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val all = (1L to 40L).map(i => (i, s"s${i % 3}", i * 10))
    def writeChunk(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("id", "source", "tokens").coalesce(1)
        .write.mode("append").parquet(src)
    def run(): Unit = {
      val sch = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/part-*")
      val q = Snapshots.publishStreamDelta(stream, base, ckpt,
          compactEvery = 2, statsCols = Seq("source"),
          sumCols = Seq("tokens"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // phase 1: batch 0 → full (the base), batch 1 → delta, then the
    // scheduled compaction folds them
    writeChunk(all.take(10)); writeChunk(all.slice(10, 20))
    run()
    assert(Snapshots.kindOf(spark, base, 1L) == "full")
    assert(Snapshots.kindOf(spark, base, 2L) == "delta")
    assert(Snapshots.taggedVersion(spark, base, "compact:1").contains(3L))
    assert(Snapshots.readAt(spark, base, verify = true).count() == 20)
    // inbox retention (r17 verdict #2): batches 0,1 are folded into
    // compact:1 — vacuumInbox retires batch 0 but SPARES batch 1: the
    // max inbox batch is excluded regardless of age (r18 advice #5 —
    // only the newest batch can be mid-replay, and the mtime guard
    // alone races a slow replay at minAgeMs=0). readAt is unchanged;
    // the checkpoint, not the inbox, is the replay source of truth.
    assert(Snapshots.vacuumInbox(spark, base, minAgeMs = 0L) == 1)
    def inboxDirs() = new java.io.File(s"$base/.inbox")
      .listFiles(_.isDirectory).map(_.getName).sorted.toSeq
    assert(inboxDirs() == Seq("batch_id=1"))
    assert(Snapshots.readAt(spark, base, verify = true).count() == 20)
    // kill + new data + resume: only new files become batches 2,3
    writeChunk(all.slice(20, 30)); writeChunk(all.slice(30, 40))
    run()
    // post-resume inbox: the spared batch 1 plus the new batches
    assert(inboxDirs() == Seq("batch_id=1", "batch_id=2", "batch_id=3"))
    assert(Snapshots.readAt(spark, base, verify = true).count() == 40)
    assert(Snapshots.taggedVersion(spark, base, "compact:3").isDefined)
    // a second vacuum (newer batches now exist) reclaims the
    // previously spared batch 1 and the folded batch 2; batch 3 is
    // the new max and survives
    assert(Snapshots.vacuumInbox(spark, base, minAgeMs = 0L) == 2)
    assert(inboxDirs() == Seq("batch_id=3"))
    // the final compacted corpus digest-matches a direct batch publish
    val direct = freshBase()
    Snapshots.publish(all.toDF("id", "source", "tokens"), direct)
    def dig(b: String, v: Long) =
      "\"digest\":\"(-?\\d+)\"".r
        .findFirstMatchIn(Snapshots.manifest(spark, b, v)).get.group(1)
    assert(dig(base, Snapshots.latestVersion(spark, base)) ==
      dig(direct, 1L))
    // replay-idempotency: a crash between publish and offset commit
    // replays the batch — the tag guard must skip, never double rows
    val before = Snapshots.latestVersion(spark, base)
    val replay = Snapshots.publishBatchDelta(spark, base,
      s"$base/.inbox/batch_id=3", 3L, Seq("source"), Seq("tokens"))
    assert(replay.isEmpty)
    assert(Snapshots.latestVersion(spark, base) == before)
    assert(Snapshots.readAt(spark, base).count() == 40)
  }

  test("vacuum spares the replayable batch-tag carrier; folded tags still drop") {
    // r17 advice #4: the version holding batch:N's tag (N >= newest
    // compaction) is the ONLY thing standing between a crash-replay of
    // batch N and double-counted rows — vacuum must not retire it.
    val base = freshBase()
    Snapshots.publish(Seq((1L, "a")).toDF("id", "s"), base,
      tag = Some("batch:0"))                                   // v1 full
    Snapshots.publish(Seq((2L, "b")).toDF("id", "s"), base,
      kind = "delta", tag = Some("batch:1"))                   // v2 delta
    Snapshots.compact(spark, base, tag = Some("compact:1"))    // v3 full
    Snapshots.publish(Seq((3L, "c")).toDF("id", "s"), base,
      kind = "delta", tag = Some("batch:2"))                   // v4 delta
    val (p, _) = Snapshots.vacuum(spark, base, keepLast = 1, minAgeMs = 0L)
    // droppable below the compact: v1 (batch:0 — folded AND its batch
    // can never replay) and v2 (batch:1 — the newest-compacted batch,
    // whose replay-skip still needs the tag) → only v1 goes
    assert(p == 1)
    assert(Snapshots.taggedVersion(spark, base, "batch:1").contains(2L))
    assert(Snapshots.taggedVersion(spark, base, "batch:0").isEmpty)
    assert(Snapshots.readAt(spark, base).count() == 3)
  }

  test("tags containing quotes round-trip through the manifest parse") {
    val base = freshBase()
    val tag = """epoch "42" \ final"""
    val v = Snapshots.publish(Seq((1L, "a")).toDF("id", "s"), base,
      tag = Some(tag))
    assert(Snapshots.taggedVersion(spark, base, tag).contains(v))
    assert(Snapshots.tagOf(spark, base, v).contains(tag))
  }

  test("delta-chain schema evolution: widening reads back with nulls, conflicts throw typed") {
    val base = freshBase()
    Snapshots.publish(Seq((1L, "a")).toDF("id", "s"), base)
    // widened delta: adds lang
    Snapshots.publishDelta(Seq((2L, "b", "en")).toDF("id", "s", "lang"), base)
    val rows = Snapshots.readAt(spark, base, verify = true)
      .orderBy("id").collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(rows(0).isNullAt(rows(0).fieldIndex("lang")) &&
      rows(1).getAs[String]("lang") == "en")
    // narrower delta (omits lang) is fine too; its own lang reads null
    Snapshots.publishDelta(Seq((3L, "c")).toDF("id", "s"), base)
    val r3 = Snapshots.readAt(spark, base).filter($"id" === 3L).head()
    assert(r3.isNullAt(r3.fieldIndex("lang")))
    // type conflict on a shared name (even one introduced by a DELTA)
    // throws the typed error before staging anything
    intercept[Snapshots.SnapshotSchemaMismatch] {
      Snapshots.publishDelta(Seq((4L, "d", 7L)).toDF("id", "s", "lang"), base)
    }
    intercept[Snapshots.SnapshotSchemaMismatch] {
      Snapshots.publishDelta(Seq(("x", "e")).toDF("id", "s"), base)
    }
    // the STREAMING delta path holds the same contract (r18 review):
    // a restarted stream whose pipeline retyped a shared column must
    // fail typed, not publish a silently-widening delta
    val bdir = java.nio.file.Files.createTempDirectory("graft_schema_b")
      .toString + "/b"
    Seq((9L, "x", 1.5)).toDF("id", "s", "lang").write.parquet(bdir)
    intercept[Snapshots.SnapshotSchemaMismatch] {
      Snapshots.publishBatchDelta(spark, base, bdir, 99L, Nil, Nil,
        skipTagProbe = true)
    }
    // compaction folds the widened chain into one full with the union
    // schema; subsequent deltas check against THAT
    val cv = Snapshots.compact(spark, base)
    assert(Snapshots.schemaOf(spark, base, cv).fieldNames.toSet ==
      Set("id", "s", "lang"))
    assert(Snapshots.readAt(spark, base).count() == 3)
  }

  test("digest is duplicate-sensitive: doubling a row changes it") {
    // xor-style digests cancel identical row pairs; the manifest must
    // distinguish a snapshot from one with a duplicated row
    val base1 = freshBase(); val base2 = freshBase()
    Snapshots.publish(Seq((1L, "a")).toDF("id", "s"), base1)
    Snapshots.publish(Seq((1L, "a"), (1L, "a")).toDF("id", "s"), base2)
    def dig(b: String) =
      "\"digest\":\"(-?\\d+)\"".r.findFirstMatchIn(Snapshots.manifest(spark, b))
        .get.group(1)
    assert(dig(base1) != dig(base2))
  }
}
