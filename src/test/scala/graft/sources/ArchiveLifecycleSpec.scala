package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * C132: the PHYSICAL archive lifecycle (r18 verdict missing #1) —
 * versioned member trees through the claim/manifest/marker protocol,
 * GC that actually rewrites members, and batch-tree retention for the
 * streaming exports. The invariants pinned here:
 *  - publish → read round-trips records byte-exact, latest-by-marker;
 *  - gcPublishArchive's rewrite keeps survivor record ids/digests/
 *    payloads IDENTICAL (slice, not re-serialize) and hydration over
 *    the GC'd version never dangles;
 *  - readers pinned to the OLD version are unaffected by a GC publish,
 *    and Snapshots.vacuum (unchanged) retires the old member tree;
 *  - foldStreamArchive folds exactly the batches it listed and
 *    vacuumMemberBatches never touches batches above the fold
 *    watermark, regardless of age.
 */
class ArchiveLifecycleSpec extends SparkSpec {

  import spark.implicits._

  private def buildFetches(liveMod: Int = 3) = Seq(
    ("http://x/1", "payload X", 1L, "2025-01-01T00:00:00Z"),
    ("http://x/2", "payload X", 2L, "2026-02-01T00:00:00Z"),
    ("http://x/3", "payload Y", 3L, "2025-01-01T00:00:00Z"),
    ("http://x/4", "payload Y", 4L, "2025-01-01T00:00:00Z"),
    ("http://x/5", "payload Z", 5L, "2026-02-01T00:00:00Z"))
    .toDF("url", "t", "ord", "dt")
    .select(col("url"),
      concat(lit("<urn:uuid:"), col("ord").cast("string"), lit(">"))
        .as("rid"),
      col("dt"), lit(200).as("st"), lit("text/plain").as("mi"),
      col("t").cast("binary").as("pl"), col("ord"))

  test("C132: publishArchive + readArchive round-trip; latest resolves by marker") {
    val base = Files.createTempDirectory("graft_arcpub_").toFile.getAbsolutePath
    val recs = Warc.dedupArchive(buildFetches(), "url", "rid", "dt", "st",
      "mi", "pl", "ord")
    val v1 = Warc.publishArchive(recs.select(col("rec")), "rec", base,
      "arc", rows = 5L)
    assert(v1 == 1L)
    val back = Warc.readArchive(spark, base)
    assert(back.count() == 5)
    // protocol files are excluded from the binaryFile scan by the glob
    assert(back.select("warc_file").distinct().collect()
      .forall(_.getString(0).endsWith(".warc.gz")))
    // manifest carries the record count and kind=full (what
    // Snapshots.vacuum's chain logic reads)
    val m = Snapshots.manifest(spark, base, v1)
    assert(m.contains("\"rows\":5") && m.contains("\"kind\":\"full\""))
    assert(Snapshots.kindOf(spark, base, v1) == "full")
    // unpublished versions are unreadable
    intercept[IllegalArgumentException] {
      Warc.readArchive(spark, base, 99L)
    }
  }

  test("C132: gcPublishArchive rewrites survivors byte-exact; vacuum retires the old tree") {
    val base = Files.createTempDirectory("graft_arcgcp_").toFile.getAbsolutePath
    val recs = Warc.dedupArchive(buildFetches(), "url", "rid", "dt", "st",
      "mi", "pl", "ord")
    Warc.publishArchive(recs.select(col("rec")), "rec", base, "arc", 5L)
    // a reader pinned to v1 BEFORE the GC
    val pinned = Warc.readArchive(spark, base, 1L)
    val v2 = Warc.gcPublishArchive(spark, base,
      col("warc_date") >= "2026-01-01")
    assert(v2 == 2L)
    // survivors: live revisit /2 + its pinned owner /1 + live owner /5
    val kept = Warc.readArchive(spark, base) // latest = v2
    val byUri = kept.collect().map(r => r.getAs[String]("target_uri") ->
      ((r.getAs[String]("warc_type"), r.getAs[String]("record_id"),
        r.getAs[String]("payload")))).toMap
    assert(byUri.keySet == Set("http://x/1", "http://x/2", "http://x/5"))
    // byte-exact rewrite: ids and payloads survive unchanged
    assert(byUri("http://x/1") == (("response", "<urn:uuid:1>", "payload X")))
    assert(byUri("http://x/5") == (("response", "<urn:uuid:5>", "payload Z")))
    assert(byUri("http://x/2")._1 == "revisit")
    // hydration over the GC output never dangles
    val hyd = Warc.hydrateRevisits(kept)
    assert(hyd.filter(col("warc_type") === "revisit" && !col("hydrated"))
      .count() == 0)
    assert(hyd.filter(col("target_uri") === "http://x/2").head()
      .getAs[String]("payload") == "payload X")
    assert(hyd.filter(col("digest_ok") === false).count() == 0)
    // manifest rows = survivor count
    assert(Snapshots.manifest(spark, base, v2).contains("\"rows\":3"))
    // the pinned v1 reader is unaffected by the publish
    assert(pinned.count() == 5)
    // vacuum (unchanged Snapshots machinery) retires v1's member tree
    val (nPub, _) = Snapshots.vacuum(spark, base, keepLast = 1, minAgeMs = 0L)
    assert(nPub == 1)
    assert(!new java.io.File(s"$base/v=1").exists())
    assert(Warc.readArchive(spark, base).count() == 3) // v2 intact
  }

  test("C132: a member whose records are all GC'd emits no output member") {
    val base = Files.createTempDirectory("graft_arcempty_").toFile.getAbsolutePath
    // two partitions -> two members; one holds only expired records
    val fetches = buildFetches()
      .repartition(2, col("ord") >= 3) // members split by liveness-ish
    val recs = Warc.dedupArchive(fetches, "url", "rid", "dt", "st",
      "mi", "pl", "ord")
    Warc.publishArchive(recs.select(col("rec")), "rec", base, "arc", 5L)
    val v2 = Warc.gcPublishArchive(spark, base, col("warc_date") >= "2027-01-01")
    // nothing survives a future cutoff: the version publishes EMPTY
    assert(Warc.readArchive(spark, base, v2).count() == 0)
    assert(Snapshots.manifest(spark, base, v2).contains("\"rows\":0"))
  }

  test("C132: foldStreamArchive folds listed batches; vacuumMemberBatches spares later ones") {
    val streamDir = Files.createTempDirectory("graft_arcfold_").toFile.getAbsolutePath
    val base = Files.createTempDirectory("graft_arcfoldv_").toFile.getAbsolutePath
    def wet(n: Int) = Seq.tabulate(n)(i => (s"http://x/$i", s"text $i"))
      .toDF("uri", "text")
      .select(Warc.wetRecord(col("uri"), lit(null).cast("string"),
        lit("2026-01-01T00:00:00Z"), col("text")).as("rec"))
      .repartition(1)
    Warc.writeMembers(wet(2), "rec", s"$streamDir/batch_id=0", "wet")
    Warc.writeMembers(wet(3), "rec", s"$streamDir/batch_id=1", "wet")
    val (v, upto) = Warc.foldStreamArchive(spark, streamDir, base, "wet")
    assert(v == 1L && upto == 1L)
    val folded = Warc.readArchive(spark, base)
    assert(folded.count() == 5)
    // member names carry the batch id -> no collisions across batches
    assert(folded.select("warc_file").distinct().count() == 2)
    // a batch landing AFTER the fold listed its inputs
    Warc.writeMembers(wet(1), "rec", s"$streamDir/batch_id=2", "wet")
    val n = Warc.vacuumMemberBatches(spark, streamDir, upto, minAgeMs = 0L)
    assert(n == 2)
    assert(Warc.batchIds(spark, streamDir) == Seq(2L),
      "the post-fold batch must survive vacuum regardless of age")
    // and the next fold picks it up into the next version
    val (v2, upto2) = Warc.foldStreamArchive(spark, streamDir, base, "wet")
    assert(v2 == 2L && upto2 == 2L)
    assert(Warc.readArchive(spark, base, v2).count() == 1)
  }

  test("C132: foldStreamArchive on an empty tree is a no-op") {
    val streamDir = Files.createTempDirectory("graft_arcnone_").toFile.getAbsolutePath
    val base = Files.createTempDirectory("graft_arcnonev_").toFile.getAbsolutePath
    assert(Warc.foldStreamArchive(spark, streamDir, base) == ((-1L, -1L)))
    assert(Snapshots.latestVersion(spark, base) == -1L)
  }
}
