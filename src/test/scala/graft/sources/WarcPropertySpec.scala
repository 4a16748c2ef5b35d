package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property tests for the C128/C129/C131 archive loop: on ARBITRARY
 * small fetch sets (tiny payload pool to force duplicate families,
 * null payloads, random liveness), the deduplicated archive must be
 * information-preserving — hydration reproduces the original per-fetch
 * view exactly — and GC must keep precisely the live∪pinned set with
 * no dangling revisit. Brute-force references are plain Scala over the
 * same fetch list. Fixed seeds so failures reproduce.
 */
class WarcPropertySpec extends SparkSpec {

  import spark.implicits._

  private val payloadPool = Vector(
    "alpha payload", "beta payload café", "alpha payload", "",
    "gamma unique-ish", null)

  /** Deterministic fetch set: (ord, url, payload, live). */
  private def fetches(seed: Long, n: Int): Seq[(Long, String, String, Boolean)] = {
    val g = Gen.listOfN(n, for {
      p <- Gen.oneOf(payloadPool)
      live <- Gen.oneOf(true, false)
    } yield (p, live))
    g.apply(Gen.Parameters.default, Seed(seed)).get.zipWithIndex.map {
      case ((p, live), i) => (i.toLong, s"http://x/$i", p, live)
    }
  }

  private def archive(rows: Seq[(Long, String, String, Boolean)]) = {
    val df = rows.toDF("ord", "url", "t", "live")
      .select(col("url"),
        concat(lit("<urn:uuid:"), col("ord").cast("string"), lit(">")).as("rid"),
        when(col("live"), "2026-02-01T00:00:00Z")
          .otherwise("2025-01-01T00:00:00Z").as("dt"),
        lit(200).as("st"), lit("text/plain").as("mi"),
        col("t").cast("binary").as("pl"), col("ord"))
    val recs = Warc.dedupArchive(df, "url", "rid", "dt", "st", "mi",
      "pl", "ord")
    // frame the emitted bytes back — the full write-side → read-side loop
    recs.select(explode(graft.functions.WarcRecords(col("rec"))).as("r"))
      .select(col("r.*"))
  }

  test("property: dedupArchive -> frame -> hydrate reproduces every fetch's payload") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val rows = fetches(7000 + seed, 40)
      val hyd = Warc.hydrateRevisits(archive(rows))
        .select(col("target_uri"), coalesce(col("payload"), lit("")).as("p"),
          col("hydrated"), col("digest_ok"))
        .collect()
      assert(hyd.length == rows.length, s"seed $seed row count")
      val got = hyd.map(r => r.getString(0) -> r.getString(1)).toMap
      val want = rows.map { case (_, url, p, _) =>
        url -> Option(p).getOrElse("")
      }.toMap
      assert(got == want, s"seed $seed payload mismatch")
      // every hydrated row's recorded digest verifies
      assert(hyd.filter(_.getBoolean(2)).forall(_.getBoolean(3)),
        s"seed $seed digest_ok")
      // exactly one owner per distinct payload family, and it is the
      // min-ord fetch of that family (brute-force reference)
      val owners = Warc.hydrateRevisits(archive(rows))
        .filter(col("warc_type") === "response")
        .select(col("record_id")).collect().map(_.getString(0)).toSet
      val wantOwners = rows.groupBy(r => Option(r._3).getOrElse(""))
        .values.map(_.minBy(_._1)).map(r => s"<urn:uuid:${r._1}>").toSet
      assert(owners == wantOwners, s"seed $seed owner set")
    }
  }

  test("property: gcArchive == brute-force live∪pinned; never dangles") {
    for (seed <- Seq(11L, 12L, 13L)) {
      val rows = fetches(9000 + seed, 40)
      val framed = archive(rows)
      val kept = Warc.gcArchive(framed, col("warc_date") >= "2026-01-01")
      // compare on target_uri: urls are unique per fetch, while a
      // REVISIT's record id is the operator's md5-derived rv- id
      val gotKept = kept.select(col("target_uri"), col("gc_reason"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      // brute-force reference over the fetch list
      val fam = rows.groupBy(r => Option(r._3).getOrElse(""))
      val live = rows.filter(_._4).map(_._2).toSet
      val pinned = fam.values.flatMap { members =>
        val o = members.minBy(_._1)
        val hasLiveRevisit = members.exists(m => m._1 != o._1 && m._4)
        if (!o._4 && hasLiveRevisit) Some(o._2) else None
      }.toSet
      assert(gotKept.keySet == (live ++ pinned), s"seed $seed keep set")
      assert(gotKept.filter(_._2 == "pinned_by_revisit").keySet == pinned,
        s"seed $seed pinned set")
      // invariant: hydration over the GC output never dangles
      val dangling = Warc.hydrateRevisits(kept)
        .filter(col("warc_type") === "revisit" && !col("hydrated")).count()
      assert(dangling == 0, s"seed $seed dangling revisits")
    }
  }
}
