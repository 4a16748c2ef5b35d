package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C86: perceptual image near-dedup — dHash over the synthetic edge
 * rasters (closed-form layout) + exact-then-near signature ownership. */
class ImageDedupSpec extends SparkSpec {

  import spark.implicits._

  /** The closed form the synthetic layout guarantees (and the DuckDB
   * oracle computes): bit (8y + p_y) per row y, edge p = id % 7 moved
   * to (p+3) % 7 in rows 6-7 for variants (id % 16 >= 14). */
  private def expectedHash(id: Long): Long = {
    val p = (id % 7).toInt
    val p2 = (p + 3) % 7
    val variant = id % 16 >= 14
    (0 until 8).map { y =>
      1L << (8 * y + (if (variant && y >= 6) p2 else p))
    }.sum
  }

  test("decode -> area-average -> luma -> dHash reproduces the closed form") {
    val ids = (0L to 20L).toDF("doc_id")
    val png = Multimodal.withSyntheticEdgePng(ids, "doc_id")
    val got = Multimodal.dHash(png, "img").select("doc_id", "dhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 20L).foreach { id => assert(got(id) == expectedHash(id), s"id $id") }
  }

  test("variant is hamming-4 from its base class, far from every other class") {
    assert(java.lang.Long.bitCount(expectedHash(14) ^ expectedHash(0)) == 4)
    assert(java.lang.Long.bitCount(expectedHash(14) ^ expectedHash(3)) == 12)
    // all 4 flipped bits live in the top 16-bit band -> banding recall
    // is exhaustive on this layout even at maxHamming 6
    assert(((expectedHash(14) ^ expectedHash(0)) >>> 48) != 0)
    assert(((expectedHash(14) ^ expectedHash(0)) & 0xffffffffffffL) == 0)
  }

  test("signatureOwners groups variants with their base, not across classes") {
    // ids 0..20: base classes p=0..6; variants ids 14 (p=0->3), 15 (p=1->4)
    val sig = (0L to 20L).map(id => (id, expectedHash(id))).toDF("doc_id", "dhash")
    val own = Dedup.signatureOwners(sig, "doc_id", "dhash", maxHamming = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(own(expectedHash(14)) == 0L) // variant joins base p=0 (rep id 0)
    assert(own(expectedHash(15)) == 1L) // variant joins base p=1 (rep id 1)
    assert(own(expectedHash(0)) == 0L)  // base classes own themselves
    assert(own(expectedHash(3)) == 3L)
    assert(own.size == 9)               // 7 base + 2 variant signatures
  }

  test("undecodable payloads hash to null, not a fake signature") {
    val df = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "img")
    val out = Multimodal.dHash(df, "img").select("dhash").collect()
    assert(out.head.isNullAt(0))
  }

  test("D21 streaming image near-dedup matches the closed-form band replay") {
    import graft.streaming.MediaDoc
    implicit val sqlCtx = spark.sqlContext
    val ids = (0L to 20L)
    val imgs = Multimodal.withSyntheticEdgePng(ids.toDF("doc_id"), "doc_id")
      .collect().map(r => MediaDoc(r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_.doc_id)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[MediaDoc]
    val verdicts = graft.streaming.LogStream.imageNearDupStream(mem.toDF(), "doc_id", "img")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val q = verdicts.writeStream.format("memory").queryName("d21spec")
        .outputMode("append").start()
      try imgs.grouped(7).foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }
      finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val got = spark.table("d21spec").groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.min("owner").as("owner"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // closed-form replay: owner = min id sharing ANY 16-bit band bucket
    val bandsOf = (id: Long) =>
      (0 until 4).map(b => (b, (expectedHash(id) >>> (16 * b)) & 0xffffL))
    val expected = ids.map { id =>
      val mine = bandsOf(id).toSet
      id -> ids.filter(o => bandsOf(o).exists(mine)).min
    }.toMap
    assert(got == expected)
    // the two variants resolve to their base class across batches
    assert(got(14L) == 0L && got(15L) == 1L)
  }
}
