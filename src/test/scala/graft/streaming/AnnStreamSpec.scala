package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** D20: streaming IVF growth monitor (AnnStream.ivfGrowthMonitor). */
class AnnStreamSpec extends SparkSpec {

  import spark.implicits._

  test("growth events fire at power-of-two crossings, with state across batches") {
    implicit val sqlCtx = spark.sqlContext
    // two orthogonal seeds: vec_id 0 → cell 0 axis, vec_id 1 → cell 1 axis
    val seeds = Seq(
      (0L, Seq(10L, 0L)),
      (1L, Seq(0L, 10L))).toDF("vec_id", "qv")
    // 10 cell-0 vectors (even ids incl. seed 0) and 5 cell-1 vectors
    val cell0 = (Seq(0L) ++ (2L to 18L by 2L)).map(id => QueryVec(id, Seq(5L + id, 0L)))
    val cell1 = (Seq(1L) ++ (3L to 9L by 2L)).map(id => QueryVec(id, Seq(0L, 5L + id)))
    val all = (cell0 ++ cell1).sortBy(_.vec_id)
    val mem = MemoryStream[QueryVec]
    val events = AnnStream.ivfGrowthMonitor(mem.toDF(), seeds, "vec_id", "qv", nSeeds = 2)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val q = events.writeStream.format("memory").queryName("d20spec")
        .outputMode("append").start()
      // 3 sorted chunks: crossings must span batch boundaries correctly
      try all.grouped(6).foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }
      finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    val got = spark.table("d20spec").orderBy("cell", "level")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // cell 0 members in vec_id order: 0,2,4,...,18 → crossings at the
    // 2nd (id 2), 4th (id 6), 8th (id 14) arrivals; cell 1 members
    // 1,3,5,7,9 → crossings at the 2nd (id 3) and 4th (id 7)
    assert(got == Seq(
      (0, 2L, 2L), (0, 4L, 6L), (0, 8L, 14L),
      (1, 2L, 3L), (1, 4L, 7L)))
  }

  test("under-seeded monitor is rejected (nominal nSeeds contract, as in ivfAudit)") {
    implicit val sqlCtx = spark.sqlContext
    val seeds = Seq((0L, Seq(10L, 0L))).toDF("vec_id", "qv")
    val mem = MemoryStream[QueryVec]
    intercept[IllegalArgumentException] {
      AnnStream.ivfGrowthMonitor(mem.toDF(), seeds, "vec_id", "qv", nSeeds = 2)
    }
  }
}
