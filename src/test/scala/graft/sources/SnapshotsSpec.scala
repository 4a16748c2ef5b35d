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
}
