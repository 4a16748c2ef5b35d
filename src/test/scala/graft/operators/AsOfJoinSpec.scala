package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: latest build row at-or-before each probe row,
 * per key, with left (NULL-preserving) behavior — the shape of DuckDB's
 * `ASOF JOIN p ON p.k = b.k AND p.t >= b.t`. */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private val build = Seq(
    ("a", 10L, 100),
    ("a", 20L, 200),
    ("a", 30L, 300),
    ("b", 15L, 150)
  ).toDF("k", "bt", "price")

  private val probe = Seq(
    ("a", 5L),  // before any build row → NULL
    ("a", 10L), // equal time → matched when inclusive
    ("a", 25L), // between 20 and 30 → 20
    ("a", 99L), // after all → 30
    ("b", 15L),
    ("c", 50L)  // key with no build rows → NULL
  ).toDF("k", "pt")

  test("inclusive matches the latest build time <= probe time per key") {
    val out = AsOfJoin
      .asOf(probe, build, Seq("k"), "pt", "bt", Seq("price"))
      .orderBy("k", "pt")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.toString).orNull,
        Option(r.get(3)).map(_.toString).orNull))
    assert(out.toSeq == Seq(
      ("a", 5L, null, null),
      ("a", 10L, "10", "100"),
      ("a", 25L, "20", "200"),
      ("a", 99L, "30", "300"),
      ("b", 15L, "15", "150"),
      ("c", 50L, null, null)))
  }

  test("strict (<) excludes equal-time build rows") {
    val out = AsOfJoin
      .asOf(probe, build, Seq("k"), "pt", "bt", Seq("price"), inclusive = false)
      .filter(col("k") === "a" && col("pt") === 10L)
      .collect()
    assert(out.length == 1 && out.head.isNullAt(2) && out.head.isNullAt(3))
    // but a strictly-later probe still sees it
    val later = AsOfJoin
      .asOf(probe, build, Seq("k"), "pt", "bt", Seq("price"), inclusive = false)
      .filter(col("k") === "a" && col("pt") === 25L)
      .collect()
    assert(later.head.getLong(2) == 20L)
  }

  test("probe columns pass through unchanged and attached columns take the prefix") {
    val p2 = probe.withColumn("payload", concat(col("k"), lit("#"), col("pt")))
    val out = AsOfJoin.asOf(p2, build, Seq("k"), "pt", "bt", Seq("price"), prefix = "x_")
    assert(out.columns.toSeq == Seq("k", "pt", "payload", "x_bt", "x_price"))
    val row = out.filter(col("pt") === 99L).collect().head
    assert(row.getAs[String]("payload") == "a#99" && row.getAs[Int]("x_price") == 300)
  }

  test("matches a per-key window reference on random data") {
    val rnd = new scala.util.Random(11)
    val b = Seq.tabulate(300)(i => (s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i))
      .distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // one row per (k, t)
      .toDF("k", "bt", "v")
    val p = Seq.fill(500)((s"k${rnd.nextInt(10)}", rnd.nextInt(1100).toLong))
      .distinct.toDF("k", "pt") // distinct: the naive reference groups by (k, pt)
    val got = AsOfJoin.asOf(p, b, Seq("k"), "pt", "bt", Seq("v"))
      .groupBy("k").agg(sum("asof_v").as("s"), count(lit(1)).as("n"))
    // reference: non-equi join + max, the O(n^2) definition
    val ref = p.as("p").join(b.as("b"),
        col("p.k") === col("b.k") && col("b.bt") <= col("p.pt"), "left")
      .groupBy(col("p.k").as("k"), col("p.pt").as("pt"))
      .agg(max_by(col("b.v"), col("b.bt")).as("v"))
      .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    assert(got.orderBy("k").collect().toSeq == ref.orderBy("k").collect().toSeq)
  }
}
