package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sort-based exact quantile specs: matches the built-in percentile
 * aggregate (same percentile_cont interpolation) without its
 * single-reducer value map. */
class ExactQuantilesSpec extends SparkSpec {

  import spark.implicits._

  test("matches built-in percentile on a known sequence") {
    val df = (1 to 1001).map(_.toDouble).toDF("v")
    val got = ExactQuantiles.of(df, "v", Seq(0.0, 0.25, 0.5, 0.9, 1.0)).toMap
    assert(got(0.0) == 1.0 && got(1.0) == 1001.0)
    assert(got(0.5) == 501.0)
    assert(got(0.25) == 251.0 && got(0.9) == 901.0)
  }

  test("interpolates between ranks exactly like percentile_cont") {
    val df = Seq(10.0, 20.0, 30.0, 40.0).toDF("v")
    val got = ExactQuantiles.of(df, "v", Seq(0.5, 0.33)).toMap
    assert(got(0.5) == 25.0) // rank 1.5 → 20 + 0.5*(30-20)
    val builtin = Seq(10.0, 20.0, 30.0, 40.0).toDF("v")
      .agg(expr("percentile(v, 0.33)")).first().getDouble(0)
    assert(math.abs(got(0.33) - builtin) < 1e-9)
  }

  test("random data agrees with the built-in aggregate at several fractions") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(5000)(rnd.nextDouble() * 1000)
    val df = data.toDF("v").repartition(8)
    val fracs = Seq(0.1, 0.5, 0.95, 0.99)
    val got = ExactQuantiles.of(df, "v", fracs).toMap
    val builtin = df.agg(expr(s"percentile(v, array(${fracs.mkString(",")}))"))
      .first().getSeq[Double](0)
    fracs.zip(builtin).foreach { case (f, b) => assert(math.abs(got(f) - b) < 1e-6) }
  }

  test("nulls are ignored and empty input yields NaN") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0)).toDF("v")
    assert(ExactQuantiles.of(df, "v", Seq(0.5)).head._2 == 2.0)
    val empty = Seq.empty[Double].toDF("v")
    assert(ExactQuantiles.of(empty, "v", Seq(0.5)).head._2.isNaN)
  }

  test("byGroup == brute-force discrete quantiles, groups spanning partitions") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 2000).map { i =>
      val g = s"g${i % 3}"
      (g, rnd.nextInt(1000).toDouble)
    }
    val fracs = Seq(0.0, 0.5, 0.9, 0.99, 1.0)
    val out = ExactQuantiles.byGroup(rows.toDF("k", "v").repartition(16), "k", "v", fracs)
      .collect().map(r => ((r.getString(0), r.getDouble(1)), r.getDouble(2))).toMap
    rows.groupBy(_._1).foreach { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      fracs.foreach { f =>
        val want = sorted(math.floor((sorted.length - 1) * f).toInt)
        assert(out((g, f)) == want, s"group=$g f=$f")
      }
    }
  }

  test("byGroup: single-element groups return that element at every fraction") {
    val df = Seq(("a", 5.0), ("b", 7.0)).toDF("k", "v")
    val out = ExactQuantiles.byGroup(df, "k", "v", Seq(0.0, 0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(out == Set(("a", 5.0), ("b", 7.0)))
  }

  test("byGroup preserves the original group-key type (integer keys stay integers)") {
    val df = Seq((10L, 1.0), (10L, 3.0), (20L, 8.0)).toDF("k", "v")
    val out = ExactQuantiles.byGroup(df, "k", "v", Seq(0.0, 1.0))
    assert(out.schema("k").dataType == org.apache.spark.sql.types.LongType)
    val got = out.collect().map(r => ((r.getLong(0), r.getDouble(1)), r.getDouble(2))).toMap
    assert(got == Map(
      ((10L, 0.0), 1.0), ((10L, 1.0), 3.0),
      ((20L, 0.0), 8.0), ((20L, 1.0), 8.0)))
  }
}
