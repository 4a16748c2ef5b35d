package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C85: cascading k-anonymity generalization (Privacy.kAnonymityLevels). */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  test("rows cascade to the first level reaching k, among failing rows only") {
    // k=2, ladder (a,b) -> (a):
    //  (x,1)x2  pass level 0 as group "x|1"
    //  (x,2)x1  fails level 0; alone at level 1 among x's FAILING rows
    //           (the two published (x,1) rows must not bulk it up) -> suppressed
    //  (y,1),(y,2) fail level 0; together they reach k at level 1 "y"
    val df = Seq(("x", 1), ("x", 1), ("x", 2), ("y", 1), ("y", 2)).toDF("a", "b")
    val out = Privacy.kAnonymityLevels(df, Seq(Seq(col("a"), col("b")), Seq(col("a"))), k = 2)
      .select("a", "b", "anon_level", "anon_key", "anon_k")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toSet
    assert(out == Set(
      ("x", 1, 0, "x|1", 2L),
      ("x", 2, 2, null, -1L),
      ("y", 1, 1, "y", 2L),
      ("y", 2, 1, "y", 2L)))
  }

  test("NULL QI values are distinct positions, never collapsed by concat_ws") {
    // r12 review finding: concat_ws skips nulls WITHOUT a separator,
    // so ("NY", null) and (null, "NY") both rendered "NY" and a fake
    // size-2 group got published although each true QI group is size 1
    val df = Seq(("NY", null: String), (null: String, "NY")).toDF("a", "b")
    val out = Privacy.kAnonymityLevels(df, Seq(Seq(col("a"), col("b"))), k = 2)
    assert(out.filter(col("anon_level") === 0).count() == 0) // both suppressed
    // and a genuinely duplicated null-bearing tuple still groups
    val dup = Seq(("NY", null: String), ("NY", null: String)).toDF("a", "b")
    val out2 = Privacy.kAnonymityLevels(dup, Seq(Seq(col("a"), col("b"))), k = 2)
      .select("anon_level", "anon_key", "anon_k").distinct().collect()
    assert(out2.length == 1 && out2.head.getInt(0) == 0 &&
      out2.head.getString(1) == "NY|<null>" && out2.head.getLong(2) == 2L)
  }

  test("k=1 publishes everything at the finest level") {
    val df = Seq(("x", 1), ("y", 2)).toDF("a", "b")
    val out = Privacy.kAnonymityLevels(df, Seq(Seq(col("a"), col("b"))), k = 1)
    assert(out.filter(col("anon_level") === 0).count() == 2)
  }

  test("plan is window-free: bounded aggregates, never PARTITION BY a QI key") {
    // r15 verdict: the count-over-Window ladder funneled the full row
    // frame through as few tasks as the COARSEST level has keys.
    val df = Seq(("x", 1), ("x", 1), ("y", 2)).toDF("a", "b")
    val out = Privacy.kAnonymityLevels(df, Seq(Seq(col("a"), col("b")), Seq(col("a"))), k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"kAnonymityLevels must not window:\n$plan")
  }

  test("empty ladder is rejected") {
    val df = Seq(("x", 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityLevels(df, Seq.empty, k = 2)
    }
  }
}
