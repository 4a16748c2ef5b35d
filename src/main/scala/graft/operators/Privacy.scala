package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * C85: privacy auditing for training corpora — cascading k-anonymity
 * generalization (the Sweeney 2002 model, cascaded like Mondrian-style
 * local recoding: rows whose quasi-identifier group is smaller than k
 * at the finest level re-group AMONG THEMSELVES at the next coarser
 * level, because already-published finer groups can't bulk up coarser
 * ones) plus the l-diversity read (distinct sensitive values per
 * published group) the caller derives from the output.
 *
 * Scale shape: ONE pass, no self-joins, no unions — level-i membership
 * is a conditional window count (`count(CASE WHEN all finer levels
 * failed THEN 1 END) OVER (PARTITION BY key_i)`), so the whole cascade
 * is |ladder| window shuffles over progressively-coarser keys and the
 * plan never re-reads the input. Deterministic: counts and string keys
 * only, no floats.
 */
object Privacy {

  /** Separator for the published generalization key (printable '|' —
   * callers pick QI columns whose rendered values can't contain it,
   * nor equal [[NullToken]]). */
  private val Sep = "|"

  /** Rendering for a NULL QI value. concat_ws SKIPS nulls without a
   * separator, so (\"NY\", NULL) and (NULL, \"NY\") would otherwise
   * collapse into one key and overcount group sizes — a k-anonymity
   * audit must treat NULL as a distinct value at its position, never
   * merge distinct quasi-identifier tuples (r12 review finding). */
  private val NullToken = "<null>"

  /**
   * Assign each row the FIRST generalization level whose
   * quasi-identifier group (among rows that failed every finer level)
   * reaches size `k`; rows failing the whole ladder get level
   * `ladder.length` (suppressed) and a NULL key. Appends:
   * `anon_level` (int), `anon_key` (the published generalized QI
   * rendering, NULL when suppressed), `anon_k` (the assigned group's
   * size, NULL when suppressed).
   */
  def kAnonymityLevels(
      df: DataFrame,
      ladder: Seq[Seq[Column]],
      k: Long): DataFrame = {
    require(ladder.nonEmpty, "k-anonymity needs at least one generalization level")
    require(k >= 1, s"k must be >= 1, got $k")
    val keyed = ladder.zipWithIndex.foldLeft(df) { case (acc, (cols, i)) =>
      acc.withColumn(s"__key$i", concat_ws(Sep,
        cols.map(c => coalesce(c.cast("string"), lit(NullToken))): _*))
    }
    val counted = ladder.indices.foldLeft(keyed) { case (acc, i) =>
      val failedFiner = (0 until i)
        .map(j => col(s"__k$j") < k)
        .reduceOption(_ && _)
        .getOrElse(lit(true))
      acc.withColumn(s"__k$i",
        count(when(failedFiner, 1)).over(Window.partitionBy(col(s"__key$i"))))
    }
    val level = ladder.indices.foldRight(lit(ladder.length): Column) { case (i, other) =>
      when(col(s"__k$i") >= k, i).otherwise(other)
    }
    val key = ladder.indices.foldRight(lit(null).cast("string")) { case (i, other) =>
      when(col(s"__k$i") >= k, col(s"__key$i")).otherwise(other)
    }
    val kk = ladder.indices.foldRight(lit(null).cast("long")) { case (i, other) =>
      when(col(s"__k$i") >= k, col(s"__k$i")).otherwise(other)
    }
    counted
      .withColumn("anon_level", level)
      .withColumn("anon_key", key)
      .withColumn("anon_k", kk)
      .drop(ladder.indices.flatMap(i => Seq(s"__key$i", s"__k$i")): _*)
  }
}
