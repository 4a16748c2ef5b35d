package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * Distributed as-of (point-in-time) join — SURVEY.md §2 B13.
 *
 * For every probe row, attach the build row with the greatest build
 * time <= probe time (or strictly <, see `inclusive`) within the same
 * key group; probes with no earlier build row keep NULLs (left
 * semantics). The classic use: join each fact event to the dimension
 * version that was current when the event happened.
 *
 * Plan shape — no join operator at all: tag both sides, unionByName,
 * ONE shuffle on the key columns, and a running
 * `last(<build struct>, ignoreNulls)` window over (time, side). This is
 * the sort-merge as-of formulation: at 100 TB both sides shuffle once
 * on the key, each key group is sorted once, and state per row is a
 * single struct — no build-side broadcast, no per-key nested loop, no
 * re-scan per probe. Skewed keys cost what any per-key window costs;
 * an exceptionally hot key can be pre-split by a time-range salt.
 *
 * Determinism contract: `build` must have at most one row per
 * (keys, buildTime) — pre-aggregate ties (e.g. `max_by`) before the
 * call, otherwise "the" latest row at a timestamp is not well-defined
 * in any engine (DuckDB's ASOF JOIN has the same caveat).
 */
object AsOfJoin {

  /**
   * @param probe       fact side; all its columns pass through
   * @param build       dimension side; one row per (keys, buildTime)
   * @param keys        equi-key columns present on both sides
   * @param probeTime   event-time column on `probe`
   * @param buildTime   version-time column on `build`
   * @param buildValues build columns to attach to each probe row
   * @param prefix      output name prefix for attached build columns
   *                    (buildTime included: `prefix + buildTime`)
   * @param inclusive   true: match buildTime <= probeTime (DuckDB
   *                    `ASOF JOIN ... ON p.t >= b.t`); false: strict <
   */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTime: String,
      buildTime: String,
      buildValues: Seq[String],
      prefix: String = "asof_",
      inclusive: Boolean = true): DataFrame = {
    // Build rows sort before equal-time probes for <=, after them for <.
    val (buildSide, probeSide) = if (inclusive) (0, 1) else (1, 0)
    val bv = struct((buildTime +: buildValues).map(build(_)): _*)
    val b = build.select(
      keys.map(build(_)) ++ Seq(
        build(buildTime).as("__t"),
        bv.as("__bv"),
        lit(buildSide).as("__side")): _*)
    val p = probe
      .withColumn("__t", probe(probeTime))
      .withColumn("__bv", lit(null).cast(b.schema("__bv").dataType))
      .withColumn("__side", lit(probeSide))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p, allowMissingColumns = true)
      .withColumn("__m", last(col("__bv"), ignoreNulls = true).over(w))
      .filter(col("__side") === probeSide)
      .select(
        probe.columns.toSeq.map(col) ++
          (buildTime +: buildValues).map(c => col("__m").getField(c).as(prefix + c)): _*)
  }
}
