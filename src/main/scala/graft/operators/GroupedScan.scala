package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Distributed per-group prefix scan — the grouped generalization of
 * the C33 [[CorpusPipeline.packedSequenceSpans]] TeraSort device,
 * built for LOW-CARDINALITY-group running statistics (per-source
 * budget fills, per-stratum exact splits, per-cell pack layouts,
 * per-source frequency ranks). The naive formulation —
 * `Window.partitionBy(group).orderBy(...)` — sorts each group's
 * ENTIRE membership in ONE task, so with 5–20 sources/cells a
 * 1000-executor cluster runs ≤ 20 tasks on a corpus-sized stage
 * (the same cliff [[ExactQuantiles]] documents and avoids for
 * quantiles).
 *
 * Shape here instead: range-partition + sort on (group, order…) — a
 * big group simply SPANS partitions — then per-partition per-group
 * subtotals to the driver (groups are contiguous under the range
 * sort, so that's ≤ partitions + |groups| − 1 entries), exclusive-scan
 * the offsets per group, broadcast them back, and one sequential pass
 * per partition. Driver/broadcast state is O(partitions + |groups|)
 * longs; parallelism is the partition count, INDEPENDENT of |groups|.
 *
 * Evaluating the sorted plan twice (subtotal job + output job) is
 * safe for the same reason as [[CorpusPipeline.packedSequenceSpans]]:
 * the range partitioner's bounds are fixed once on the shuffle
 * dependency, the within-partition sort key is total, and the second
 * job re-reads the SAME shuffle files — only the post-shuffle sort
 * re-executes.
 *
 * Contract: |groups| ≪ rows (the per-group totals broadcast to every
 * task). For high-cardinality groups a plain window is already
 * parallel — use it. Composite group keys are joined with U+0001
 * (NULL components encode as U+0000); group values containing U+0001
 * could alias across a composite boundary — not a concern for the
 * source/lang/cell keys this serves.
 */
object GroupedScan {

  /**
   * Append per-group running statistics to `df` under a total
   * (group, order…) sort:
   *
   *   - `__rnk` — 1-based rank of the row within its group
   *   - `__cum` — inclusive prefix sum of `valueCol` within the group
   *   - `__gn`  — the group's total row count
   *   - `__gt`  — the group's total `valueCol` sum
   *
   * `valueCol` must be LongType (NULLs count as 0). `orderCols` must
   * totally order rows within a group (include a unique id) or ranks
   * are nondeterministic.
   */
  def prefixScan(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(orderCols.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    val gkParts: Seq[Column] = groupCols.map(c =>
      coalesce(col(c).cast(StringType), lit("\u0000")))
    val gk = gkParts.reduceLeft((a, b) => concat(a, lit("\u0001"), b))
    val keyed = df.withColumn("__gk", gk)
    val sortCols: Seq[Column] = col("__gk") +: orderCols.map(col)
    val sorted = keyed
      .repartitionByRange(spark.sparkContext.defaultParallelism, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val gi = schema.fieldIndex("__gk")
    val vi = schema.fieldIndex(valueCol)
    require(schema(vi).dataType == LongType,
      s"$valueCol must be LongType, got ${schema(vi).dataType}")
    val rdd = sorted.rdd
    // pass 1: per-partition per-group (row count, value sum) — groups
    // are contiguous after the sort, so one open accumulator suffices
    val subs: Array[(Int, String, Long, Long)] =
      rdd.mapPartitionsWithIndex { (pi, it) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
        var cur: String = null
        var cnt = 0L
        var sum = 0L
        var open = false
        it.foreach { r =>
          val g = r.getString(gi)
          if (!open || g != cur) {
            if (open) out += ((pi, cur, cnt, sum))
            cur = g; cnt = 0L; sum = 0L; open = true
          }
          cnt += 1L
          sum += (if (r.isNullAt(vi)) 0L else r.getLong(vi))
        }
        if (open) out += ((pi, cur, cnt, sum))
        out.iterator
      }.collect()
    // driver: group totals + exclusive per-(partition, group) offsets
    val totals: Map[String, (Long, Long)] =
      subs.groupBy(_._2).map { case (g, a) =>
        g -> ((a.map(_._3).sum, a.map(_._4).sum))
      }
    val offsets: Map[(Int, String), (Long, Long)] = {
      val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      val m = Map.newBuilder[(Int, String), (Long, Long)]
      subs.sortBy(_._1).foreach { case (pi, g, cnt, sum) =>
        val (c0, s0) = acc.getOrElse(g, (0L, 0L))
        m += (((pi, g), (c0, s0)))
        acc(g) = (c0 + cnt, s0 + sum)
      }
      m.result()
    }
    val bTot = spark.sparkContext.broadcast(totals)
    val bOff = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pi, it) =>
      var cur: String = null
      var open = false
      var rnk = 0L
      var cum = 0L
      it.map { r =>
        val g = r.getString(gi)
        if (!open || g != cur) {
          val (c0, s0) = bOff.value((pi, g))
          rnk = c0; cum = s0; cur = g; open = true
        }
        rnk += 1L
        cum += (if (r.isNullAt(vi)) 0L else r.getLong(vi))
        val (gn, gt) = bTot.value(g)
        Row.fromSeq(r.toSeq :+ rnk :+ cum :+ gn :+ gt)
      }
    }
    val outSchema = StructType(schema.fields ++ Seq(
      StructField("__rnk", LongType, nullable = false),
      StructField("__cum", LongType, nullable = false),
      StructField("__gn", LongType, nullable = false),
      StructField("__gt", LongType, nullable = false)))
    spark.createDataFrame(out, outSchema).drop("__gk")
  }
}
