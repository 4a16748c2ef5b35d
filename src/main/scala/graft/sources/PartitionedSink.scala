package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Date-partitioned parquet layout for parsed logs / document corpora —
 * the storage shape that makes 100 TB queryable:
 *
 *  - writes land under `.../p_date=YYYY-MM-DD/part-*.parquet`, so any
 *    query with a date predicate prunes whole directories before a
 *    single byte is read (`.explain` shows it as `PartitionFilters`,
 *    distinct from row-group `PushedFilters`);
 *  - `maxRecordsPerFile` bounds file sizes so downstream scans split
 *    evenly across executors;
 *  - writers scale horizontally: each task writes only its own
 *    partition directories, no coordination beyond the final commit.
 */
object PartitionedSink {

  /** Write `df` partitioned by the date of `tsCol` (column `p_date`).
   * Without clustering, every upstream task opens a writer per date it
   * sees — N_tasks × N_dates tiny files. The salted repartition
   * clusters rows by (date, salt) so each day-directory gets at most
   * `filesPerPartition` well-sized files while still spreading a hot
   * day across that many writers. */
  def writeByDate(
      df: DataFrame,
      path: String,
      tsCol: String = "timestamp",
      maxRecordsPerFile: Long = 5000000L,
      filesPerPartition: Int = 4): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .repartition(col("p_date"), pmod(xxhash64(col(tsCol)), lit(filesPerPartition)))
      .write
      .partitionBy("p_date")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** Read back a date-partitioned table; date predicates on `p_date`
   * become partition pruning (directory-level skip). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /**
   * D7: the production streaming write path — `foreachBatch` into the
   * date-partitioned layout, one `batch_id=N` subdirectory per
   * micro-batch written with overwrite. Overwriting the batch's OWN
   * directory makes a retried batch rewrite identical files instead of
   * appending duplicates: idempotent, the standard exactly-once
   * foreachBatch sink pattern. Readers see
   * `.../batch_id=N/p_date=D/part-*.parquet` and partition discovery
   * exposes both as prunable columns. The caller picks the trigger and
   * starts the query.
   */
  def streamWriterByDate(
      stream: DataFrame,
      path: String,
      tsCol: String = "timestamp",
      filesPerPartition: Int = 2): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch
        .withColumn("p_date", to_date(col(tsCol)))
        .repartition(col("p_date"), pmod(xxhash64(col(tsCol)), lit(filesPerPartition)))
        .write
        .partitionBy("p_date")
        .mode("overwrite")
        .parquet(s"$path/batch_id=$batchId")
    }
}
