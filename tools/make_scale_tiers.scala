// Deterministic scale-tier generator (BASELINE.md appendix, now code).
// Regenerates /tmp/sf1 (x10) and /tmp/sf10 (x100) from the sf0.1
// documents/embeddings/events tables; each table is written only if
// its file is missing (so tiers built by earlier rounds gain the
// events table without re-generating docs — all copies reproduce
// bit-identically anyway).
// Copy k (k = 0 .. copies-1):
//   documents: doc_id += k*5000; every whitespace token suffixed with k
//     (k = 0 keeps the original text); lang/source/n_chars unchanged
//     (n_chars intentionally keeps the ORIGINAL length — the tier vary
//     ing is about row count, not feature drift).
//   embeddings: vec_id += k*2000; every component += 0.037f*k (float
//     arithmetic — copies are NOT near-dups at cosine 0.95+); label
//     unchanged.
//   events: event_id += k*100000 (sf0.1 ids are 0..99999); ts/user_id
//     unchanged — same time range at k-fold event density, the shape a
//     10x/100x-traffic log replay has. ts is stored as raw nanos INT64
//     (the nanosAsLong read), which Tables.events consumes unchanged.
//     Written PRE-SPLIT (32 hash-bucketed, event_id-sorted files in an
//     events.parquet DIRECTORY — deterministic content): real big logs
//     arrive in many splits, and Tables.events only injects its
//     single-row-group repartition emulation for sources that can't
//     parallelize themselves.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --driver-memory 12g \
//        --driver-class-path target/scala-2.13/classes \
//        -I tools/make_scale_tiers.scala
// --driver-memory is REQUIRED: the x100 events union (10M rows,
// repartition shuffle, local mode = all in the driver JVM) OOMs the
// 1g spark-shell default — and the REPL swallows the OutOfMemoryError
// and keeps executing the script, so the run "succeeds" leaving an
// EMPTY /tmp/sf10/events.parquet (caught r10: x100 bench failed with
// UNABLE_TO_INFER_SCHEMA). The _SUCCESS check makes a re-run with
// enough heap self-healing.
// NOTE (CLAUDE.md): chained DataFrame builds stay on ONE line — a line
// starting with .method() after a complete expression rebinds to the
// REPL's previous result.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

def writeOne(df: DataFrame, dir: String, table: String): Unit = {
  val tmp = s"$dir/__tmp_$table"
  df.coalesce(1).write.mode("overwrite").parquet(tmp)
  val part = new java.io.File(tmp).listFiles.filter(_.getName.endsWith(".parquet")).head
  java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/$table.parquet"), java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
}

def makeTable(outDir: String, table: String, build: Int => DataFrame, copies: Int): Unit = {
  if (new java.io.File(s"$outDir/$table.parquet").exists) { println(s"[tiers] $outDir/$table exists, skipping") } else {
    new java.io.File(outDir).mkdirs()
    writeOne((0 until copies).map(build).reduce(_ union _), outDir, table)
    println(s"[tiers] wrote $outDir/$table (x$copies)")
  }
}

def makeEventsDir(outDir: String, copies: Int): Unit = {
  // directory output: only a _SUCCESS marker proves a COMPLETE write (a
  // killed run leaves a bare dir that must not be trusted)
  if (new java.io.File(s"$outDir/events.parquet/_SUCCESS").exists) { println(s"[tiers] $outDir/events exists, skipping") } else {
    new java.io.File(outDir).mkdirs()
    val evs = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val all = (0 until copies).map(k => if (k == 0) evs else evs.withColumn("event_id", col("event_id") + lit(k * 100000L))).reduce(_ union _)
    all.repartition(32, col("event_id")).sortWithinPartitions("event_id").write.mode("overwrite").parquet(s"$outDir/events.parquet")
    println(s"[tiers] wrote $outDir/events (x$copies, 32 pre-split files)")
  }
}

def makeTier(outDir: String, copies: Int): Unit = {
  val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  val embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
  makeTable(outDir, "documents", k => if (k == 0) docs else docs.withColumn("doc_id", col("doc_id") + lit(k * 5000L)).withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + k)), copies)
  makeTable(outDir, "embeddings", k => if (k == 0) embs else embs.withColumn("vec_id", col("vec_id") + lit(k * 2000L)).withColumn("embedding", transform(col("embedding"), x => x + lit((0.037f * k)))), copies)
  makeEventsDir(outDir, copies)
}

makeTier("/tmp/sf1", 10)
makeTier("/tmp/sf10", 100)
println("[tiers] done")
sys.exit(0)
