// Deterministic scale-tier generator (BASELINE.md appendix, now code).
// Regenerates /tmp/sf1 (x10) and /tmp/sf10 (x100) from the sf0.1
// documents/embeddings tables; skips a tier whose files already exist.
// Copy k (k = 0 .. copies-1):
//   documents: doc_id += k*5000; every whitespace token suffixed with k
//     (k = 0 keeps the original text); lang/source/n_chars unchanged
//     (n_chars intentionally keeps the ORIGINAL length — the tier vary
//     ing is about row count, not feature drift).
//   embeddings: vec_id += k*2000; every component += 0.037f*k (float
//     arithmetic — copies are NOT near-dups at cosine 0.95+); label
//     unchanged.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//        --driver-class-path target/scala-2.13/classes \
//        -I tools/make_scale_tiers.scala
// NOTE (CLAUDE.md): chained DataFrame builds stay on ONE line — a line
// starting with .method() after a complete expression rebinds to the
// REPL's previous result.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

def haveTier(dir: String): Boolean = new java.io.File(s"$dir/documents.parquet").exists && new java.io.File(s"$dir/embeddings.parquet").exists

def writeOne(df: DataFrame, dir: String, table: String): Unit = {
  val tmp = s"$dir/__tmp_$table"
  df.coalesce(1).write.mode("overwrite").parquet(tmp)
  val part = new java.io.File(tmp).listFiles.filter(_.getName.endsWith(".parquet")).head
  java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/$table.parquet"), java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
}

def makeTier(outDir: String, copies: Int): Unit = {
  if (haveTier(outDir)) { println(s"[tiers] $outDir exists, skipping") } else {
    new java.io.File(outDir).mkdirs()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val docTiers = (0 until copies).map(k => if (k == 0) docs else docs.withColumn("doc_id", col("doc_id") + lit(k * 5000L)).withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1" + k)))
    writeOne(docTiers.reduce(_ union _), outDir, "documents")
    val embTiers = (0 until copies).map(k => if (k == 0) embs else embs.withColumn("vec_id", col("vec_id") + lit(k * 2000L)).withColumn("embedding", transform(col("embedding"), x => x + lit((0.037f * k)))))
    writeOne(embTiers.reduce(_ union _), outDir, "embeddings")
    println(s"[tiers] wrote $outDir (x$copies)")
  }
}

makeTier("/tmp/sf1", 10)
makeTier("/tmp/sf10", 100)
println("[tiers] done")
sys.exit(0)
