package graft.logs

import java.io.ByteArrayOutputStream
import java.net.URI
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Non-local filesystem scheme through the whole HttpdLog read path.
 *
 * The reference reads gzipped log globs from `s3://bucket/logs/...`
 * through DuckDB's httpfs (docs/read_httpd_log.md:11,24). graft goes
 * through the Hadoop
 * `FileSystem` abstraction everywhere — format-detection sampling,
 * glob/`**` expansion, gzip codec, spark.read.text, raw-mode splits —
 * so any registered scheme (s3a://, gs://, hdfs://) works unchanged.
 * The sandbox has no egress, so this spec registers a CUSTOM scheme
 * (`graftfs://`, a RawLocalFileSystem in disguise) and drives the full
 * read path through it: if any step short-circuited to local paths or
 * java.io, the scheme would break.
 */
class FsSchemeSpec extends SparkSpec {

  private val commonLines = Seq(
    """192.168.1.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /index.html HTTP/1.0" 200 2326""",
    """192.168.1.2 - alice [10/Oct/2000:13:56:45 -0700] "POST /api/login HTTP/1.1" 201 150""",
    """192.168.1.3 - - [10/Oct/2000:13:57:12 -0700] "GET /img.png HTTP/1.1" 304 -""")

  private def gz(lines: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    g.close()
    bos.toByteArray
  }

  private def setup(): Path = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val dir = Files.createTempDirectory("graft_fs_scheme")
    Files.write(dir.resolve("a.log"), commonLines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("b.log.gz"), gz(commonLines.take(2)))
    Files.createDirectories(dir.resolve("deep/sub"))
    Files.write(dir.resolve("deep/sub/c.log"),
      commonLines.take(1).mkString.getBytes(StandardCharsets.UTF_8))
    dir
  }

  test("glob + gzip + auto-detect through a registered non-file scheme") {
    val dir = setup()
    val df = HttpdLog.read(spark, s"graftfs://$dir/*.log*")
    assert(df.count() == 5) // 3 plain + 2 gzipped, format auto-detected
    val files = df.select("log_file").distinct().collect().map(_.getString(0))
    assert(files.length == 2 && files.forall(_.startsWith("graftfs:/")), files.mkString(","))
    assert(df.filter(col("status") === 200).count() == 2)
  }

  test("** recursion and raw mode through the non-file scheme") {
    val dir = setup()
    val rec = HttpdLog.read(spark, s"graftfs://$dir/**/*.log", formatType = "common")
    assert(rec.count() == 4) // a.log (3) + deep/sub/c.log (1); .gz leaf excluded
    val raw = HttpdLog.read(spark, s"graftfs://$dir/*.log", formatType = "common", raw = true)
    assert(raw.count() == 3)
    assert(raw.select("log_file").distinct().first().getString(0).startsWith("graftfs:/"))
  }
}

/** RawLocalFileSystem under a distinct scheme: exercises the
 * scheme-resolution path (Path.getFileSystem against a non-default
 * URI) exactly as s3a:// would, with local files standing in for the
 * object store (zero-egress sandbox). */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path => HPath}
  import org.apache.hadoop.fs.permission.FsPermission

  override def getUri: URI = URI.create("graftfs:///")
  override def getScheme: String = "graftfs"

  // RawLocal's lazy permission loading does `new java.io.File(uri)` on
  // the qualified (graftfs://) path and throws; return eager-permission
  // statuses instead — object-store FileSystems do the same.
  private def sanitize(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime,
      if (s.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "graft", "graft", s.getPath)
  override def getFileStatus(f: HPath): FileStatus = sanitize(super.getFileStatus(f))
  override def listStatus(f: HPath): Array[FileStatus] = super.listStatus(f).map(sanitize)
}
