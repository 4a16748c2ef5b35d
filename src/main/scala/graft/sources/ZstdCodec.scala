package graft.sources

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress._

/**
 * A9 codec parity: Hadoop `CompressionCodec` for `.zst` log files
 * backed by zstd-jni — the library Spark ALREADY ships for its
 * internal shuffle/broadcast codecs — because this environment's
 * libhadoop is built WITHOUT zstd support
 * (`org.apache.hadoop.io.compress.ZStandardCodec` throws "native
 * zStandard library not available"; probed r13 and r14). The
 * reference reads any codec DuckDB's filesystem layer knows,
 * including zstd (duckdb file_system gzip/zstd auto-detection) —
 * this closes the last gap in that list (gzip/bzip2/deflate ride
 * Hadoop's built-ins).
 *
 * Read path: `ZstdInputStream.setContinuous(true)` decodes
 * multi-frame files (the `zstd --rm` default output and concatenated
 * frames both occur in log archives). Write path mirrors it for sink
 * parity. The Compressor/Decompressor pool objects are inert
 * placeholders: both `create*Stream(stream, pooled)` overloads ignore
 * the pooled object and wrap the raw stream — the same shape Hadoop's
 * own non-native codecs use — so `CodecPool` interop stays safe
 * without a native allocation to manage.
 *
 * Registration appends to `io.compression.codecs` (an explicit list
 * REPLACES the factory defaults, so the current effective list is
 * carried over — losing gzip/bzip2 would break A9). [[graft.logs.HttpdLog]]
 * and the streaming readers call [[ZstdJniCodec.register]]
 * idempotently before every read, so `*.zst` works out of the box in
 * batch, SQL TVF, and file-stream sources alike.
 */
final class ZstdJniCodec extends CompressionCodec with Configurable {

  private var conf: Configuration = _
  override def setConf(c: Configuration): Unit = { conf = c }
  override def getConf: Configuration = conf

  override def getDefaultExtension: String = ".zst"

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdJniCodec.ZstdIn(in)

  override def createInputStream(
      in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def createDecompressor(): Decompressor = new ZstdJniCodec.InertDecompressor

  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZstdJniCodec.InertDecompressor]

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdJniCodec.ZstdOut(out)

  override def createOutputStream(
      out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createCompressor(): Compressor = new ZstdJniCodec.InertCompressor

  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZstdJniCodec.InertCompressor]
}

object ZstdJniCodec {

  /** Idempotently appends this codec to `io.compression.codecs`,
   * carrying over the currently-effective codec list (the factory
   * treats an explicit list as a REPLACEMENT for its defaults). */
  def register(conf: Configuration): Unit = synchronized {
    val cls = classOf[ZstdJniCodec].getName
    val cur = Option(conf.get("io.compression.codecs"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse {
        import scala.jdk.CollectionConverters._
        CompressionCodecFactory.getCodecClasses(conf)
          .asScala.map(_.getName).toSeq
      }
    if (!cur.contains(cls))
      conf.set("io.compression.codecs", (cur :+ cls).mkString(","))
  }

  private final class ZstdIn(raw: InputStream)
      extends CompressionInputStream(raw) {
    private val z = {
      val s = new com.github.luben.zstd.ZstdInputStream(raw)
      s.setContinuous(true)
      s
    }
    override def read(): Int = z.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      z.read(b, off, len)
    override def available(): Int = z.available()
    override def resetState(): Unit = ()
    override def close(): Unit =
      try z.close() finally super.close()
  }

  private final class ZstdOut(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    // Close-shielded view of raw: closing the zstd layer through it
    // writes the frame epilogue + frees the native ctx WITHOUT closing
    // the underlying stream — the CompressionOutputStream finish()
    // contract (a writer may finish() and close raw itself; the old
    // flush()-only finish left a truncated .zst — r14 advice).
    private val shield = new java.io.FilterOutputStream(raw) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = out.flush()
    }
    private var z = new com.github.luben.zstd.ZstdOutputStream(shield)
    private var finished = false
    // a write after finish()/resetState() opens a NEW frame —
    // multi-frame files are valid zstd and ZstdIn reads continuous
    private def ensureOpen(): Unit = if (finished) {
      z = new com.github.luben.zstd.ZstdOutputStream(shield)
      finished = false
    }
    override def write(b: Int): Unit = { ensureOpen(); z.write(b) }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      ensureOpen()
      z.write(b, off, len)
    }
    override def finish(): Unit = if (!finished) { finished = true; z.close() }
    override def resetState(): Unit = ()
    override def flush(): Unit = if (!finished) z.flush()
    override def close(): Unit =
      try finish() finally super.close()
  }

  /** Pool placeholder — never performs block decompression (both
   * stream factories ignore it); reset/end are no-ops so CodecPool
   * reuse is harmless. */
  private[sources] final class InertDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = false
    override def decompress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException(
        "ZstdJniCodec decompresses via streams only")
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }

  private[sources] final class InertCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = ()
    override def finished(): Boolean = false
    override def compress(b: Array[Byte], off: Int, len: Int): Int =
      throw new UnsupportedOperationException(
        "ZstdJniCodec compresses via streams only")
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(c: Configuration): Unit = ()
  }
}
