package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property fuzz for the media codecs (no Spark session — the decode
 * helpers are pure JVM functions, so hundreds of generated cases run
 * in milliseconds). Deterministic sampling via seeded Gen (the
 * SketchPropertySpec pattern — no scalatestplus bridge in the cache):
 *
 *  - WAV synth → decode roundtrip recovers duration/rate/channels/RMS
 *    exactly for any (samples, rate, amplitude);
 *  - AVI synth → demux recovers every frame's exact bytes;
 *  - arbitrary / truncated / bit-flipped payloads NEVER throw and
 *    never yield out-of-bounds chunk spans — they degrade to NULL
 *    features or fewer frames (the untrusted-corpus contract).
 */
class MediaPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("WAV roundtrip: decode recovers synth parameters exactly (400 cases)") {
    val gen = for {
      samples <- Gen.chooseNum(0, 2000)
      rate <- Gen.chooseNum(1000, 96000)
      amp <- Gen.chooseNum(0, 32767)
    } yield (samples, rate, amp)
    for (i <- 0 until 400) {
      val (samples, rate, amp) = sample(gen, 100L + i)
      val Seq(ms, r, ch, rms) =
        Multimodal.audioFeatures(Multimodal.wavBytes(samples, rate, amp))
      assert(ms == (samples * 1000L / rate).toInt, s"case $i")
      assert(r == rate && ch == 1, s"case $i")
      assert(rms == (if (samples == 0) 0 else amp), s"case $i")
    }
  }

  test("AVI roundtrip: demux recovers every frame's exact bytes (200 cases)") {
    val frameGen = Gen.chooseNum(1, 120)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val framesGen = Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, frameGen))
    for (i <- 0 until 200) {
      val frames = sample(framesGen, 4000L + i)
      val avi = Multimodal.aviBytes(frames, width = 4, height = 4)
      val got = Multimodal.aviVideoChunks(avi).get
      assert(got.length == frames.length, s"case $i")
      got.zip(frames).foreach { case ((off, len), f) =>
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(avi, off, off + len), f), s"case $i")
      }
    }
  }

  test("arbitrary bytes never throw: features degrade, demux returns None/empty") {
    val bytesGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    for (i <- 0 until 300) {
      val bytes = sample(bytesGen, 77000L + i)
      Multimodal.byteFeatures(bytes)
      Multimodal.imageFeatures(bytes, Multimodal.DefaultMaxImagePixels)
      Multimodal.audioFeatures(bytes)
      Multimodal.aviVideoChunks(bytes)
    }
  }

  test("truncating a valid AVI/WAV anywhere never throws") {
    val frames = Seq.tabulate(5)(i => Array.fill(30 + i)((i * 7).toByte))
    val avi = Multimodal.aviBytes(frames, 4, 4)
    val wav = Multimodal.wavBytes(samples = 64, rate = 8000, amplitude = 9)
    for (cut <- 0 until avi.length) {
      val t = java.util.Arrays.copyOfRange(avi, 0, cut)
      Multimodal.aviVideoChunks(t)
      Multimodal.aviVideoChunks(t ++ Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
    for (cut <- 0 until wav.length)
      Multimodal.audioFeatures(java.util.Arrays.copyOfRange(wav, 0, cut))
  }

  test("crafted near-2^31 chunk size cannot wrap past the bounds check") {
    val avi = Multimodal.aviBytes(Seq(Array.fill(25)(1.toByte)), 4, 4)
    // find the first 00dc chunk and write size 0x7ffffff0 (little-endian)
    val idx = avi.indexOfSlice("00dc".getBytes("US-ASCII"))
    assert(idx > 0)
    val mut = avi.clone()
    mut(idx + 4) = 0xf0.toByte; mut(idx + 5) = 0xff.toByte
    mut(idx + 6) = 0xff.toByte; mut(idx + 7) = 0x7f.toByte
    Multimodal.aviVideoChunks(mut).foreach(_.foreach { case (off, len) =>
      assert(off >= 0 && len >= 0 && off + len <= mut.length)
    })
  }

  test("MP4 roundtrip: sample-table demux recovers every frame's exact bytes (200 cases)") {
    val frameGen = Gen.chooseNum(1, 120)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val framesGen = Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, frameGen))
    for (i <- 0 until 200) {
      val frames = sample(framesGen, 9000L + i)
      val mp4 = Multimodal.mp4Bytes(frames)
      val got = Multimodal.mp4VideoSamples(mp4).get
      assert(got.length == frames.length, s"case $i")
      got.zip(frames).foreach { case ((off, len), f) =>
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(mp4, off, off + len), f), s"case $i")
      }
    }
  }

  test("truncating a valid MP4 anywhere never throws and never over-reads") {
    val frames = Seq.tabulate(5)(i => Array.fill(30 + i)((i * 7).toByte))
    val mp4 = Multimodal.mp4Bytes(frames)
    for (cut <- 0 until mp4.length) {
      val t = java.util.Arrays.copyOfRange(mp4, 0, cut)
      Multimodal.mp4VideoSamples(t).foreach(_.foreach { case (off, len) =>
        assert(off >= 0 && len >= 0 && off + len <= t.length)
      })
    }
  }

  test("byte-flipping a valid MP4 never throws and never over-reads") {
    val frames = Seq.tabulate(4)(i => Array.fill(25)((i + 1).toByte))
    val mp4 = Multimodal.mp4Bytes(frames)
    for (pos <- 0 until mp4.length; b <- Seq(0x00, 0x7f, 0xff)) {
      val mut = mp4.clone(); mut(pos) = b.toByte
      Multimodal.mp4VideoSamples(mut).foreach(_.foreach { case (off, len) =>
        assert(off >= 0 && len >= 0 && off + len <= mut.length,
          s"OOB span at flip pos=$pos b=$b")
      })
    }
  }

  test("hostile MP4 sample tables cannot allocate past the payload") {
    val mp4 = Multimodal.mp4Bytes(Seq(Array.fill(20)(3.toByte)))
    // stsz sample_count → 0x7fffffff: count must fail the bytes-present
    // check, not drive a 2^31 allocation
    val stszIdx = mp4.indexOfSlice("stsz".getBytes("US-ASCII"))
    assert(stszIdx > 0)
    val mut = mp4.clone()
    // sample_count field sits 12 bytes after the type (v/f + fixed size)
    mut(stszIdx + 12) = 0x7f.toByte; mut(stszIdx + 13) = 0xff.toByte
    mut(stszIdx + 14) = 0xff.toByte; mut(stszIdx + 15) = 0xff.toByte
    val t0 = System.nanoTime()
    val res = Multimodal.mp4VideoSamples(mut)
    assert((System.nanoTime() - t0) < 2e9, "hostile count must not allocate/loop")
    res.foreach(_.foreach { case (off, len) =>
      assert(off >= 0 && len >= 0 && off + len <= mut.length)
    })
    // size==0 box (extends to end) and 64-bit largesize headers parse
    val zeroSize = mp4.clone()
    val mdatIdx = zeroSize.indexOfSlice("mdat".getBytes("US-ASCII"))
    zeroSize(mdatIdx - 4) = 0; zeroSize(mdatIdx - 3) = 0
    zeroSize(mdatIdx - 2) = 0; zeroSize(mdatIdx - 1) = 0
    val z = Multimodal.mp4VideoSamples(zeroSize)
    assert(z.get.length == 1) // sample table still resolves into mdat
  }

  test("50k-deep nested LISTs inside movi do not overflow the stack") {
    // adversarial shape: LIST(movi, LIST(rec , LIST(rec , ... 00dc)))
    // — 12 bytes per level would drive ~50k recursive frames; the
    // worklist walk must survive AND still find the innermost chunk
    val depth = 50000
    val frame = Array.fill(8)(7.toByte)
    val innermost = new java.io.ByteArrayOutputStream()
    innermost.write("00dc".getBytes("US-ASCII")); writeLe32(innermost, frame.length)
    innermost.write(frame)
    var payload = innermost.toByteArray
    for (d <- 0 until depth) {
      val b = new java.io.ByteArrayOutputStream()
      b.write("LIST".getBytes("US-ASCII")); writeLe32(b, 4 + payload.length)
      b.write((if (d == depth - 1) "movi" else "rec ").getBytes("US-ASCII"))
      b.write(payload)
      payload = b.toByteArray
    }
    val riff = new java.io.ByteArrayOutputStream()
    riff.write("RIFF".getBytes("US-ASCII")); writeLe32(riff, 4 + payload.length)
    riff.write("AVI ".getBytes("US-ASCII")); riff.write(payload)
    val chunks = Multimodal.aviVideoChunks(riff.toByteArray)
    assert(chunks.exists(_.exists(_._2 == frame.length)),
      "innermost chunk must survive the deep walk")
  }

  private def writeLe32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }

  test("byte-flipping a valid AVI never throws and never over-reads") {
    val frames = Seq.tabulate(4)(i => Array.fill(25)((i + 1).toByte))
    val avi = Multimodal.aviBytes(frames, 4, 4)
    for (pos <- 0 until avi.length; b <- Seq(0x00, 0x7f, 0xff)) {
      val mut = avi.clone(); mut(pos) = b.toByte
      Multimodal.aviVideoChunks(mut).foreach(_.foreach { case (off, len) =>
        assert(off >= 0 && len >= 0 && off + len <= mut.length,
          s"OOB span at flip pos=$pos b=$b")
      })
    }
  }
}
