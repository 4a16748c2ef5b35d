package graft.operators

import graft.SparkSpec
import graft.functions.{SpanCorrupt, TextFunctions => TF}
import org.apache.spark.sql.functions._

/** C116 span corruption + C117 FIM: the objective-ready example
 * builders. Masking/cuts are md5-derived, so the specs pin the
 * CONTRACT (rates, structure, lossless reconstruction, determinism)
 * rather than hand-computing digests. */
class ExampleBuildSpec extends SparkSpec {

  import spark.implicits._

  private def corrupt(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        SpanCorrupt(TF.tokens(col("text")), col("doc_id")).as("sc"))
      .select(col("doc_id"), col("sc.*"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))

  test("C116: one 3-token span per full 20-token window, none for the tail") {
    val text42 = (0 until 42).map(i => s"t$i").mkString(" ")
    val Seq((_, input, target, nSpans, masked, total)) =
      corrupt(Seq(7L -> text42)).toSeq
    assert(nSpans == 2 && masked == 6 && total == 42)
    assert(input.split(" ").count(_.startsWith("<extra_id_")) == 2)
    assert(input.contains("<extra_id_0>") && input.contains("<extra_id_1>"))
    assert(input.indexOf("<extra_id_0>") < input.indexOf("<extra_id_1>"))
    assert(target.split(" ").length == 8) // 2 sentinels + 6 tokens
  }

  test("C116: merging target spans back into the input reconstructs the document") {
    val texts = Seq(
      11L -> (0 until 100).map(i => s"w$i").mkString(" "),
      12L -> (0 until 39).map(i => s"x$i").mkString(" "))
    for ((id, text) <- texts) {
      val Seq((_, input, target, nSpans, _, _)) = corrupt(Seq(id -> text)).toSeq
      // parse target into sentinel -> span tokens
      val spans = scala.collection.mutable.Map.empty[String, Seq[String]]
      var cur: String = null
      target.split(" ").foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Seq.empty }
        else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size == nSpans)
      val rebuilt = input.split(" ").flatMap { t =>
        if (t.startsWith("<extra_id_")) spans(t) else Seq(t)
      }.mkString(" ")
      assert(rebuilt == text, s"doc $id did not reconstruct")
    }
  }

  test("C116: short docs mask nothing; masking is deterministic and id-dependent") {
    val short = corrupt(Seq(3L -> "a b c d e"))
    assert(short.head._2 == "a b c d e" && short.head._3 == "" &&
      short.head._4 == 0)
    val t = (0 until 60).map(i => s"v$i").mkString(" ")
    val a = corrupt(Seq(5L -> t)); val b = corrupt(Seq(5L -> t))
    assert(a.toSeq == b.toSeq) // deterministic
    val c = corrupt(Seq(6L -> t))
    assert(c.head._2 != a.head._2) // different id -> different mask (3 windows)
  }

  test("property: reconstruction + exact rate over random doc lengths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val docs = (0L until 60L).map { i =>
      val n = Gen.choose(0, 95).apply(Gen.Parameters.default, Seed(5100 + i)).get
      i -> (0 until n).map(j => s"u${i}_$j").mkString(" ")
    }
    val out = corrupt(docs)
    out.foreach { case (id, input, target, nSpans, masked, total) =>
      val orig = docs.find(_._1 == id).get._2
      val nTok = orig.split(" ").length // "" splits to one empty token
      assert(total == nTok && nSpans == nTok / 20 && masked == 3 * nSpans)
      if (nSpans == 0) assert(input == orig && target == "")
      else {
        val spans = scala.collection.mutable.Map.empty[String, Seq[String]]
        var cur: String = null
        target.split(" ").foreach { t =>
          if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Seq.empty }
          else spans(cur) = spans(cur) :+ t
        }
        val rebuilt = input.split(" ").flatMap { t =>
          if (t.startsWith("<extra_id_")) spans(t) else Seq(t)
        }.mkString(" ")
        assert(rebuilt == orig, s"doc $id did not reconstruct")
      }
    }
  }

  test("C118: UL2 mixture — every arm appears, counts match its denoiser, all reconstruct") {
    val docs = (0L until 45L).map(i =>
      i -> (0 until 40).map(j => s"m${i}_$j").mkString(" "))
    val out = CorpusPipeline.ul2Mixture(docs.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)))
    spark.catalog.clearCache()
    assert(out.length == 45 && out.map(_._2).toSet == Set("r", "x", "s"))
    out.foreach { case (id, obj, total, nSpans, masked, input, target) =>
      assert(total == 40)
      obj match {
        case "r" => assert(nSpans == 2 && masked == 6)   // 40/20 windows
        case "x" => assert(nSpans == 4 && masked == 20)  // 40/10 windows
        case "s" => assert(nSpans == 1 && masked >= 0 && masked <= 40)
      }
      // sentinel-merge reconstruction works identically for all arms
      // (for S the single sentinel splices the suffix back in)
      val spans = scala.collection.mutable.Map.empty[String, Seq[String]]
      var cur: String = null
      target.split(" ").foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Seq.empty }
        else spans(cur) = spans(cur) :+ t
      }
      val rebuilt = input.split(" ").flatMap { t =>
        if (t.startsWith("<extra_id_")) spans.getOrElse(t, Seq.empty)
        else Seq(t)
      }.mkString(" ").trim
      assert(rebuilt == docs.find(_._1 == id).get._2,
        s"doc $id ($obj) did not reconstruct")
    }
  }

  private def fim(rows: Seq[(Long, String)], ppm: Int = 500000) =
    CorpusPipeline.fimTransform(rows.toDF("doc_id", "text"),
      "doc_id", "text", fimPpm = ppm)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))

  test("C117: segment counts partition the doc; PSM/SPM reconstruct losslessly") {
    val rows = (0L until 40L).map(i =>
      i -> (0 until 30).map(j => s"k${i}_$j").mkString(" "))
    val out = fim(rows, ppm = 1000000) // everything transformed
    assert(out.forall(_._2 != "plain"))
    out.foreach { case (id, mode, n, p, m, s, txt) =>
      assert(p + m + s == n)
      // parse the sentinel layout and rebuild prefix+middle+suffix
      val orig = rows.find(_._1 == id).get._2
      val toks = txt.split(" ")
      def seg(from: String, stops: Set[String]): Seq[String] = {
        val i0 = toks.indexOf(from) + 1
        toks.drop(i0).takeWhile(t => !stops(t)).toSeq
      }
      val sent = Set("<fim_prefix>", "<fim_suffix>", "<fim_middle>")
      val prefix = seg("<fim_prefix>", sent)
      val suffix = seg("<fim_suffix>", sent)
      val middle = seg("<fim_middle>", sent)
      assert(prefix.length == p && middle.length == m && suffix.length == s)
      assert((prefix ++ middle ++ suffix).mkString(" ") == orig,
        s"doc $id ($mode) did not reconstruct")
    }
    // the PSM/SPM coin actually lands on both sides over 40 docs
    assert(out.map(_._2).toSet == Set("psm", "spm"))
  }

  test("C117: the rate gate — 0 ppm all plain, plain passes text through") {
    val rows = Seq(1L -> "alpha  beta\tgamma", 2L -> "x")
    val out = fim(rows, ppm = 0)
    assert(out.forall(_._2 == "plain"))
    assert(out.head._7 == "alpha beta gamma") // whitespace-normalized join
    assert(out.head._4 == out.head._3 && out.head._5 == 0 && out.head._6 == 0)
  }
}
