package graft.operators

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame}

/**
 * C66: distributed linear-classifier training — the "train a cheap
 * quality/language filter over the whole corpus" step of a training-data
 * pipeline (the fastText-classifier role), as fixed-round batch
 * perceptron updates over hashed token features.
 *
 * Why perceptron rounds rather than logistic SGD: the update rule is
 * PURE INTEGER (weights, margins, and gradients are sums of token
 * counts), so the full training loop is a deterministic function of the
 * data that a SQL oracle can replay exactly — no transcendental sigmoid
 * whose last-ulp behavior differs across engines. The distributed shape
 * is the batch (parallelized) perceptron: every round each doc votes
 * with its full feature vector, misclassified docs contribute `y·x` to
 * one global gradient aggregate, and the driver applies the summed
 * update — the classic iterative-parameter-mixing layout where the
 * DRIVER holds only the (F+1)-long weight vector and the loop counter
 * (the [[Clustering.lloydAssign]] scale contract).
 *
 * Plan shape: ONE shuffle total (groupBy doc to pivot hashed-token
 * counts into a fixed F-wide integer vector, persisted), then per round
 * ONE map-side-combining aggregate over the compact frame — margins are
 * a codegen'd dot against the weight literal, so no join, no broadcast
 * exchange, no per-round shuffle. At 100 TB the per-round cost is a
 * single scan of (docs × (F+1) longs).
 *
 * Semantics (all integer, oracle-replayable):
 *  - features: token → `md5` bucket in [0, F); per-doc counts;
 *  - label y ∈ {−1, +1}; margin = w·fv + bias (w₀ = 0, bias₀ = 0);
 *  - a doc is misclassified iff `y·margin ≤ 0` (so round 1 updates on
 *    every doc — the zero-margin tie counts as wrong for both classes);
 *  - update: w += Σ_mis y·fv, bias += Σ_mis y (learning rate 1 — any
 *    constant rate only scales the integer weights);
 *  - `rounds` = number of update passes; the returned confusion matrix
 *    is evaluated under the final weights.
 *
 * Output: one row per (label, pred) cell — n docs and the exact integer
 * margin sum, which fingerprints every weight of every round.
 */
object Training {

  def perceptron(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      labelCol: String = "y",
      features: Int = 32,
      rounds: Int = 3): DataFrame = {
    val (vec, margin) = fit(docs, idCol, textCol, labelCol, features, rounds)
    vec.withColumn("__m", margin)
      .groupBy(col("__y").as("label"),
        when(col("__m") > 0, 1L).otherwise(0L).as("pred"))
      .agg(count(lit(1)).as("n"), sum("__m").as("margin_sum"))
      .orderBy("label", "pred")
  }

  /** [[fit]] for callers that need the MODEL rather than the margins —
   * the train-offline/serve-online split (D16 scores a stream with
   * these weights): returns (weights, bias) after `rounds` updates. */
  def fitWeights(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      labelCol: String = "y",
      features: Int = 32,
      rounds: Int = 3): (Array[Long], Long) = {
    val (_, w, bias) = fitRaw(docs, idCol, textCol, labelCol, features, rounds)
    (w, bias)
  }

  /** The [[perceptron]] training loop factored out: returns the
   * persisted compact feature frame (idCol, __y, __fv) and the final
   * margin column (codegen dot against the driver-held weights). */
  private def fit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      features: Int,
      rounds: Int): (DataFrame, Column) = {
    val (vec, w, bias) = fitRaw(docs, idCol, textCol, labelCol, features, rounds)
    (vec, VF.dotLong(col("__fv"), typedlit(w.toSeq)) + lit(bias))
  }

  private def fitRaw(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      features: Int,
      rounds: Int): (DataFrame, Array[Long], Long) = {
    require(features > 0 && rounds > 0)
    val f = TF.md5Bucket(col("__g"), features).as("__f")
    val fvCols: Seq[Column] =
      (0 until features).map(i => sum((col("__f") === i).cast(LongType)).as(s"c$i"))
    val vec = docs
      .select(col(idCol), col(labelCol).cast(LongType).as("__y"),
        explode(TF.tokens(col(textCol))).as("__g"))
      .select(col(idCol), col("__y"), f)
      .groupBy(col(idCol), col("__y"))
      .agg(fvCols.head, fvCols.tail: _*)
      .select(col(idCol), col("__y"),
        array((0 until features).map(i => col(s"c$i")): _*).as("__fv"))
      .transform(Scoped.persistTracked)

    var w = Array.fill[Long](features)(0L)
    var bias = 0L
    def margin: Column =
      VF.dotLong(col("__fv"), typedlit(w.toSeq)) + lit(bias)

    var round = 0
    while (round < rounds) {
      val deltas: Seq[Column] =
        (0 until features).map(i =>
          sum(col("__y") * col("__fv").getItem(i)).as(s"d$i")) :+
          sum(col("__y")).as("db")
      val row = vec.withColumn("__m", margin)
        .filter(col("__y") * col("__m") <= 0)
        .agg(deltas.head, deltas.tail: _*)
        .head()
      if (!row.isNullAt(0)) { // no misclassified docs → converged, w keeps
        w = Array.tabulate(features)(i => w(i) + row.getLong(i))
        bias += row.getLong(features)
      }
      round += 1
    }
    (vec, w, bias)
  }

  /**
   * C104: multi-class language-ID classifier — the supervised,
   * trained replacement for the C9 n-gram heuristic (the standard
   * bootstrap: heuristic labels or a labeled slice train the cheap
   * classifier that then scales). The model is a mean-CENTERED
   * nearest-class-centroid (Rocchio-discriminative) over hashed
   * BINARY presence features: w_c[b] = mean presence of bucket b in
   * class c minus its corpus-wide mean presence (both as exact
   * `(sum*1000) div n` integers), score(d,c) = sum of w_c over d's
   * present buckets, prediction = argmax with ties to the LOWEST
   * class index. Centering cancels the shared-vocabulary direction
   * exactly (class priors can't leak through document length), and
   * presence features kill multinomial count noise — the round-13
   * probes showed both are what make a small-vocab corpus separable
   * (a batch perceptron oscillates here; the one-shot centroid is the
   * deterministic fixed point of its first round).
   *
   * Scale contract (the C66 shape, minus the loop): ONE shuffle total
   * — the hashed-presence pivot to a compact (doc, classIdx, F-long
   * 0/1 vector) frame, persisted — then ONE map-side-combining
   * aggregate for the per-class presence sums (the global sums derive
   * on the driver, exactly); scoring is a codegen dot against the C
   * weight literals with `array_position(scores, array_max(scores))`
   * argmax (first occurrence = lowest index). Driver state: the
   * C×F weight matrix. All integer, so the DuckDB oracle replays the
   * ENTIRE model genuinely in SQL — no pinned values.
   *
   * Output: the confusion matrix — one row per (label, pred) cell
   * with n, the exact predicted-class score sum (fingerprints every
   * weight), and the per-label doc total.
   */
  def centroidClassifier(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      labelCol: String = "lang",
      features: Int = 256): DataFrame = {
    require(features > 0)
    // class inventory: a bounded, UTF8-binary-sorted collect
    val classes = docs.select(col(labelCol).cast("string").as("__c"))
      .filter(col("__c").isNotNull).distinct().orderBy("__c")
      .collect().map(_.getString(0))
    val nC = classes.length
    require(nC >= 2, s"need >= 2 classes, got $nC")
    val mapLit = typedlit(classes.zipWithIndex
      .map { case (c, i) => c -> i.toLong }.toMap)
    val f = TF.md5Bucket(col("__g"), features).as("__f")
    // presence pivot PACKED into F/64 bit_or words, not F max-indicator
    // aggregate columns (r19, guide §2.3 "shuffle fewer bytes"): the
    // pivot aggregates at the exploded-token grain, so its per-group
    // partial state and partial-agg shuffle rows carried F longs
    // (2 KB/doc at F=256) where the same presence information is F
    // bits (4 longs). The packed masks unpack to the IDENTICAL 0/1
    // array right after the aggregate, so the persisted frame, the
    // per-class sums, and the scoring dot are byte-identical — only
    // the aggregate state and exchange width change (measured: the
    // 256-buffer HashAggregate also fell back past codegen's 100-arg
    // split, the packed one whole-stage-codegens).
    val nWords = (features + 63) / 64
    val maskCols: Seq[Column] = (0 until nWords).map(wi =>
      expr(s"bit_or(case when __f div 64 = $wi " +
        s"then shiftleft(1L, cast(__f % 64 as int)) else 0L end)")
        .as(s"m$wi"))
    val vec = docs
      .filter(col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), element_at(mapLit, col(labelCol).cast("string")).as("__y"),
        explode(TF.tokens(col(textCol))).as("__g"))
      .select(col(idCol), col("__y"), f)
      .groupBy(col(idCol), col("__y"))
      .agg(maskCols.head, maskCols.tail: _*)
      // unpack BEFORE the persist: the cache pays F longs per row, but
      // every consumer (the per-class sums, the nC scoring dots) reads
      // the materialized array once instead of re-deriving it per
      // expression reference (measured: post-persist unpack read 7.8 s
      // vs 5.8 s on the same host — nC dots x F shifts per row beat
      // the 64x cache-size win at every scale where the frame is
      // consumed more than once)
      .select(col(idCol), col("__y"),
        array((0 until features).map(i =>
          expr(s"shiftright(m${i / 64}, ${i % 64}) & 1L")): _*).as("__fv"))
      .transform(Scoped.persistTracked)

    val sumCols: Seq[Column] =
      (0 until features).map(i => sum(col("__fv").getItem(i)).as(s"s$i")) :+
        count(lit(1)).as("n")
    val perClass = vec.groupBy("__y").agg(sumCols.head, sumCols.tail: _*)
      .collect().map { r =>
        r.getLong(0).toInt ->
          (Array.tabulate(features)(i => r.getLong(i + 1)), r.getLong(features + 1))
      }.toMap
    val nAll = perClass.valuesIterator.map(_._2).sum
    val allSums = Array.tabulate(features)(i =>
      perClass.valuesIterator.map(_._1(i)).sum)
    val w: Array[Array[Long]] = Array.tabulate(nC) { c =>
      val (s, n) = perClass(c)
      Array.tabulate(features)(i => s(i) * 1000L / n - allSums(i) * 1000L / nAll)
    }

    val scores: Column = array((0 until nC).map(c =>
      VF.dotLong(col("__fv"), typedlit(w(c).toSeq))): _*)
    val classLit = typedlit(classes.toSeq)
    val lblW = org.apache.spark.sql.expressions.Window.partitionBy("label")
    vec
      .withColumn("__s", scores)
      .withColumn("__p", array_position(col("__s"), array_max(col("__s"))) - 1)
      .groupBy(col("__y"), col("__p"))
      .agg(count(lit(1)).as("n"),
        sum(element_at(col("__s"), (col("__p") + 1).cast("int")))
          .as("pred_score_sum"))
      .select(
        element_at(classLit, (col("__y") + 1).cast("int")).as("label"),
        element_at(classLit, (col("__p") + 1).cast("int")).as("pred"),
        col("n"), col("pred_score_sum"))
      .withColumn("label_docs", sum(col("n")).over(lblW))
      .orderBy("label", "pred")
  }

  /**
   * C74: uncertainty-based selection (the active-learning acquisition
   * rule: route the docs the trained filter is LEAST sure about to
   * human labeling / a stronger judge model — the standard loop for
   * improving a corpus quality classifier cheaply): train the same
   * fixed-round integer perceptron, then take the k docs with the
   * smallest |margin| under the final weights. One extra k-bounded
   * global TakeOrdered over the already-persisted compact frame — no
   * new shuffle of the corpus, and the selection (like the weights)
   * replays exactly in SQL: rank by (|margin|, doc_id).
   */
  def mostUncertain(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      labelCol: String = "y",
      features: Int = 32,
      rounds: Int = 3,
      k: Int = 32): DataFrame = {
    require(k > 0)
    val (vec, margin) = fit(docs, idCol, textCol, labelCol, features, rounds)
    vec.withColumn("margin", margin)
      .select(col(idCol), col("__y").as("label"), col("margin"))
      .orderBy(abs(col("margin")), col(idCol))
      .limit(k)
      .withColumn("sel_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(abs(col("margin")), col(idCol))))
      .select(col("sel_rank"), col(idCol), col("label"), col("margin"))
  }
}
