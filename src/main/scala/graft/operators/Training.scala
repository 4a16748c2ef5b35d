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
