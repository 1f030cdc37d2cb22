package graft.operators

import graft.{Registry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws of the in-engine logistic-regression kernel. The synthetic
  * corpus carries only WEAK language signal (31 shared tokens, per-token
  * en-rates within a few points of the 43.6% base rate), so the honest
  * assertions are the ones full-batch GD on a convex loss guarantees —
  * not an accuracy number the data can't support:
  *  - the trained model strictly beats the null (w=0) model's log-loss,
  *  - predicted probability separates the classes in the right
  *    direction (the first GD step moves along the class-mean feature
  *    difference, and later steps can't reverse a convex descent),
  *  - the gate never falls below the majority-class baseline (a bias
  *    term alone reaches it).
  */
class TextLrSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("train emits one finite weight per feature incl. bias") {
    val w = Registry.byName("text_lr_train").run(spark, dir).collect()
    assert(w.length == 17)
    assert(w.map(_.getInt(0)).sorted.toSeq == (-1 to 15))
    assert(w.forall(r => !r.getDouble(1).isNaN && !r.getDouble(1).isInfinite))
    // class imbalance (en < 50%) must pull the bias negative
    val bias = w.find(_.getInt(0) == -1).get.getDouble(1)
    assert(bias < 0, s"bias $bias not negative under a 43.6% positive rate")
  }

  test("gate beats the null model's log-loss and separates the classes") {
    val out = Registry.byName("text_lr_gate").run(spark, dir)
      .select(col("is_en"), col("p"), col("correct")).collect()
    val n = Tables(spark, dir, "documents").count()
    assert(out.length.toLong == n)
    val loss = out.map { r =>
      val y = if (r.getBoolean(0)) 1.0 else 0.0
      val p = r.getDouble(1)
      -(y * math.log(p) + (1 - y) * math.log(1 - p))
    }.sum / out.length
    // null model (w=0) predicts p=0.5 for every doc: loss = ln 2
    assert(loss < math.log(2.0) - 1e-4,
      s"trained log-loss $loss does not beat the null model's ${math.log(2.0)}")
    val (pos, neg) = out.partition(_.getBoolean(0))
    val mp = pos.map(_.getDouble(1)).sum / pos.length
    val mn = neg.map(_.getDouble(1)).sum / neg.length
    assert(mp > mn, s"mean p(en)=$mp not above mean p(rest)=$mn")
    // a bias term alone reaches the majority baseline; GD can't undercut it
    val correct = out.count(_.getBoolean(2)).toLong
    val majority = math.max(pos.length, neg.length).toLong
    assert(correct >= majority,
      s"accuracy $correct/$n below the majority baseline $majority/$n")
  }

  test("GD loss decreases monotonically across the four lockstep iterations") {
    val (ft, base) = TextQueries.lrFeatures(spark, dir)
    val nd = base.agg(count(lit(1)).as("nd"))
    // replay training, reading the log-loss after each iteration via the
    // same scoring shape the gate uses
    def lossOf(w: org.apache.spark.sql.DataFrame): Double = {
      val rows = ft.join(broadcast(w), "b")
        .groupBy("doc_id", "y").agg(sum(col("x") * col("w")).as("s"))
        .select(col("y").cast("double").as("y"), col("s").cast("double").as("s"))
        .collect()
      rows.map { r =>
        val p = 1.0 / (1.0 + math.exp(-r.getDouble(1)))
        -(r.getDouble(0) * math.log(p) + (1 - r.getDouble(0)) * math.log(1 - p))
      }.sum / rows.length
    }
    val losses = (0 to 4).map { k =>
      val w =
        if (k == 0)
          spark.range(-1, 16).select(col("id").cast("int").as("b"),
            lit(0.0).cast("decimal(18,6)").as("w"))
        else TextQueries.lrWeightsIters(spark, ft, nd, k)
      lossOf(w)
    }
    losses.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      assert(b < a, s"loss rose at iteration ${i + 1}: $losses")
    }
  }
}
