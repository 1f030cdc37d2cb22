package graft.operators

import graft.{Registry, Tables, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The MIPS reduction's correctness law: ranking by cosine over the
  * norm-augmented space must EQUAL ranking by raw inner product over the
  * original space — that equality is the entire reason the reduction
  * lets a cosine ANN index serve inner-product retrieval.
  */
class MipsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("augmented-cosine top-5 equals direct inner-product top-5 for every query") {
    val reduced = Registry.byName("topk_similarity_mips").run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // direct MIPS ground truth, computed independently of the reduction
    val vecs = Tables(spark, dir, "embeddings")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      .toMap
    def ip(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => a(i) * b(i)).sum
    reduced.foreach { case (qid, neighbors) =>
      val q = vecs(qid)
      val truth = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, ip(q, v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(5).map(_._1)
      assert(neighbors == truth,
        s"query $qid: reduction ranked $neighbors, direct MIPS ranks $truth")
    }
  }
}
