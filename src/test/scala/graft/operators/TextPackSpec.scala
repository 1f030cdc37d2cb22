package graft.operators

import graft.{Registry, TestSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Packing invariants: every document lands in exactly one bin, bins
  * are contiguous non-negative indices per source, and each bin's
  * token payload stays within one document of the 512-token window
  * (greedy first-token assignment can overhang by at most the last
  * doc's length — the standard concat-then-split packing contract). */
class TextPackSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("document conservation and bin contiguity") {
    val packed = Registry.byName("text_pack").run(spark, dir).collect()
    val totalDocs = Tables(spark, dir, "documents").count()
    assert(packed.map(_.getLong(2)).sum == totalDocs, "docs lost or duplicated in packing")
    packed.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head == 0, s"$src: first bin not 0")
      assert(bins.zip(bins.tail).forall { case (a, b) => b == a + 1 },
        s"$src: bins not contiguous: ${bins.toSeq}")
    }
  }

  test("bin token payloads respect the window plus last-doc overhang") {
    val d = Tables(spark, dir, "documents")
      .select(col("source"), size(split(trim(col("text")), "\\s+")).as("n_tok"))
    val maxDoc = d.agg(max("n_tok")).collect().head.getInt(0)
    val packed = Registry.byName("text_pack").run(spark, dir).collect()
    // a bin stops accepting docs once 512 tokens are crossed, so its
    // total is < 512 + (the doc that crossed the boundary)
    packed.foreach { r =>
      assert(r.getLong(3) < 512 + maxDoc.toLong,
        s"bin ${r.getString(0)}/${r.getLong(1)} holds ${r.getLong(3)} tokens")
    }
  }

  test("BPE packing conserves documents and keeps bins contiguous") {
    val packed = Registry.byName("text_pack_bpe").run(spark, dir).collect()
    val totalDocs = Tables(spark, dir, "documents").count()
    assert(packed.map(_.getLong(2)).sum == totalDocs,
      "docs lost or duplicated in BPE packing")
    packed.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.head == 0, s"$src: first bin not 0")
      assert(bins.zip(bins.tail).forall { case (a, b) => b == a + 1 },
        s"$src: bins not contiguous: ${bins.toSeq}")
    }
  }

  test("BPE bin payloads respect the window plus last-doc overhang") {
    val maxDoc = Registry.byName("text_bpe_apply").run(spark, dir)
      .agg(max("n_tokens")).collect().head.getLong(0)
    val packed = Registry.byName("text_pack_bpe").run(spark, dir).collect()
    packed.foreach { r =>
      assert(r.getLong(3) < 512 + maxDoc,
        s"bin ${r.getString(0)}/${r.getLong(1)} holds ${r.getLong(3)} BPE tokens")
    }
  }

  test("per-doc BPE token counts sit between word and char counts") {
    // each eligible word is >= 1 token (merges never cross words) and
    // <= its char count (merges only shrink segmentations)
    val rows = Registry.byName("text_bpe_apply").run(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(2) <= r.getLong(3),
        s"doc ${r.getLong(0)}: tokens ${r.getLong(2)} outside [words ${r.getLong(1)}, chars ${r.getLong(3)}]")
    }
  }
}
