package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: single-JVM A/B of the connected-components round shape —
  * product loop (fused: lazy checkpoint, probe materializes, 1 job/round)
  * vs a replica of the round-13 eager shape (2 eager checkpoints + sum
  * per round). Also asserts both produce identical labelings on the
  * ensemble's real pair relation. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the ensemble's edge relation, rebuilt once and checkpointed so the
    // A/B times ONLY the component loop
    val pairs = graft.operators.DedupQueries.ensemblePairsForProbe(spark, dir)
      .localCheckpoint()
    System.err.println(s"CC pairs: ${pairs.count()}")

    def legacy(p: DataFrame): DataFrame = {
      val p0 = p.localCheckpoint()
      val edges = p0.union(p0.select(col("db").as("da"), col("da").as("db"))).persist()
      def lblSum(df: DataFrame): java.math.BigDecimal =
        df.agg(coalesce(
          sum(col("lbl").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(java.math.BigDecimal.ZERO))).collect()(0).getDecimal(0)
      try {
        var labels = edges.groupBy(col("da").as("id"))
          .agg(min(least(col("da"), col("db"))).as("lbl"))
          .localCheckpoint()
        var prevSum = lblSum(labels)
        var converged = false
        var rounds = 0
        while (!converged && rounds < 25) {
          val prop = labels
            .union(edges.join(labels, col("db") === col("id"))
              .select(col("da").as("id"), col("lbl")))
            .groupBy("id").agg(min("lbl").as("lbl"))
            .localCheckpoint()
          val lookup = prop.select(col("id").as("lid"), col("lbl").as("llbl"))
          val next = prop.join(lookup, col("lbl") === col("lid"), "left")
            .select(col("id"),
              least(col("lbl"), coalesce(col("llbl"), col("lbl"))).as("lbl"))
            .localCheckpoint()
          val s2 = lblSum(next)
          labels = next
          converged = s2.compareTo(prevSum) == 0
          prevSum = s2
          rounds += 1
        }
        require(converged)
        labels
      } finally { edges.unpersist(): Unit }
    }

    // variant C: eager prop checkpoint, lazy doubling+sum (2 jobs/round)
    def variantC(p: DataFrame): DataFrame = {
      val p0 = p.localCheckpoint()
      val edges = p0.union(p0.select(col("db").as("da"), col("da").as("db"))).persist()
      def lblSum(df: DataFrame): java.math.BigDecimal =
        df.agg(coalesce(
          sum(col("lbl").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(java.math.BigDecimal.ZERO))).collect()(0).getDecimal(0)
      try {
        var labels = edges.groupBy(col("da").as("id"))
          .agg(min(least(col("da"), col("db"))).as("lbl"))
          .localCheckpoint(false)
        var prevSum = lblSum(labels)
        var converged = false
        var rounds = 0
        var dumped = false
        while (!converged && rounds < 25) {
          val prop = labels
            .union(edges.join(labels, col("db") === col("id"))
              .select(col("da").as("id"), col("lbl")))
            .groupBy("id").agg(min("lbl").as("lbl"))
            .localCheckpoint()
          val lookup = prop.select(col("id").as("lid"), col("lbl").as("llbl"))
          val next = prop.join(lookup, col("lbl") === col("lid"), "left")
            .select(col("id"),
              least(col("lbl"), coalesce(col("llbl"), col("lbl"))).as("lbl"))
            .localCheckpoint(false)
          val s2 = lblSum(next)
          if (!dumped) { dumped = true }
          labels = next
          converged = s2.compareTo(prevSum) == 0
          prevSum = s2
          rounds += 1
        }
        require(converged)
        labels
      } finally { edges.unpersist(): Unit }
    }

    // variant D: legacy eager rounds, but edges PRE-PARTITIONED by the
    // join key so the per-round propagate join never re-shuffles them
    def variantD(p: DataFrame): DataFrame = {
      val p0 = p.localCheckpoint()
      val edges = p0.union(p0.select(col("db").as("da"), col("da").as("db")))
        .repartition(col("db")).persist()
      def lblSum(df: DataFrame): java.math.BigDecimal =
        df.agg(coalesce(
          sum(col("lbl").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(java.math.BigDecimal.ZERO))).collect()(0).getDecimal(0)
      try {
        var labels = edges.groupBy(col("da").as("id"))
          .agg(min(least(col("da"), col("db"))).as("lbl"))
          .localCheckpoint()
        var prevSum = lblSum(labels)
        var converged = false
        var rounds = 0
        while (!converged && rounds < 25) {
          val prop = labels
            .union(edges.join(labels, col("db") === col("id"))
              .select(col("da").as("id"), col("lbl")))
            .groupBy("id").agg(min("lbl").as("lbl"))
            .localCheckpoint()
          val lookup = prop.select(col("id").as("lid"), col("lbl").as("llbl"))
          val next = prop.join(lookup, col("lbl") === col("lid"), "left")
            .select(col("id"),
              least(col("lbl"), coalesce(col("llbl"), col("lbl"))).as("lbl"))
            .localCheckpoint()
          val s2 = lblSum(next)
          labels = next
          converged = s2.compareTo(prevSum) == 0
          prevSum = s2
          rounds += 1
        }
        require(converged)
        labels
      } finally { edges.unpersist(): Unit }
    }

    if (sys.env.get("CC_DUMP_PLAN").contains("1")) {
      // one fused round's executed plan: is the propagate exchange reused?
      val p0 = pairs.localCheckpoint()
      val edges = p0.union(p0.select(col("db").as("da"), col("da").as("db")))
      val labels = edges.groupBy(col("da").as("id"))
        .agg(min(least(col("da"), col("db"))).as("lbl")).localCheckpoint()
      val prop = labels
        .union(edges.join(labels, col("db") === col("id"))
          .select(col("da").as("id"), col("lbl")))
        .groupBy("id").agg(min("lbl").as("lbl"))
      val lookup = prop.select(col("id").as("lid"), col("lbl").as("llbl"))
      val next = prop.join(lookup, col("lbl") === col("lid"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("llbl"), col("lbl"))).as("lbl"))
      next.count()
      System.err.println(next.queryExecution.executedPlan.toString.take(8000))
    }

    def run(f: DataFrame => DataFrame): Double = {
      System.gc()
      val t0 = System.nanoTime()
      f(pairs).count()
      (System.nanoTime() - t0) / 1e9
    }

    // equality of labelings
    val a = graft.operators.DedupQueries.componentsForProbe(pairs)
    val b = legacy(pairs)
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "fused and legacy labelings differ")
    System.err.println("CC labelings identical")

    (1 to 3).foreach { i =>
      val on = run(graft.operators.DedupQueries.componentsForProbe)
      val off = run(legacy)
      val c = run(variantC)
      val d = run(variantD)
      System.err.println(f"CC pass$i fused=$on%6.3f legacy=$off%6.3f eagerPropLazyNext=$c%6.3f edgesPrePart=$d%6.3f")
    }
    spark.stop()
  }
}
