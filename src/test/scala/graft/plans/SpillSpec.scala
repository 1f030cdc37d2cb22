package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spill-awareness evidence (the 100 TB claim "operators degrade to disk,
  * never OOM"): the window and sort-merge-join operators are driven in a
  * child session whose per-session spill thresholds force their row
  * buffers out of memory after a few hundred rows. The assertions are
  * (a) the constrained run COMPLETES, (b) its rows equal the
  * unconstrained run exactly — spilling is a transport detail, never a
  * semantics change — and (c) the tasks' spill metrics prove rows
  * actually went to disk, so the test cannot silently pass with the
  * thresholds inert.
  */
class SpillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  /** Executes `df` and returns (rows, spilled bytes across all its tasks).
    * The window/SMJ row buffers spill through UnsafeExternalSorter, which
    * reports into TASK metrics (memory/diskBytesSpilled), not per-operator
    * SQL metrics — so the evidence is collected with a listener. Listener
    * delivery is async; poll briefly until the count stabilizes. */
  private def runAndMeasureSpill(
      df: org.apache.spark.sql.DataFrame): (Seq[org.apache.spark.sql.Row], Long) = {
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          spilled.addAndGet(
            t.taskMetrics.memoryBytesSpilled + t.taskMetrics.diskBytesSpilled): Unit
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val rows = df.collect().toSeq
      // wait for async listener delivery: first for ANY spill evidence,
      // then a settle pass so late task-end events are counted too
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (spilled.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(200)
      Thread.sleep(500)
      (rows, spilled.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("window operator spills under a constrained buffer and stays exact") {
    val s = spark.newSession()
    // each spill cycle opens a 64 MiB sorter page, so the forced-spill
    // demonstration must bound CONCURRENT spillers (2 shuffle
    // partitions) — 32 threads of per-task sorter pages would exhaust
    // the test JVM, which is a harness limit, not an operator property
    s.conf.set("spark.sql.shuffle.partitions", "2")
    // sf0.001 window groups hold ~200 rows, so the demonstration
    // threshold must sit below that
    s.conf.set("spark.sql.windowExec.buffer.spill.threshold", "64")
    s.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "64")
    def runningTotal(sess: org.apache.spark.sql.SparkSession) =
      graft.Tables(sess, dir, "events")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("event_type").orderBy("ts", "event_id")))
        .groupBy("event_type").agg(count(lit(1)).as("n"), max("rn").as("max_rn"))
        .orderBy("event_type")
    val (rows, bytes) = runAndMeasureSpill(runningTotal(s))
    assert(bytes > 0, "window buffer never spilled — thresholds inert, test proves nothing")
    val expected = runningTotal(spark).collect().toSeq
    assert(rows == expected, "spilled window run diverged from the in-memory run")
  }

  test("sort-merge join spills its buffered side and stays exact") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "2") // bound concurrent spillers
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "512")
    s.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "512")
    def fanoutJoin(sess: org.apache.spark.sql.SparkSession) = {
      // orders ⋈ orders on o_orderstatus: few distinct keys, so each key
      // group holds thousands of buffered matches — exactly what the SMJ
      // inner-row buffer must spill
      val o = graft.Tables(sess, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      o.as("a").join(o.as("b"), Seq("o_orderstatus"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("o_orderstatus")
    }
    val (rows, bytes) = runAndMeasureSpill(fanoutJoin(s))
    assert(bytes > 0, "SMJ buffer never spilled — thresholds inert, test proves nothing")
    val expected = fanoutJoin(spark).collect().toSeq
    assert(rows == expected, "spilled SMJ run diverged from the in-memory run")
  }

  test("hash aggregate falls back to sort-based aggregation and stays exact") {
    // the third degradation path: HashAggregate abandons its hash map
    // under memory pressure and finishes as a sort-based aggregate —
    // unbounded group cardinality degrades to sort+spill, never OOM.
    // Triggered via the fallback test hook Spark's own
    // HashAggregationQuerySuite uses (provoking REAL exhaustion would
    // need multi-GB group state in a unit test); the assertion reads
    // the operator's own numTasksFallBacked metric, so the pass is
    // evidence of the executed fallback, not of the hook. (Disk spill
    // beyond the fallback sort is memory-pressure dependent and not
    // asserted — the degradation CONTRACT is the sort fallback.)
    val s = spark.newSession()
    s.conf.set("spark.sql.TungstenAggregate.testFallbackStartsAt", "2, 3")
    def groupedLists(sess: org.apache.spark.sql.SparkSession) =
      graft.Tables(sess, dir, "orders")
        .groupBy("o_custkey")
        .agg(sort_array(collect_list("o_orderkey")).as("ks"))
        .groupBy()
        .agg(count(lit(1)).as("n_groups"),
          sum(org.apache.spark.sql.functions.hash(col("ks")).cast("long")).as("sig"))
    val df = groupedLists(s)
    df.collect()
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p.children.flatMap(all) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          all(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => all(q.plan)
        case _ => Seq.empty
      }))
    val aggMetrics = all(df.queryExecution.executedPlan)
      .filter(_.getClass.getSimpleName.contains("HashAggregate"))
      .flatMap(_.metrics)
    val fallbacks = aggMetrics.collect {
      case (name, m) if name.equalsIgnoreCase("numTasksFallBacked") => m.value
    }.sum
    assert(fallbacks > 0,
      "hash aggregate never fell back to sort — hook inert, test proves nothing")
    assert(df.collect().toSeq == groupedLists(spark).collect().toSeq,
      "sort-fallback aggregation diverged from the hash-based run")
  }
}
