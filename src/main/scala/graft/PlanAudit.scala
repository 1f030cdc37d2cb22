package graft

import org.apache.spark.sql.SparkSession

/** Plan hygiene audit: `explain(formatted)` for every declared query with
  * red-flag grep — missing parquet filter pushdown, unexpected cartesian
  * products, narrow WholeStageCodegen coverage. Run:
  * `sbt "runMain graft.PlanAudit [sfDir] [namePrefix]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefix = args.lift(1).getOrElse("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (q <- Registry.all if q.name.startsWith(prefix)) {
      val plan = try {
        val df = q.run(spark, sfDir)
        df.collect() // materialize so AQE settles on the final plan
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
      val flags = Seq(
        "cartesian" -> plan.toLowerCase.contains("cartesianproduct"),
        "bnlj" -> plan.contains("BroadcastNestedLoopJoin"),
        "no-codegen-scan" -> !Seq("Scan parquet", "Scan csv", "Scan json",
          "Scan orc", "Scan text", "Scan binaryFile", "Scan ExistingRDD",
          "LocalTableScan").exists(plan.contains),
        "python-udf" -> plan.contains("Python"),
      ).collect { case (f, true) => f }
      val nCodegen = "codegen id : (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
      val nExchange = "Exchange".r.findAllIn(plan).length
      println(f"${q.name}%-28s codegen=$nCodegen%-3d exchange=$nExchange%-3d ${flags.mkString(",")}")
      if (args.contains("--full")) println(plan)
    }
    spark.stop()
  }
}
