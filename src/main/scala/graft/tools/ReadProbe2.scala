package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: does deepNullable(df.schema) equal the parquet read-back
  * inferred schema for typical fixture writes? */
object ReadProbe2 {
  private def deepNullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = deepNullable(f.dataType), nullable = true)))
      case a: ArrayType => a.copy(elementType = deepNullable(a.elementType), containsNull = true)
      case m: MapType => m.copy(valueType = deepNullable(m.valueType), valueContainsNull = true)
      case o => o
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("8", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = "/tmp/probe_rb.parquet"
    val df = graft.Tables(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("id"),
        struct(col("n_name").as("name"), col("n_regionkey").as("region")).as("info"),
        array(col("n_name"), concat(lit("r"), col("n_regionkey"))).as("tags"))
    df.write.mode("overwrite").parquet(out)
    val inferred = spark.read.parquet(out).schema
    val asNull = deepNullable(df.schema)
    System.err.println(s"inferred == asNullable: ${inferred == asNull}")
    System.err.println(s"inferred:   $inferred")
    System.err.println(s"asNullable: $asNull")
    // partitioned write: does read-back with basePath match too?
    val out2 = "/tmp/probe_rb2.parquet"
    val df2 = graft.Tables(spark, dir, "documents")
    df2.write.mode("overwrite").partitionBy("source").parquet(out2)
    val inf2 = spark.read.parquet(out2).schema
    System.err.println(s"partitioned inferred: $inf2")
    System.err.println(s"orig asNullable:      ${deepNullable(df2.schema)}")
    spark.stop()
  }
}
