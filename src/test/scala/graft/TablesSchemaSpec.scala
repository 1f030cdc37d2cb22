package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-drift insurance (VERDICT r4 #2). The driver has regenerated the
  * testdata corpus twice, each time changing a physical parquet encoding
  * (INT64-nanos → timestamp[us]) and silently breaking every consumer of
  * the drifted column. This spec pins the POST-`Tables(...)` logical schema
  * of every table across every shipped SF dir, so the next drift fails ONE
  * focused test with a readable type diff instead of 15 cascading analysis
  * errors in unrelated suites.
  *
  * Nullability is intentionally ignored: it carries no semantic weight for
  * the oracles and flaps with writer metadata.
  */
class TablesSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // name -> (colName, canonical DataType), in declared column order.
  // events.ts is pinned to TimestampType — the contract Tables.normalizeEventTs
  // exists to uphold, whatever the parquet encoding of the day is.
  // o_orderdate / l_shipdate are pinned to whatever they read as today
  // (TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ); the oracles are green
  // on that type, so a change is drift worth failing on, not normalizing away.
  private val pinned: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  private val sfDirs: Seq[String] =
    Seq("sf0.001", "sf0.01", "sf0.1").map(sf => s"/root/testdata/$sf")
      .filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))

  test("at least one SF dir is present") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* dirs found")
  }

  for (dir <- sfDirs; name <- Tables.names) {
    test(s"$dir/$name matches the pinned canonical schema") {
      val got = Tables(spark, dir, name).schema
        .map(f => f.name -> normalizeArray(f.dataType))
      val want = pinned(name)
      assert(got == want,
        s"\nCORPUS DRIFT in $dir/$name.parquet\n  expected: ${fmt(want)}\n  actual:   ${fmt(got)}")
    }
  }

  // Tables.readBack must hand back EXACTLY what schema inference would
  // have returned for a freshly-written fixture (that is its whole
  // contract — it only exists to skip the inference job). Pinned for the
  // two layouts it serves: flat, and hive-partitioned (where inference
  // reorders the partition column to the end).
  test("readBack schema equals inferred schema (flat + partitioned)") {
    import org.apache.spark.sql.functions._
    val dir = sfDirs.head
    val out = java.nio.file.Files.createTempDirectory("readback-spec").toString
    val written = Tables(spark, dir, "nation").select(
      col("n_nationkey").cast("long").as("id"),
      struct(col("n_name").as("name"), col("n_regionkey").as("region")).as("info"),
      array(col("n_name")).as("tags"))
    written.write.mode("overwrite").parquet(s"$out/flat")
    assert(Tables.readBack(spark, written.schema, s"$out/flat").schema ==
      spark.read.parquet(s"$out/flat").schema)
    val docs = Tables(spark, dir, "documents")
    docs.write.mode("overwrite").partitionBy("source").parquet(s"$out/hive")
    assert(Tables.readBack(spark, docs.schema, s"$out/hive", Seq("source")).schema ==
      spark.read.parquet(s"$out/hive").schema)
  }

  // ArrayType nullability of elements is writer metadata, not semantics
  private def normalizeArray(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(normalizeArray(e))
    case other           => other
  }

  private def fmt(s: Seq[(String, DataType)]): String =
    s.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")
}
