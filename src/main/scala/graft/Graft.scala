package graft

import graft.plans.{IngestJob, IngestPipeline, JdbcPostgisSink, ParquetSink, Sink}
import org.apache.spark.sql.SparkSession

/** The library's front door — the one-call API the reference exposes as
  * `process_file(file_path, table_name, postgis_uri, schema)`
  * (reference: core_processor.rs:463-476; its README documents a
  * `launch_process_file` name that does not exist in v0.2.6 — API drift
  * noted in SURVEY.md §3). A reference user switches by swapping that
  * call for this one.
  */
object Graft {

  /** Ingest `path` into `schema.table` of the PostGIS at `jdbcUrl`:
    * detect → read → discover geometry → infer CRS → reproject to WGS84 →
    * 2-phase geometry write. `ddlExec` runs the DDL/PL-pgSQL statements
    * (no PostgreSQL driver ships in this offline build, so statement
    * execution is injected; with a driver on the classpath:
    * `sql => { val st = conn.createStatement(); st.execute(sql); st.close() }`).
    */
  def processFile(
      spark: SparkSession,
      path: String,
      tableName: String,
      jdbcUrl: String,
      schemaName: String,
      ddlExec: String => Unit): IngestPipeline.Result =
    IngestPipeline.run(spark, IngestJob(path, tableName, schemaName),
      new JdbcPostgisSink(jdbcUrl, ddlExec))

  /** Same pipeline, landing in parquet under `outputRoot` instead of
    * PostGIS — the sink used by tests and benchmarking. */
  def processFileToParquet(
      spark: SparkSession,
      path: String,
      tableName: String,
      outputRoot: String,
      schemaName: String = "public"): IngestPipeline.Result =
    IngestPipeline.run(spark, IngestJob(path, tableName, schemaName),
      new ParquetSink(outputRoot))

  /** Fully custom target. */
  def processFile(
      spark: SparkSession, job: IngestJob, sink: Sink): IngestPipeline.Result =
    IngestPipeline.run(spark, job, sink)
}
