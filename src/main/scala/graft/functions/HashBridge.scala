package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-engine deterministic hash: first 8 hex chars of md5 as a
  * uint32-in-long. md5 is the ONLY hash Spark and DuckDB share bit-for-bit,
  * which makes this the primitive every oracle-checkable hashing stage
  * (dedup shingles, sampling, fingerprints) is built on.
  *
  * Spark form: `conv(substring(md5(x),1,8),16,10)`;
  * DuckDB form: `('0x'||SUBSTR(MD5(x),1,8))::BIGINT`.
  */
object HashBridge {
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
}
