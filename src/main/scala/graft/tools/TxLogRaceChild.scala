package graft.tools

import graft.plans.TxLog
import org.apache.spark.sql.SparkSession

/** Forked-JVM writer for the CROSS-PROCESS TxLog race proof: each child
  * is its own JVM (its own SparkSession, its own file handles) hammering
  * appends — and, in `mixed` mode, compactions — against one shared
  * table directory. The hard-link create-if-absent CAS in
  * [[TxLog.publish]] is the only coordination; in-process thread races
  * (TxLogSpec) cannot prove it because the JVM serializes some of the
  * filesystem calls a second process would genuinely race.
  *
  * Protocol: args = table dir, writerId, nAppends, mode(append|mixed).
  * Appends must ALL land (optimistic retry absorbs lost CAS rounds);
  * compactions may legitimately abort with
  * ConcurrentModificationException when a racing commit removed one of
  * their planned files — aborts are counted, never data-affecting.
  * Prints one `DONE` line the parent parses, exits non-zero on any
  * unexpected error. */
object TxLogRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(table, writerId, nStr, mode) = args
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"txlog-race-$writerId")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    import spark.implicits._
    var compacts = 0
    var aborted = 0
    (0 until n).foreach { i =>
      TxLog.append(
        Seq((writerId, i, s"payload-$writerId-$i")).toDF("writer", "seq", "payload"),
        table)
      if (mode == "mixed" && i % 8 == 7) {
        try { TxLog.compact(spark, table, 2); compacts += 1 }
        catch { case _: java.util.ConcurrentModificationException => aborted += 1 }
      }
    }
    println(s"DONE $writerId appends=$n compacts=$compacts aborted=$aborted")
    spark.stop()
  }
}
