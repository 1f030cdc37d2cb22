package graft.sources

/** Bounded-prefix CSV dialect detection — the reference inherits
  * DuckDB's sniffer (`read_csv` auto-detects delimiter/quote,
  * core_processor.rs:413-418); Spark's CSV source hardcodes the comma,
  * so a semicolon- or tab-delimited export (ubiquitous in European
  * tooling) would load as one mangled column. Same driver-side cost
  * class as the existing 4 KB type sniffs: one bounded read, no job.
  *
  * Algorithm (DuckDB's shape, simplified to its defaults): over the
  * first [[MaxLines]] complete lines of a [[PrefixBytes]] prefix, score
  * each candidate delimiter by quote-aware per-line field counts — a
  * delimiter is viable when every sampled line yields the SAME count
  * > 1; among viable candidates the highest field count wins, ties
  * break by candidate priority (`,` `;` `\t` `|`). Nothing viable →
  * comma (Spark's default, also DuckDB's last resort). */
object CsvDialect {

  val Candidates: Seq[Char] = Seq(',', ';', '\t', '|')
  private val PrefixBytes = 16384
  private val MaxLines = 32

  /** The sniffed delimiter for the file at `path`. The sniff is a pure
    * optimization: a directory, glob, or non-local URI that
    * `spark.read.csv` itself would accept must not make the probe throw
    * before the reader runs — any unreadable/non-regular path falls
    * back to the comma default. */
  def sniffSeparator(path: String): String = {
    val probeFile =
      try {
        val f = new java.io.File(path)
        if (f.isFile) Some(f)
        else if (f.isDirectory)
          // a directory of part files: sniff the first regular csv-ish
          // member; absent one, fall back
          Option(f.listFiles()).getOrElse(Array.empty)
            .filter(_.isFile).sortBy(_.getName)
            .find(m => !m.getName.startsWith(".") && !m.getName.startsWith("_"))
        else None
      } catch { case _: Exception => None }
    probeFile match {
      case None => ","
      case Some(f) =>
        try {
          val in = new java.io.FileInputStream(f)
          val prefix =
            try {
              val buf = new Array[Byte](PrefixBytes)
              val n = math.max(0, in.read(buf))
              new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
            } finally in.close()
          sniffSeparatorIn(prefix).toString
        } catch { case _: Exception => "," }
    }
  }

  /** Sniff over an in-memory prefix (unit-test surface). */
  private[sources] def sniffSeparatorIn(prefix: String): Char = {
    val raw = prefix.split("\n", -1)
    // the final element is a partial line unless the prefix ended the
    // file; counting a truncated line would skew every candidate
    val lines = (if (raw.length > 1) raw.dropRight(1) else raw)
      .map(_.stripSuffix("\r")).filter(_.nonEmpty).take(MaxLines)
    if (lines.isEmpty) return ','
    val viable = Candidates.flatMap { sep =>
      val counts = lines.map(fieldCount(_, sep))
      if (counts.distinct.length == 1 && counts.head > 1) Some(sep -> counts.head)
      else None
    }
    if (viable.isEmpty) ','
    else viable.maxBy(_._2)._1 // stable: ties keep candidate order
  }

  /** Quote-aware field count: separators inside double-quoted sections
    * don't split; `""` inside quotes is the escaped quote. */
  private def fieldCount(line: String, sep: Char): Int = {
    var fields = 1
    var inQuote = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQuote = !inQuote
      else if (c == sep && !inQuote) fields += 1
      i += 1
    }
    fields
  }
}
