package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parser for the Polars duration-offset mini-language used by the reference's
  * recency threshold config (`assets/takeout.py:17-33,71`: `"-15d"`, `"-3mo"`)
  * into Spark interval arithmetic.
  *
  * Grammar: optional leading `-`, then 1+ `<int><unit>` terms with unit in
  * `y | q | mo | w | d | h | m | s | ms | us | ns` (Polars `dt.offset_by`).
  * Calendar-aware parts (y/q/mo) become month intervals (Spark's
  * timestamp+month arithmetic clamps to month end exactly like Polars);
  * the rest become microseconds. Nanos truncate to micros (Spark precision).
  */
object PolarsOffset {

  final case class Offset(months: Int, micros: Long) {
    def negate: Offset = Offset(-months, -micros)
  }

  private val term = "([0-9]+)(mo|ms|us|ns|[yqwdhms])".r

  /** Parse or throw IllegalArgumentException on malformed input. */
  def parse(s: String): Offset = {
    val trimmed = s.trim
    require(trimmed.nonEmpty, "empty offset")
    val (neg, body) =
      if (trimmed.startsWith("-")) (true, trimmed.substring(1)) else (false, trimmed)
    var months = 0
    var micros = 0L
    var consumed = 0
    for (m <- term.findAllMatchIn(body)) {
      require(m.start == consumed, s"malformed offset '$s' at '${body.substring(consumed)}'")
      consumed = m.end
      val n = m.group(1).toLong
      m.group(2) match {
        case "y" => months += (n * 12).toInt
        case "q" => months += (n * 3).toInt
        case "mo" => months += n.toInt
        case "w" => micros += n * 7L * 86400L * 1000000L
        case "d" => micros += n * 86400L * 1000000L
        case "h" => micros += n * 3600L * 1000000L
        case "m" => micros += n * 60L * 1000000L
        case "s" => micros += n * 1000000L
        case "ms" => micros += n * 1000L
        case "us" => micros += n
        case "ns" => micros += n / 1000L
      }
    }
    require(consumed == body.length && consumed > 0, s"malformed offset '$s'")
    val o = Offset(months, micros)
    if (neg) o.negate else o
  }

  /** `ts.offset_by(offset)` — apply a Polars offset string to a timestamp
    * column. Pure column arithmetic (codegen'd, no UDF). */
  def offsetBy(ts: Column, offset: String): Column = {
    val o = parse(offset)
    var c = ts
    if (o.months != 0)
      c = c + make_interval(lit(0), lit(o.months), lit(0), lit(0), lit(0), lit(0), lit(0))
    if (o.micros != 0L) {
      val secs = java.math.BigDecimal.valueOf(o.micros, 6) // exact micros as decimal seconds
      c = c + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0), lit(secs))
    }
    c
  }
}
