package graft.sinks

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Output file-name pattern mini-language for grouped direct output —
  * capability parity with the reference's OutputPatternGenerator
  * (runtime/.../directio/OutputPatternGenerator.scala:25-195: constants,
  * property placeholders, formatted number/date, random), re-specified
  * with our own syntax:
  *
  *  - literal text              → copied as-is
  *  - `{col}`                   → value of the grouping column
  *  - `{seq}` / `{seq:%04d}`    → per-group file sequence number
  *  - `{date:yyyyMMdd}`         → job date
  *  - `{random:lo-hi}`          → deterministic pseudo-random int in
  *                                 [lo, hi] (seeded per file: stable reruns)
  *
  * Example: `result-{o_orderstatus}-{seq:%03d}-{random:0-99}.parquet`.
  */
final case class OutputPattern(segments: Seq[OutputPattern.Segment]) {

  /** Render a file name for (group column values, file sequence no.). */
  def render(groupValues: Map[String, String], seq: Int,
      date: LocalDate = LocalDate.now(), seed: Long = 42L): String = {
    import OutputPattern._
    segments.map {
      case Lit(s) => s
      case Col(name) => groupValues.getOrElse(name,
        throw new IllegalArgumentException(s"no grouping value for {$name}"))
      case SeqNo(fmt) => fmt.format(seq)
      case DatePart(fmt) => date.format(DateTimeFormatter.ofPattern(fmt))
      case Random(lo, hi) =>
        val h = graft.functions.Hash64.mix(seed ^ (seq.toLong << 17) ^ groupValues.hashCode())
        (Math.floorMod(h, (hi - lo + 1).toLong) + lo).toString
    }.mkString
  }
}

object OutputPattern {
  sealed trait Segment
  final case class Lit(s: String) extends Segment
  final case class Col(name: String) extends Segment
  final case class SeqNo(fmt: String) extends Segment
  final case class DatePart(fmt: String) extends Segment
  final case class Random(lo: Int, hi: Int) extends Segment

  private val Placeholder = """\{([^}]*)\}""".r

  def parse(pattern: String): OutputPattern = {
    val segs = Seq.newBuilder[Segment]
    var last = 0
    for (m <- Placeholder.findAllMatchIn(pattern)) {
      if (m.start > last) segs += Lit(pattern.substring(last, m.start))
      val body = m.group(1)
      segs += (body match {
        case "seq" => SeqNo("%d")
        case s if s.startsWith("seq:") => SeqNo(s.stripPrefix("seq:"))
        case s if s.startsWith("date:") => DatePart(s.stripPrefix("date:"))
        case s if s.startsWith("random:") =>
          val Array(lo, hi) = s.stripPrefix("random:").split("-", 2)
          Random(lo.toInt, hi.toInt)
        case col => Col(col)
      })
      last = m.end
    }
    if (last < pattern.length) segs += Lit(pattern.substring(last))
    OutputPattern(segs.result())
  }
}
