package graft

import java.time.format.DateTimeFormatter
import java.time.{LocalDate, LocalDateTime}

/** C-style strftime format → java.time pattern translation, for the
  * DuckDB/pg `strftime`/`strptime` surface (the reference serves both
  * through DuckDB's ICU-backed implementations). Covers the
  * specifiers DuckDB documents for round-trippable timestamps;
  * unknown specifiers pass through as literals.
  */
object StrfTime {

  def toJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt(i)
      if (c == '%' && i + 1 < fmt.length && fmt(i + 1) == '-' &&
          i + 2 < fmt.length) {
        // `%-X` = the no-padding variants (probed: `%-d` renders 5,
        // not 05) — java.time's single-letter patterns
        fmt(i + 2) match {
          case 'd' => sb ++= "d"
          case 'm' => sb ++= "M"
          case 'H' => sb ++= "H"
          case 'I' => sb ++= "h"
          case 'M' => sb ++= "m"
          case 'S' => sb ++= "s"
          case 'j' => sb ++= "D"
          case 'y' => sb ++= "y"
          case other => sb += other
        }
        i += 3
      } else if (c == '%' && i + 1 < fmt.length) {
        fmt(i + 1) match {
          case 'Y' => sb ++= "yyyy"
          case 'y' => sb ++= "yy"
          case 'm' => sb ++= "MM"
          case 'd' => sb ++= "dd"
          case 'H' => sb ++= "HH"
          case 'I' => sb ++= "hh"
          case 'p' => sb ++= "a"
          case 'M' => sb ++= "mm"
          case 'S' => sb ++= "ss"
          case 'f' => sb ++= "SSSSSS"
          case 'g' => sb ++= "SSS"
          case 'j' => sb ++= "DDD"
          case 'a' => sb ++= "EEE"
          case 'A' => sb ++= "EEEE"
          case 'b' => sb ++= "MMM"
          case 'B' => sb ++= "MMMM"
          case 'z' => sb ++= "xx" // ±HHmm zone offset
          case '%' => sb += '%'
          case other => sb += other // unknown specifier → literal
        }
        i += 2
      } else if (c.isLetter) {
        // letters are pattern chars in java.time — quote the whole
        // literal run as ONE span ('day', never 'd''a''y' which java
        // reads as escaped quotes)
        sb += '\''
        while (i < fmt.length && fmt(i).isLetter) { sb += fmt(i); i += 1 }
        sb += '\''
      } else if (c == '\'') {
        sb ++= "''"; i += 1
      } else {
        sb += c; i += 1
      }
    }
    sb.toString
  }

  def parse(s: String, fmt: String): java.sql.Timestamp = {
    val f = DateTimeFormatter.ofPattern(toJava(fmt))
    val ldt =
      try LocalDateTime.parse(s, f)
      catch { case _: java.time.DateTimeException =>
        LocalDate.parse(s, f).atStartOfDay()
      }
    java.sql.Timestamp.valueOf(ldt)
  }
}
