package graft

/** String-level pre-pass for pg/DuckDB dialect sugar Spark SQL lacks
  * (SURVEY §7 M4). v0 is a conservative regex pre-pass; each rewrite
  * only fires on patterns Spark would otherwise reject, so valid Spark
  * SQL passes through byte-identical.
  */
object SqlRewrites {

  /** `FROM generate_series(a, b [, step])` (DuckDB/pg table function;
    * reference README.md:54, client/go/cmd/simple/main.go:27 —
    * inclusive bounds) → lateral explode of Spark's `sequence`.
    */
  private val genSeries =
    """(?i)(from|join)\s+generate_series\s*\(([^()]*)\)(\s+(?:as\s+)?(\w+))?""".r

  def rewrite(sql: String): String = {
    genSeries.replaceAllIn(sql, m => {
      val kw = m.group(1)
      val args = m.group(2)
      val alias = Option(m.group(4)).getOrElse("generate_series")
      java.util.regex.Matcher.quoteReplacement(
        s"$kw (SELECT explode(sequence($args)) AS $alias)")
    })
  }
}
