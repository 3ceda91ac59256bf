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

  /** Postgres type aliases in cast position (`1.5::float8`,
    * `CAST(x AS int8)`) → Spark type names. Spark 4 already parses the
    * `::` cast operator; only the pg alias names are missing.
    */
  private val pgTypeAliases = Map(
    "int2" -> "smallint", "int4" -> "int", "int8" -> "bigint",
    "float4" -> "float", "float8" -> "double", "bool" -> "boolean",
    "bytea" -> "binary")
  private val aliasAlt = pgTypeAliases.keys.mkString("|")
  private val castOp = s"""(?i)::\\s*($aliasAlt)\\b""".r
  private val castAs = s"""(?i)\\bAS\\s+($aliasAlt)\\s*\\)""".r

  def rewrite(sql: String): String = {
    val s1 = genSeries.replaceAllIn(sql, m => {
      val kw = m.group(1)
      val args = m.group(2)
      val alias = Option(m.group(4)).getOrElse("generate_series")
      java.util.regex.Matcher.quoteReplacement(
        s"$kw (SELECT explode(sequence($args)) AS $alias)")
    })
    val s2 = castOp.replaceAllIn(s1,
      m => "::" + pgTypeAliases(m.group(1).toLowerCase))
    castAs.replaceAllIn(s2,
      m => "AS " + pgTypeAliases(m.group(1).toLowerCase) + ")")
  }
}
