package graft

/** Gate: every oracle-compared query must produce only atomic (pandas-
  * hashable) output columns. The driver's normalizer sorts every column
  * before hashing, and an ARRAY/MAP/STRUCT column dies in sort_values
  * ("unhashable type: numpy.ndarray"), turning a correct answer into a
  * driver err — this bit q_embed_quantize in round 6 and q_duckdb_funcs4
  * in round 7. Mostly schema analysis, but the ITERATIVE builders
  * (connected components, k-means seeding) run real driver actions
  * during DataFrame construction, so this sweep costs a few sf0.001
  * pipeline executions — keep sfDir tiny and unpersist between queries.
  */
class VerifySchemaSpec extends SparkSpecBase {
  test("oracle-compared queries expose only driver-sortable column types") {
    val oracle = SparkEntry.oracleSql
    val offenders = SparkEntry.queries.toSeq
      .filter { case (name, _) => oracle.contains(name) }
      .flatMap { case (name, fn) =>
        val schema =
          try fn(spark, sfDir).schema
          catch { case e: Throwable => fail(s"$name failed to analyze: ${e.getMessage}") }
        spark.sparkContext.getPersistentRDDs.valuesIterator
          .foreach(_.unpersist(blocking = false))
        schema.fields.collect {
          case f if !Verify.isDriverSortable(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      }
    assert(offenders.isEmpty,
      s"non-atomic oracle outputs (serialize with to_json/array_to_string): ${offenders.mkString("; ")}")
  }
}
