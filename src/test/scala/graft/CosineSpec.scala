package graft

import org.apache.spark.sql.functions._

/** Native array_cosine_similarity expression: value, nulls, codegen,
  * SQL registration (SURVEY §2.2 array family — the custom gap).
  */
class CosineSpec extends SparkSpecBase {

  test("cosine of known vectors matches hand computation") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)), // orthogonal → 0
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)), // identical → 1
      (Array(1f, 0f, 0f), Array(-1f, 0f, 0f)) // opposite → -1
    ).toDF("a", "b")
    val got = df.select(
      round(GraftFunctions.arrayCosineSimilarity(col("a"), col("b")), 9))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 1.0, -1.0))
  }

  test("null input propagates null") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val got = df.select(
      GraftFunctions.arrayCosineSimilarity(col("a"), col("b"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("SQL registration: array_cosine_similarity callable from SQL") {
    Functions.registerAll(spark)
    val got = spark
      .sql("SELECT round(array_cosine_similarity(array(1.0f,0.0f), array(1.0f,0.0f)), 9) AS c")
      .collect().head.getDouble(0)
    assert(got == 1.0)
  }

  test("expression stays inside whole-stage codegen") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val plan = emb.select(
      GraftFunctions.arrayCosineSimilarity(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project [array_cosine_similarity"))
  }
}
