package graft.tools
import graft._
object Dbg {
  def main(args: Array[String]): Unit = {
    val sp = Engine.session("local[2]")
    sp.sparkContext.setLogLevel("ERROR")
    sp.read.parquet("/root/testdata/sf0.001/documents.parquet").createOrReplaceTempView("documents")
    def t(sql: String): Unit =
      try {
        val df = Engine.query(sp, sql)
        println(s"OK  [${sql.take(70).replace('\n',' ')}] -> ${df.collect().take(2).mkString("; ")}")
      } catch { case e: Throwable =>
        println(s"ERR [${sql.take(70).replace('\n',' ')}] -> ${e.toString.replace('\n',' ').take(220)}")
      }
    t("SELECT doc_id FROM documents ORDER BY doc_id LIMIT ' 25 '")
    t("SELECT doc_id, (INTERVAL (doc_id % 40) HOURS + INTERVAL (doc_id % 3) MONTHS)::VARCHAR AS iv FROM documents ORDER BY doc_id LIMIT 3")
    t("SELECT doc_id, reverse('ab́c' || lang) AS g FROM documents ORDER BY doc_id LIMIT 3")
    t("SELECT doc_id, length_grapheme('x👨‍👩' || lang) AS g FROM documents ORDER BY doc_id LIMIT 3")
    t("SELECT doc_id, (doc_id < 5) < 2 AS chain FROM documents ORDER BY doc_id LIMIT 3")
    t("SELECT doc_id, (DATE '2024-01-31' + (INTERVAL '1 month' + INTERVAL (doc_id % 4) DAYS))::VARCHAR AS a FROM documents ORDER BY doc_id LIMIT 3")
    sp.stop()
  }
}
