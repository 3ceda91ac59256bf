package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import graft.server.PgWireServer

/** Wire-level protocol tests via a minimal in-process frontend —
  * replicates the reference's e2e client flow
  * (client/go/cmd/simple/main.go: CREATE → INSERT from
  * generate_series → SELECT → row decode) plus the fixtures in
  * FIXTURES.md §D (type coverage incl. the columns the reference
  * silently drops, error SQLSTATE, session isolation).
  */
class PgWireSpec extends SparkSpecBase {

  private lazy val server = {
    val s = new PgWireServer(spark, port = 0, Tables.registerAll(_, sfDir))
    val port = s.start()
    (s, port)
  }

  /** Minimal pg frontend for tests. */
  final class Client(port: Int) {
    private val sock = new Socket("127.0.0.1", port)
    private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))

    def startup(withSslProbe: Boolean = false): Unit = {
      if (withSslProbe) {
        out.writeInt(8); out.writeInt(80877103); out.flush()
        assert(in.read() == 'N', "SSLRequest must be answered 'N'")
      }
      val params = "user\u0000test\u0000database\u0000main\u0000\u0000".getBytes(UTF_8)
      out.writeInt(8 + params.length); out.writeInt(196608)
      out.write(params); out.flush()
      collect() // drain auth/params until ReadyForQuery
    }

    def send(msgType: Char, payload: Array[Byte]): Unit = {
      out.writeByte(msgType); out.writeInt(payload.length + 4)
      out.write(payload); out.flush()
    }

    def query(sql: String): (Seq[String], Seq[Seq[Option[String]]], Seq[String], Seq[(String, String)]) =
      { send('Q', (sql + "\u0000").getBytes(UTF_8)); collect() }

    /** read until ReadyForQuery; gather cols, rows, command tags, errors. */
    def collect(): (Seq[String], Seq[Seq[Option[String]]], Seq[String], Seq[(String, String)]) = {
      var cols = Seq.empty[String]
      val rows = Seq.newBuilder[Seq[Option[String]]]
      val tags = Seq.newBuilder[String]
      val errs = Seq.newBuilder[(String, String)]
      var done = false
      while (!done) {
        val t = in.read().toChar
        val len = in.readInt()
        val p = new Array[Byte](len - 4); in.readFully(p)
        val r = new graft.server.PgWire.PayloadReader(p)
        t match {
          case 'T' =>
            val n = r.int16()
            cols = (0 until n).map { _ =>
              val name = r.cstr()
              r.int32(); r.int16(); r.int32(); r.int16(); r.int32(); r.int16()
              name
            }
          case 'D' =>
            val n = r.int16()
            rows += (0 until n).map { _ =>
              val l = r.int32()
              if (l == -1) None else Some(new String(r.bytes(l), UTF_8))
            }
          case 'C' => tags += r.cstr()
          case 'E' =>
            var code = ""; var msg = ""
            var f = r.byte()
            while (f != 0) {
              val v = r.cstr()
              if (f == 'C') code = v
              if (f == 'M') msg = v
              f = r.byte()
            }
            errs += ((code, msg))
          case 'Z' => done = true
          case _ => // ignore
        }
      }
      (cols, rows.result(), tags.result(), errs.result())
    }

    def close(): Unit = { send('X', Array.empty); sock.close() }
  }

  test("go-client flow: SSL probe, CREATE, INSERT from generate_series, SELECT") {
    val (_, port) = server
    val c = new Client(port)
    c.startup(withSslProbe = true)
    c.query("DROP TABLE IF EXISTS users")
    val (_, _, tag1, e1) = c.query("CREATE TABLE users(name string) USING parquet")
    assert(e1.isEmpty, e1)
    assert(tag1.head.startsWith("CREATE"))
    val (_, _, tag2, e2) = c.query(
      "INSERT INTO users select 'euiko' from generate_series(0, 10)")
    assert(e2.isEmpty, e2)
    assert(tag2.head == "INSERT 0 11")
    val (cols, rows, tag3, _) = c.query("SELECT * FROM users")
    assert(cols == Seq("name"))
    assert(rows.length == 11 && rows.forall(_ == Seq(Some("euiko"))))
    assert(tag3.head == "SELECT 11")
    c.query("DROP TABLE users")
    c.close()
  }

  test("type coverage incl. reference's silently-dropped types") {
    val (_, port) = server
    val c = new Client(port)
    c.startup()
    val (cols, rows, _, errs) = c.query(
      "SELECT true AS b, 1Y AS i1, 2S AS i2, 3 AS i4, 4L AS i8, " +
        "CAST(1.5 AS FLOAT) AS f4, 2.5D AS f8, 'str' AS s, " +
        "CAST(1.25 AS DECIMAL(10,2)) AS dec, DATE'2026-08-12' AS d, " +
        "TIMESTAMP'2026-08-12 01:02:03' AS ts, " +
        "CAST(NULL AS INT) AS nul, array(1,2,3) AS arr, " +
        "named_struct('a', 1) AS st, X'DEAD' AS bin")
    assert(errs.isEmpty, errs)
    assert(cols.length == 15, "no column may be dropped")
    val r = rows.head
    assert(r(0) == Some("t"))
    assert(r(5) == Some("1.5"))
    assert(r(8) == Some("1.25"))
    assert(r(9) == Some("2026-08-12"))
    assert(r(10) == Some("2026-08-12 01:02:03"))
    assert(r(11) == None)
    assert(r(12) == Some("{1,2,3}"))
    assert(r(14) == Some("\\xdead"))
    c.close()
  }

  test("errors carry SQLSTATE and connection survives") {
    val (_, port) = server
    val c = new Client(port)
    c.startup()
    val (_, _, _, errs) = c.query("SELEKT 1")
    assert(errs.nonEmpty && errs.head._1 == "42601", errs)
    val (_, _, _, errs2) = c.query("SELECT * FROM no_such_table_xyz")
    assert(errs2.nonEmpty && errs2.head._1 == "42P01", errs2)
    // connection still usable
    val (_, rows, _, e3) = c.query("SELECT 42 AS x")
    assert(e3.isEmpty && rows == Seq(Seq(Some("42"))))
    c.close()
  }

  test("session isolation: temp views are per-connection, catalog shared") {
    val (_, port) = server
    val c1 = new Client(port); c1.startup()
    val c2 = new Client(port); c2.startup()
    c1.query("CREATE TEMP VIEW my_temp AS SELECT 1 AS v")
    val (_, rows1, _, _) = c1.query("SELECT * FROM my_temp")
    assert(rows1 == Seq(Seq(Some("1"))))
    val (_, _, _, errs2) = c2.query("SELECT * FROM my_temp")
    assert(errs2.nonEmpty, "temp view must not leak across connections")
    // shared testdata catalog visible on both
    val (_, r1, _, _) = c1.query("SELECT count(*) AS n FROM region")
    val (_, r2, _, _) = c2.query("SELECT count(*) AS n FROM region")
    assert(r1 == r2 && r1 == Seq(Seq(Some("5"))))
    c1.close(); c2.close()
  }

  test("extended protocol: Parse/Bind/Describe/Execute/Sync") {
    val (_, port) = server
    val c = new Client(port)
    c.startup()
    def cstr(s: String) = (s + "\u0000").getBytes(UTF_8)
    // Parse (unnamed), zero params
    val parse = cstr("") ++ cstr("SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 2") ++ Array[Byte](0, 0)
    c.send('P', parse)
    // Bind unnamed portal to unnamed statement, no params, no result formats
    c.send('B', cstr("") ++ cstr("") ++ Array[Byte](0, 0, 0, 0, 0, 0))
    // Describe portal
    c.send('D', Array[Byte]('P'.toByte) ++ cstr(""))
    // Execute, no row limit
    c.send('E', cstr("") ++ Array[Byte](0, 0, 0, 0))
    // Sync
    c.send('S', Array.empty)
    val (cols, rows, tags, errs) = c.collect()
    assert(errs.isEmpty, errs)
    assert(cols == Seq("n_nationkey"))
    assert(rows == Seq(Seq(Some("0")), Seq(Some("1"))))
    assert(tags.head == "SELECT 2")
    c.close()
  }

  test("COPY TO exports through DataFrame writers") {
    val (_, port) = server
    val c = new Client(port)
    c.startup()
    val out = java.nio.file.Files.createTempDirectory("graft-copy").toString + "/r"
    val (_, _, tags, errs) = c.query(
      s"COPY (SELECT * FROM region) TO '$out' (FORMAT PARQUET)")
    assert(errs.isEmpty, errs)
    assert(tags.head == "COPY 5")
    val (_, rows, _, _) = c.query(
      s"SELECT count(*) AS n FROM parquet.`$out`")
    assert(rows == Seq(Seq(Some("5"))))
    c.close()
  }

  test("multi-statement simple query + compat functions") {
    val (_, port) = server
    val c = new Client(port)
    c.startup()
    val (_, rows, tags, errs) = c.query(
      "SELECT pg_is_in_recovery() AS r; SELECT duckdb_pgwire('Sam') AS g")
    assert(errs.isEmpty, errs)
    assert(rows == Seq(Seq(Some("f")), Seq(Some("DuckdbPgwire Sam 🐥"))))
    assert(tags == Seq("SELECT 1", "SELECT 1"))
    c.close()
  }
}
