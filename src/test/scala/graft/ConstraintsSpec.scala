package graft

/** NOT NULL / CHECK enforcement and generated columns — the DuckDB
  * constraint surface reachable through the delegated engine
  * (README.md:54 flow allows any DuckDB SQL). Every message and count
  * below is pinned by probe against DuckDB 1.0
  * (tools/probe_r10h.tsv ddl rows + the round-10 probe session).
  */
class ConstraintsSpec extends SparkSpecBase {

  private def q(s: String) = Engine.query(spark, s)
  private def rows(s: String): Seq[Seq[Any]] =
    q(s).collect().map(_.toSeq.toList).toList

  test("NOT NULL enforces on INSERT and UPDATE with DuckDB's message") {
    q("DROP TABLE IF EXISTS cns_nn")
    q("CREATE TABLE cns_nn (a INT NOT NULL, b INT)")
    val e = intercept[IllegalArgumentException](
      q("INSERT INTO cns_nn VALUES (NULL, 5)"))
    assert(e.getMessage ==
      "Constraint Error: NOT NULL constraint failed: cns_nn.a")
    assert(q("INSERT INTO cns_nn VALUES (1, 5)")
      .collect().head.getLong(0) == 1L)
    val e2 = intercept[IllegalArgumentException](
      q("UPDATE cns_nn SET a = NULL"))
    assert(e2.getMessage ==
      "Constraint Error: NOT NULL constraint failed: cns_nn.a")
    // the failed statements left nothing behind
    assert(rows("SELECT * FROM cns_nn") == Seq(Seq(1, 5)))
    q("DROP TABLE cns_nn")
  }

  test("CHECK enforces column- and table-level; NULL passes (SQL rule)") {
    q("DROP TABLE IF EXISTS cns_ck")
    q("CREATE TABLE cns_ck (a INT CHECK (a > 0), b INT, CHECK (b < 100))")
    val e = intercept[IllegalArgumentException](
      q("INSERT INTO cns_ck VALUES (-5, 5)"))
    assert(e.getMessage == "Constraint Error: CHECK constraint failed: cns_ck")
    intercept[IllegalArgumentException](
      q("INSERT INTO cns_ck VALUES (5, 500)"))
    // probed: CHECK admits NULL (constraint is satisfied unless FALSE)
    q("INSERT INTO cns_ck VALUES (NULL, NULL)")
    q("INSERT INTO cns_ck VALUES (3, 30)")
    q("UPDATE cns_ck SET b = 99")
    intercept[IllegalArgumentException](q("UPDATE cns_ck SET b = 500"))
    assert(rows("SELECT * FROM cns_ck ORDER BY a NULLS LAST")
      == Seq(Seq(3, 99), Seq(null, 99)))
    // named table-level constraint spells the same enforcement
    q("DROP TABLE IF EXISTS cns_ck2")
    q("CREATE TABLE cns_ck2 (a INT, CONSTRAINT pos_a CHECK (a > 0))")
    intercept[IllegalArgumentException](
      q("INSERT INTO cns_ck2 VALUES (-1)"))
    q("DROP TABLE cns_ck")
    q("DROP TABLE cns_ck2")
  }

  test("generated columns: both spellings, insert widths, recompute") {
    q("DROP TABLE IF EXISTS cns_g")
    q("CREATE TABLE cns_g (a INT, b INT GENERATED ALWAYS AS (a * 2) VIRTUAL)")
    assert(q("INSERT INTO cns_g (a) VALUES (3), (4)")
      .collect().head.getLong(0) == 2L)
    // without a column list, VALUES supply only the non-generated width
    q("INSERT INTO cns_g VALUES (5)")
    assert(rows("SELECT * FROM cns_g ORDER BY a")
      == Seq(Seq(3, 6), Seq(4, 8), Seq(5, 10)))
    val wide = intercept[IllegalArgumentException](
      q("INSERT INTO cns_g VALUES (6, 99)"))
    assert(wide.getMessage ==
      "Binder Error: table cns_g has 1 columns but 2 values were supplied")
    val named = intercept[IllegalArgumentException](
      q("INSERT INTO cns_g (a, b) VALUES (7, 99)"))
    assert(named.getMessage ==
      "Binder Error: Cannot insert into a generated column")
    val upd = intercept[IllegalArgumentException](
      q("UPDATE cns_g SET b = 5 WHERE a = 3"))
    assert(upd.getMessage ==
      """Binder Error: Cant update column "b" because it is a generated column!""")
    // updating the dependency recomputes the generated value
    q("UPDATE cns_g SET a = 10 WHERE a = 3")
    assert(rows("SELECT * FROM cns_g ORDER BY a")
      == Seq(Seq(4, 8), Seq(5, 10), Seq(10, 20)))
    // STORED refuses with DuckDB's own message
    val st = intercept[Exception](q(
      "CREATE TABLE cns_gs (a INT, b INT GENERATED ALWAYS AS (a) STORED)"))
    assert(st.getMessage.contains("Can not create a STORED generated column!"))
    q("DROP TABLE cns_g")
  }

  test("generated columns: typed, mid-position, DuckDB-dialect exprs") {
    q("DROP TABLE IF EXISTS cns_gt")
    // declared type + :: cast + || concat in the expression
    q("CREATE TABLE cns_gt (a INT, b VARCHAR AS (a::VARCHAR || '!'))")
    q("INSERT INTO cns_gt (a) VALUES (1)")
    assert(rows("SELECT * FROM cns_gt") == Seq(Seq(1, "1!")))
    // RETURNING shows the computed value
    assert(rows("INSERT INTO cns_gt (a) VALUES (9) RETURNING a, b")
      == Seq(Seq(9, "9!")))
    // generated column in the MIDDLE keeps its position (probed)
    q("DROP TABLE IF EXISTS cns_gm")
    q("CREATE TABLE cns_gm (a INT, g AS (a * b), b INT)")
    q("INSERT INTO cns_gm VALUES (2, 3)")
    assert(rows("SELECT * FROM cns_gm") == Seq(Seq(2, 6, 3)))
    q("DROP TABLE cns_gt")
    q("DROP TABLE cns_gm")
  }

  test("generated columns through ALTER: rename rewrites, drop guards") {
    q("DROP TABLE IF EXISTS cns_ga")
    q("CREATE TABLE cns_ga (a INT, g AS (a * 2), b INT)")
    q("INSERT INTO cns_ga VALUES (3, 7)")
    // probed: renaming a dependency succeeds and the column keeps
    // computing (DuckDB rewrites the stored expression)
    q("ALTER TABLE cns_ga RENAME COLUMN a TO aa")
    q("INSERT INTO cns_ga (aa, b) VALUES (5, 8)")
    assert(rows("SELECT * FROM cns_ga ORDER BY aa")
      == Seq(Seq(3, 6, 7), Seq(5, 10, 8)))
    val dep = intercept[IllegalArgumentException](
      q("ALTER TABLE cns_ga DROP COLUMN aa"))
    assert(dep.getMessage == "Cannot drop column: column is a " +
      "dependency of 1 or more generated column(s)")
    // dropping the generated column itself is fine (probed)
    q("ALTER TABLE cns_ga DROP COLUMN g")
    q("INSERT INTO cns_ga VALUES (9, 1)")
    assert(rows("SELECT * FROM cns_ga ORDER BY aa")
      == Seq(Seq(3, 7), Seq(5, 8), Seq(9, 1)))
    q("DROP TABLE cns_ga")
  }

  test("defaults interact: NOT NULL DEFAULT, generated over DEFAULT") {
    q("DROP TABLE IF EXISTS cns_d")
    q("CREATE TABLE cns_d (a INT NOT NULL DEFAULT 3, b INT)")
    q("INSERT INTO cns_d (b) VALUES (1)")
    assert(rows("SELECT * FROM cns_d") == Seq(Seq(3, 1)))
    // DEFAULT VALUES counts only the non-generated width and the
    // generated column computes over the defaulted value
    q("DROP TABLE IF EXISTS cns_dg")
    q("CREATE TABLE cns_dg (a INT DEFAULT 5, g AS (a + 1))")
    q("INSERT INTO cns_dg DEFAULT VALUES")
    assert(rows("SELECT * FROM cns_dg") == Seq(Seq(5, 6)))
    // bare DEFAULT inside VALUES resolves positionally too
    q("INSERT INTO cns_dg VALUES (DEFAULT)")
    assert(rows("SELECT * FROM cns_dg") == Seq(Seq(5, 6), Seq(5, 6)))
    q("DROP TABLE cns_d")
    q("DROP TABLE cns_dg")
  }

  test("upserts respect generated columns and PK NOT NULL") {
    q("DROP TABLE IF EXISTS cns_u")
    q("CREATE TABLE cns_u (k INT PRIMARY KEY, v INT, d AS (v * 10))")
    q("INSERT INTO cns_u VALUES (1, 5), (2, 6)")
    q("INSERT INTO cns_u VALUES (1, 50) " +
      "ON CONFLICT (k) DO UPDATE SET v = excluded.v")
    assert(rows("SELECT * FROM cns_u ORDER BY k")
      == Seq(Seq(1, 50, 500), Seq(2, 6, 60)))
    q("INSERT OR REPLACE INTO cns_u VALUES (2, 60)")
    assert(rows("SELECT * FROM cns_u ORDER BY k")
      == Seq(Seq(1, 50, 500), Seq(2, 60, 600)))
    // DO UPDATE SET on the generated column refuses
    val e = intercept[IllegalArgumentException](
      q("INSERT INTO cns_u VALUES (1, 7) " +
        "ON CONFLICT (k) DO UPDATE SET d = 1"))
    assert(e.getMessage ==
      """Binder Error: Cant update column "d" because it is a generated column!""")
    q("DROP TABLE cns_u")
  }

  test("PRIMARY KEY / UNIQUE uniqueness enforces with DuckDB messages") {
    q("DROP TABLE IF EXISTS cns_p")
    q("CREATE TABLE cns_p (k INT PRIMARY KEY, v INT)")
    q("INSERT INTO cns_p VALUES (1, 10), (2, 20)")
    // duplicate WITHIN the batch: short wording (probed)
    val batch = intercept[IllegalArgumentException](
      q("INSERT INTO cns_p VALUES (3, 30), (3, 31)"))
    assert(batch.getMessage == "Constraint Error: PRIMARY KEY or " +
      """UNIQUE constraint violated: duplicate key "3"""")
    // collision with an existing row: long wording with the doc tail
    val exist = intercept[IllegalArgumentException](
      q("INSERT INTO cns_p VALUES (1, 99)"))
    assert(exist.getMessage.startsWith(
      """Constraint Error: Duplicate key "k: 1" violates primary key """ +
        "constraint."))
    // an UPDATE that lands two rows on one key refuses too
    val upd = intercept[IllegalArgumentException](
      q("UPDATE cns_p SET k = 2 WHERE k = 1"))
    assert(upd.getMessage.contains("""Duplicate key "k: 2""""))
    // UNIQUE admits any number of NULLs (probed)
    q("DROP TABLE IF EXISTS cns_uq")
    q("CREATE TABLE cns_uq (a INT, b INT, UNIQUE (a, b))")
    q("INSERT INTO cns_uq VALUES (1, 1), (1, 2)")
    q("INSERT INTO cns_uq VALUES (1, NULL), (1, NULL)")
    val uq = intercept[IllegalArgumentException](
      q("INSERT INTO cns_uq VALUES (1, 2)"))
    assert(uq.getMessage.startsWith(
      """Constraint Error: Duplicate key "a: 1, b: 2" violates unique """ +
        "constraint."))
    q("DROP TABLE cns_p")
    q("DROP TABLE cns_uq")
  }

  test("FOREIGN KEY: insert/update probe the parent, delete restricts") {
    q("DROP TABLE IF EXISTS cns_fc")
    q("DROP TABLE IF EXISTS cns_fp")
    q("CREATE TABLE cns_fp (k INT PRIMARY KEY, v INT)")
    q("INSERT INTO cns_fp VALUES (1, 10), (2, 20)")
    q("CREATE TABLE cns_fc (ck INT, r INT REFERENCES cns_fp (k))")
    q("INSERT INTO cns_fc VALUES (1, 1)")
    // NULL foreign keys always pass (probed)
    q("INSERT INTO cns_fc VALUES (3, NULL)")
    val ins = intercept[IllegalArgumentException](
      q("INSERT INTO cns_fc VALUES (2, 77)"))
    assert(ins.getMessage == "Constraint Error: Violates foreign key " +
      """constraint because key "k: 77" does not exist in the """ +
      "referenced table")
    val updChild = intercept[IllegalArgumentException](
      q("UPDATE cns_fc SET r = 88 WHERE ck = 1"))
    assert(updChild.getMessage.contains("""key "k: 88" does not exist"""))
    // deleting / key-moving a referenced parent row restricts, with
    // the CHILD column named in the message (probed)
    val del = intercept[IllegalArgumentException](
      q("DELETE FROM cns_fp WHERE k = 1"))
    assert(del.getMessage == "Constraint Error: Violates foreign key " +
      """constraint because key "r: 1" is still referenced by a """ +
      "foreign key in a different table")
    intercept[IllegalArgumentException](
      q("UPDATE cns_fp SET k = 5 WHERE k = 1"))
    assert(q("DELETE FROM cns_fp WHERE k = 2")
      .collect().head.getLong(0) == 1L)
    // dropping the parent while referenced refuses (probed wording)
    val drop = intercept[IllegalArgumentException](
      q("DROP TABLE cns_fp"))
    assert(drop.getMessage == "Catalog Error: Could not drop the " +
      "table because this table is main key table of the table " +
      "\"cns_fc\"")
    q("DROP TABLE cns_fc")
    q("DROP TABLE cns_fp")
  }

  test("duckdb_constraints() lists the recorded registry (probed shape)") {
    q("DROP TABLE IF EXISTS cns_dc")
    q("CREATE TABLE cns_dc (k INT PRIMARY KEY, v INT NOT NULL, " +
      "w INT UNIQUE, x INT CHECK (x > 0))")
    val got = rows("SELECT constraint_type, constraint_text, " +
      "expression, constraint_column_names FROM duckdb_constraints() " +
      "WHERE table_name = 'cns_dc' ORDER BY constraint_index")
    assert(got == Seq(
      Seq("PRIMARY KEY", "PRIMARY KEY(k)", null, Seq("k")),
      Seq("UNIQUE", "UNIQUE(w)", null, Seq("w")),
      Seq("NOT NULL", "NOT NULL", null, Seq("v")),
      Seq("NOT NULL", "NOT NULL", null, Seq("k")),
      Seq("CHECK", "CHECK((x > 0))", "(x > 0)", Seq("x"))))
    q("DROP TABLE cns_dc")
  }

  test("psql \\d flow renders constraints (PgCatalogShim, psql-15 shapes)") {
    q("DROP TABLE IF EXISTS cns_psql_c")
    q("DROP TABLE IF EXISTS cns_psql")
    q("CREATE TABLE cns_psql (k INT PRIMARY KEY, v INT NOT NULL DEFAULT 3, " +
      "w INT UNIQUE, x INT CHECK (x > 0), g INT GENERATED ALWAYS AS (v * 2))")
    q("CREATE TABLE cns_psql_c (r INT REFERENCES cns_psql (k))")
    import graft.server.PgCatalogShim
    // step 1: name → oid (the live-psql flow, replayed verbatim)
    val oid = PgCatalogShim.intercept(spark,
      "SELECT c.oid, n.nspname, c.relname FROM pg_catalog.pg_class c " +
        "LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace " +
        "WHERE c.relname OPERATOR(pg_catalog.~) '^(cns_psql)$' COLLATE " +
        "pg_catalog.default AND pg_catalog.pg_table_is_visible(c.oid)")
      .get.collect().head.getInt(0)
    val childOid = PgCatalogShim.intercept(spark,
      "SELECT c.oid, n.nspname, c.relname FROM pg_catalog.pg_class c " +
        "WHERE c.relname OPERATOR(pg_catalog.~) '^(cns_psql_c)$'")
      .get.collect().head.getInt(0)
    // step 2: relation flags steer psql into the constraint sections
    val flags = PgCatalogShim.intercept(spark,
      s"SELECT c.relchecks, c.relkind, c.relhasindex FROM " +
        s"pg_catalog.pg_class c WHERE c.oid = '$oid'").get.collect().head
    assert(flags.getInt(0) == 1 && flags.getString(1) == "r" &&
      flags.getBoolean(2))
    // step 3: columns carry NOT NULL / defaults / generated marks
    val atts = PgCatalogShim.intercept(spark,
      s"SELECT a.attname FROM pg_catalog.pg_attribute a WHERE " +
        s"a.attrelid = '$oid'").get.collect()
      .map(r => (r.getString(0), r.getString(2), r.getBoolean(3),
        r.getString(6))).toSeq
    assert(atts.map(_._1) == Seq("k", "v", "w", "x", "g"))
    assert(atts(0)._3 && atts(1)._3 && !atts(2)._3) // NOT NULL marks
    assert(atts(1)._2 == "3") // declared default
    assert(atts(4)._4 == "s") // generated column
    // indexes: PK + UNIQUE as their implicit btree indexes
    val idx = PgCatalogShim.intercept(spark,
      s"SELECT c2.relname, i.indisprimary FROM pg_catalog.pg_index i " +
        s"WHERE c.oid = '$oid'").get.collect()
      .map(r => (r.getString(0), r.getString(7))).toSeq
    assert(idx == Seq(("cns_psql_pkey", "p"), ("cns_psql_w_key", "u")))
    // check constraints
    val cks = PgCatalogShim.intercept(spark,
      s"SELECT r.conname FROM pg_catalog.pg_constraint r WHERE " +
        s"r.conrelid = '$oid' AND r.contype = 'c'").get.collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cks == Seq(("cns_psql_x_check", "CHECK ((x > 0))")))
    // FK sections, both directions
    val out = PgCatalogShim.intercept(spark,
      s"SELECT true as sametable, conname FROM pg_catalog.pg_constraint " +
        s"r WHERE r.conrelid = '$childOid' AND r.contype = 'f'")
      .get.collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(out == Seq(("cns_psql_c_r_fkey",
      "FOREIGN KEY (r) REFERENCES cns_psql(k)")))
    val in = PgCatalogShim.intercept(spark,
      s"SELECT conname FROM pg_catalog.pg_constraint WHERE confrelid " +
        s"IN (VALUES ('$oid'::pg_catalog.regclass)) AND contype = 'f'")
      .get.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(in == Seq(("cns_psql_c_r_fkey", "cns_psql_c")))
    q("DROP TABLE cns_psql_c")
    q("DROP TABLE cns_psql")
  }

  test("bare REFERENCES parent resolves to its PRIMARY KEY") {
    q("DROP TABLE IF EXISTS cns_bc")
    q("DROP TABLE IF EXISTS cns_bp")
    q("CREATE TABLE cns_bp (k INT PRIMARY KEY)")
    q("INSERT INTO cns_bp VALUES (1)")
    q("CREATE TABLE cns_bc (z INT REFERENCES cns_bp)")
    q("INSERT INTO cns_bc VALUES (1)")
    val e = intercept[IllegalArgumentException](
      q("INSERT INTO cns_bc VALUES (42)"))
    assert(e.getMessage.contains("""key "k: 42" does not exist"""))
    q("DROP TABLE cns_bc")
    q("DROP TABLE cns_bp")
  }
}
