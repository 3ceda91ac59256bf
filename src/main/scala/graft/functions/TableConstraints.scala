package graft

/** Constraint and generated-column records for engine tables — the
  * full DuckDB constraint surface, ENFORCED:
  *  - PRIMARY KEY / UNIQUE: recorded keysets power the upsert forms
  *    (`ON CONFLICT` without a target, `INSERT OR REPLACE/IGNORE`)
  *    AND enforce uniqueness on every write ([[enforceKeysAppend]] /
  *    [[enforceKeysRewrite]] — one keyed probe join per keyset, the
  *    join-side equivalent of DuckDB's ART index probe).
  *  - NOT NULL columns (explicit + PK-implied) and CHECK expressions
  *    are row-local and enforce as ONE aggregate pass per written
  *    batch ([[enforce]]). A CHECK passes when its expression is TRUE
  *    or NULL (SQL standard, probed: `CHECK (a > 0)` admits NULL).
  *  - FOREIGN KEY edges probe the parent on INSERT/child-UPDATE
  *    ([[enforceFks]]) and RESTRICT deletes/truncates/key-moves/drops
  *    of referenced parents ([[enforceRestrict]]).
  *  - GENERATED columns (`g [type] [GENERATED ALWAYS] AS (expr)
  *    [VIRTUAL]`) are recorded with their expression text; the INSERT/
  *    UPDATE paths compute them and reject direct writes (probed
  *    DuckDB 1.0 messages). Stored physically here (parquet tables) —
  *    observably identical to DuckDB's VIRTUAL since direct writes
  *    are rejected; STORED is rejected at creation like DuckDB.
  *
  * Shared-registry pattern of [[Sequences]]/[[Macros]]/[[EnumTypes]]:
  * process-wide, like the catalog itself.
  */
object TableConstraints {

  final case class GenCol(name: String, expr: String,
    declaredType: Option[String], pos: Int)

  /** a FOREIGN KEY edge: `cols` in the child table reference
    * `parentCols` in `parentTable`. */
  final case class Fk(cols: Seq[String], parentTable: String,
    parentCols: Seq[String])

  private val pks =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  private val notNulls =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  /** a CHECK: the user's raw text (catalog rendering) and the
    * Spark-dialect rewrite (what enforcement evaluates). */
  final case class Chk(raw: String, spark: String)

  private val checks =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Chk]]()
  private val gens =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[GenCol]]()
  private val uniques =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[String]]]()
  private val fks =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Fk]]()

  // records key on the FULL (possibly schema-qualified) name so
  // same-named tables in different schemas never share a record;
  // lookups fall back to an UNAMBIGUOUS last-segment match so
  // `CREATE TABLE s.t … INSERT INTO t` still resolves
  private def key(table: String): String =
    table.toLowerCase.replace("\"", "")

  private def suffix(table: String): String = key(table).split('.').last

  /** the suffix fallback is only for UNQUALIFIED lookups: a qualified
    * name like `r.t` must match exactly, else it would borrow a
    * same-named table's record from another schema */
  private def lookup[T](m: java.util.concurrent.ConcurrentHashMap[String, Seq[T]],
      table: String): Option[Seq[T]] =
    Option(m.get(key(table))).orElse {
      if (key(table).contains('.')) None
      else {
        val matches = m.keySet.toArray(Array.empty[String])
          .filter(k => k.split('.').last == suffix(table))
        if (matches.length == 1) Option(m.get(matches.head)) else None
      }
    }

  def recordPk(table: String, cols: Seq[String]): Unit =
    pks.put(key(table), cols.map(_.toLowerCase.replace("\"", "")))

  def recordNotNull(table: String, cols: Seq[String]): Unit =
    if (cols.nonEmpty)
      notNulls.put(key(table), cols.map(_.toLowerCase.replace("\"", "")).distinct)
    else notNulls.remove(key(table)) // re-record to empty clears

  def recordChecks(table: String, exprs: Seq[Chk]): Unit =
    if (exprs.nonEmpty) checks.put(key(table), exprs)
    else checks.remove(key(table))

  def recordGenerated(table: String, cols: Seq[GenCol]): Unit =
    if (cols.nonEmpty) gens.put(key(table), cols)
    else gens.remove(key(table))

  def recordUniques(table: String, sets: Seq[Seq[String]]): Unit =
    if (sets.nonEmpty)
      uniques.put(key(table),
        sets.map(_.map(_.toLowerCase.replace("\"", ""))))
    else uniques.remove(key(table))

  def recordFks(table: String, list: Seq[Fk]): Unit =
    if (list.nonEmpty)
      fks.put(key(table), list.map(f => Fk(
        f.cols.map(_.toLowerCase.replace("\"", "")),
        f.parentTable,
        f.parentCols.map(_.toLowerCase.replace("\"", "")))))
    else fks.remove(key(table))

  def clear(table: String): Unit = {
    Seq[java.util.concurrent.ConcurrentHashMap[String, _]](
      pks, notNulls, checks, gens, uniques, fks).foreach { m =>
      m.remove(key(table))
      // an unqualified DROP also clears a uniquely-matching qualified
      // record (the catalog resolves the name the same way)
      if (!key(table).contains('.')) {
        val matches = m.keySet.toArray(Array.empty[String])
          .filter(k => k.split('.').last == suffix(table))
        if (matches.length == 1) m.remove(matches.head)
      }
    }
  }

  def pkOf(table: String): Option[Seq[String]] = lookup(pks, table)

  def notNullOf(table: String): Seq[String] =
    lookup(notNulls, table).getOrElse(Nil)

  /** Spark-dialect CHECK expressions (the enforcement side). */
  def checksOf(table: String): Seq[String] =
    lookup(checks, table).getOrElse(Nil).map(_.spark)

  /** the user's raw CHECK texts (the catalog-rendering side). */
  def checksRawOf(table: String): Seq[String] =
    lookup(checks, table).getOrElse(Nil).map(_.raw)

  /** every table with any recorded constraint (catalog listing). */
  def allTables: Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    Seq[java.util.concurrent.ConcurrentHashMap[String, _]](
      pks, notNulls, checks, uniques, fks).foreach { m =>
      m.keySet.toArray(Array.empty[String]).sorted.foreach(out += _)
    }
    out.toSeq.sorted
  }

  def generatedOf(table: String): Seq[GenCol] =
    lookup(gens, table).getOrElse(Nil)

  def uniquesOf(table: String): Seq[Seq[String]] =
    lookup(uniques, table).getOrElse(Nil)

  def fksOf(table: String): Seq[Fk] =
    lookup(fks, table).getOrElse(Nil)

  /** every (childTable, fk) edge pointing AT this table. Registry
    * scan — the constraint catalog is driver-resident and tiny. */
  def referencingFks(parentTable: String): Seq[(String, Fk)] = {
    val pk0 = key(parentTable)
    val pSuffix = suffix(parentTable)
    val out = Seq.newBuilder[(String, Fk)]
    fks.forEach { (child, list) =>
      list.foreach { f =>
        val fp = key(f.parentTable)
        val hit = fp == pk0 ||
          (!fp.contains('.') || !pk0.contains('.')) &&
            fp.split('.').last == pSuffix
        if (hit) out += ((child, f))
      }
    }
    out.result()
  }

  /** does an INSERT/UPDATE into this table need the guarded path? */
  def needsGuard(table: String): Boolean =
    notNullOf(table).nonEmpty || checksOf(table).nonEmpty ||
      generatedOf(table).nonEmpty || pkOf(table).nonEmpty ||
      uniquesOf(table).nonEmpty || fksOf(table).nonEmpty

  /** replace identifier `oldC` with `newC` in an expression's text —
    * word-boundary, case-insensitive, quoted `"oldC"` too, single-
    * quoted literals untouched. DuckDB rewrites constraint/generated
    * expressions on ALTER RENAME (probed: renaming a generated
    * column's dependency succeeds and the column keeps computing). */
  private def replaceIdent(exprText: String, oldC: String,
      newC: String): String = {
    val q = java.util.regex.Pattern.quote(oldC)
    val re = ("""(?i)("%s"|\b%s\b)""".format(q, q)).r
    val sb = new StringBuilder
    var i = 0
    while (i < exprText.length) {
      if (exprText.charAt(i) == '\'') {
        val e0 = exprText.indexOf('\'', i + 1)
        val e = if (e0 < 0) exprText.length - 1 else e0
        sb.append(exprText.substring(i, e + 1)); i = e + 1
      } else {
        val next = exprText.indexOf('\'', i)
        val seg = if (next < 0) exprText.substring(i)
          else exprText.substring(i, next)
        sb.append(re.replaceAllIn(seg, _ => newC))
        i = if (next < 0) exprText.length else next
      }
    }
    sb.toString
  }

  /** rename a column through the records (ALTER RENAME path) —
    * NOT NULL lists, CHECK expressions, and generated-column names +
    * expressions all follow the new name, like DuckDB's catalog. */
  def renameColumn(table: String, oldC: String, newC: String): Unit = {
    val o = oldC.toLowerCase
    notNullOf(table) match {
      case nn if nn.contains(o) =>
        recordNotNull(table, nn.map(c => if (c == o) newC.toLowerCase else c))
      case _ =>
    }
    val cks = lookup(checks, table).getOrElse(Nil)
    if (cks.nonEmpty)
      recordChecks(table, cks.map(c => Chk(
        replaceIdent(c.raw, oldC, newC),
        replaceIdent(c.spark, oldC, newC))))
    val gs = generatedOf(table)
    if (gs.nonEmpty)
      recordGenerated(table, gs.map { g =>
        g.copy(
          name = if (g.name.equalsIgnoreCase(oldC)) newC else g.name,
          expr = replaceIdent(g.expr, oldC, newC))
      })
    val us = uniquesOf(table)
    if (us.exists(_.contains(o)))
      recordUniques(table,
        us.map(_.map(c => if (c == o) newC.toLowerCase else c)))
    val myFks = fksOf(table)
    if (myFks.exists(_.cols.contains(o)))
      recordFks(table, myFks.map(f => f.copy(
        cols = f.cols.map(c => if (c == o) newC.toLowerCase else c))))
    // parent side: children referencing this table's renamed column
    // follow it (DuckDB's catalog keeps the edge live)
    referencingFks(table).groupBy(_._1).foreach { case (child, _) =>
      recordFks(child, fksOf(child).map { f =>
        val isMine = referencingFks(table).exists(e =>
          e._1 == child && e._2 == f)
        if (isMine && f.parentCols.contains(o))
          f.copy(parentCols =
            f.parentCols.map(c => if (c == o) newC.toLowerCase else c))
        else f
      })
    }
  }

  /** drop a column through the records (ALTER DROP path). Dropping a
    * generated column is fine; dropping one of its dependencies
    * refuses with DuckDB's own message. */
  def dropColumn(table: String, c: String): Unit = {
    val o = c.toLowerCase
    // ALL refusal guards run first: a refused drop must leave every
    // record intact (mutating before a throw would erase the column's
    // NOT NULL/UNIQUE/FK records while the column stays in place, so
    // later writes would go unenforced).
    val word = ("(?i)\\b" + java.util.regex.Pattern.quote(c) + "\\b").r
    if (checksOf(table).exists(e => word.findFirstIn(e).isDefined))
      throw new IllegalArgumentException(
        s"cannot drop column $c: a CHECK constraint references it")
    val gs = generatedOf(table)
    if (gs.exists(g => word.findFirstIn(g.expr).isDefined &&
        !g.name.equalsIgnoreCase(c)))
      throw new IllegalArgumentException(
        "Cannot drop column: column is a dependency of 1 or more " +
          "generated column(s)")
    if (referencingFks(table).exists(_._2.parentCols.contains(o)))
      throw new IllegalArgumentException(
        s"cannot drop column $c: a foreign key in another table " +
          "references it")
    // guards passed — now mutate the records
    val nn = notNullOf(table)
    if (nn.contains(o)) recordNotNull(table, nn.filterNot(_ == o))
    if (gs.exists(_.name.equalsIgnoreCase(c)))
      recordGenerated(table, gs.filterNot(_.name.equalsIgnoreCase(c)))
    // a UNIQUE keyset loses meaning with the column: drop the keyset
    // (mirrors Engine's PK clear on key-column drop)
    val us = uniquesOf(table)
    if (us.exists(_.contains(o)))
      recordUniques(table, us.filterNot(_.contains(o)))
    val myFks = fksOf(table)
    if (myFks.exists(_.cols.contains(o)))
      recordFks(table, myFks.filterNot(_.cols.contains(o)))
  }

  /** Enforce the table's row-local constraints on a batch about to be
    * written — ONE aggregate job over the batch (max of violation
    * flags), throwing DuckDB's Constraint Error messages on the first
    * violated constraint. Scale: map-side-combining aggregate, no
    * shuffle beyond the single flag row.
    */
  def enforce(table: String, rows: org.apache.spark.sql.DataFrame): Unit = {
    val nn = notNullOf(table)
    val cks = checksOf(table)
    if (nn.isEmpty && cks.isEmpty) return
    val present = rows.columns.map(_.toLowerCase).toSet
    val nnCols = nn.filter(present)
    val exprs =
      nnCols.map(c => s"max(CASE WHEN `$c` IS NULL THEN 1 ELSE 0 END)") ++
        cks.map(e =>
          s"max(CASE WHEN NOT coalesce(CAST(($e) AS BOOLEAN), true) " +
            "THEN 1 ELSE 0 END)")
    if (exprs.isEmpty) return
    val flags = rows.selectExpr(exprs: _*).collect()(0)
    val bare = table.split('.').last.replace("\"", "")
    nnCols.zipWithIndex.foreach { case (c, i) =>
      if (!flags.isNullAt(i) && flags.getInt(i) == 1)
        throw new IllegalArgumentException(
          s"Constraint Error: NOT NULL constraint failed: $bare.$c")
    }
    cks.zipWithIndex.foreach { case (_, i) =>
      val idx = nnCols.length + i
      if (!flags.isNullAt(idx) && flags.getInt(idx) == 1)
        throw new IllegalArgumentException(
          s"Constraint Error: CHECK constraint failed: $bare")
    }
  }

  /** refuse SET targets naming a generated column — DuckDB's own
    * message (probed on 1.0, typo and all). */
  def rejectGeneratedSets(table: String, setCols: Iterable[String]): Unit = {
    val genNames = generatedOf(table).map(_.name.toLowerCase).toSet
    setCols.find(c => genNames(c.toLowerCase)).foreach { g =>
      throw new IllegalArgumentException(
        s"""Binder Error: Cant update column "$g" because it is a """ +
          "generated column!")
    }
  }

  /** Weave the table's generated columns into a batch carrying only
    * the NON-generated columns (in table order): each generated
    * column is computed from its recorded expression over the
    * incoming values and every output is cast to the stored column
    * type — the row exactly as it will be written. Map-only (no
    * shuffle); the expressions stay inside codegen.
    */
  def withGenerated(session: org.apache.spark.sql.SparkSession,
      table: String, nonGen: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val gs = generatedOf(table)
    if (gs.isEmpty) return nonGen
    val schema = session.table(table).schema
    val genSet = gs.map(_.name.toLowerCase).toSet
    val nonGenFields = schema.fields.filterNot(f => genSet(f.name.toLowerCase))
    if (nonGen.columns.length != nonGenFields.length)
      throw new IllegalArgumentException(
        s"Binder Error: table ${table.split('.').last} has " +
          s"${nonGenFields.length} columns but ${nonGen.columns.length} " +
          "values were supplied")
    import org.apache.spark.sql.functions.{col, expr}
    val renamed = nonGen.toDF(nonGenFields.map(_.name).toIndexedSeq: _*)
    val exprOf = gs.map(g => g.name.toLowerCase -> g.expr).toMap
    renamed.select(schema.fields.toIndexedSeq.map { f =>
      exprOf.get(f.name.toLowerCase) match {
        case Some(e) => expr(e).cast(f.dataType).as(f.name)
        case None => col(s"`${f.name}`").cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** Recompute the generated columns of a FULL-schema batch (their
    * incoming values are stale — e.g. after UPDATE touched a
    * dependency) from the non-generated values. */
  def regenerate(session: org.apache.spark.sql.SparkSession,
      table: String, full: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val gs = generatedOf(table)
    if (gs.isEmpty) full
    else withGenerated(session, table, full.drop(gs.map(_.name): _*))
  }

  /** Shape an arbitrary batch for writing into the table: a batch
    * already carrying the full schema gets its generated columns
    * recomputed; a batch carrying only the non-generated columns gets
    * them woven in. No generated columns → untouched. */
  def completeForWrite(session: org.apache.spark.sql.SparkSession,
      table: String, df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val gs = generatedOf(table)
    if (gs.isEmpty) df
    else if (df.columns.length == session.table(table).schema.length)
      regenerate(session, table, df)
    else withGenerated(session, table, df)
  }

  // ---- key-uniqueness and foreign-key probes -----------------------
  // The DuckDB side answers these from an ART index probe per row;
  // here each probe is ONE keyed join/aggregate over the batch —
  // broadcast-sized in the common case (the batch is small against a
  // big table) and a plain shuffle join otherwise, so the asymptotics
  // survive a 1000-executor cluster. Messages pinned by probe
  // (round-10 session; DuckDB 1.0).

  private val indexDocTail =
    " If this is an unexpected constraint violation please double " +
      "check with the known index limitations section in our " +
      "documentation (https://duckdb.org/docs/sql/indexes)."

  private def keySetsOf(table: String): Seq[(Seq[String], Boolean)] =
    pkOf(table).map(ks => (ks, true)).toSeq ++
      uniquesOf(table).map(ks => (ks, false))

  private def render(v: Any): String = v match {
    case null => "NULL"
    case other => other.toString
  }

  /** uniqueness + FK probes for a batch about to be APPENDED (rows
    * not yet in the table): duplicates WITHIN the batch, collisions
    * with existing rows, and missing foreign parents each throw
    * DuckDB's own message. */
  def enforceKeysAppend(session: org.apache.spark.sql.SparkSession,
      table: String, batch: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val present = batch.columns.map(_.toLowerCase).toSet
    keySetsOf(table).foreach { case (ks, isPk) =>
      if (ks.forall(present)) {
        val nonNull = ks.map(c => s"`$c` IS NOT NULL").mkString(" AND ")
        val keyed = batch.where(nonNull)
        val dup = keyed.groupBy(ks.map(c => col(s"`$c`")): _*).count()
          .where("count > 1").limit(1).collect()
        if (dup.nonEmpty) throw new IllegalArgumentException(
          "Constraint Error: PRIMARY KEY or UNIQUE constraint " +
            "violated: duplicate key \"" +
            ks.indices.map(i => render(dup.head.get(i))).mkString(", ") +
            "\"")
        val hit = keyed.as("__b")
          .join(session.table(table).as("__t"),
            ks.map(c => col(s"__b.`$c`") === col(s"__t.`$c`"))
              .reduce(_ && _), "left_semi")
          .limit(1).collect()
        if (hit.nonEmpty) {
          val row = hit.head
          val pairs = ks.map(c =>
            s"$c: ${render(row.get(row.fieldIndex(c)))}").mkString(", ")
          val kind = if (isPk) "primary key" else "unique"
          throw new IllegalArgumentException(
            s"""Constraint Error: Duplicate key "$pairs" violates """ +
              s"$kind constraint.$indexDocTail")
        }
      }
    }
    enforceFks(session, table, batch)
  }

  /** uniqueness + FK probes for a full-table REWRITE (UPDATE paths):
    * only internal duplicates can exist, and DuckDB words them with
    * the index message. */
  def enforceKeysRewrite(session: org.apache.spark.sql.SparkSession,
      table: String, newTable: org.apache.spark.sql.DataFrame,
      touched: Set[String]): Unit = {
    import org.apache.spark.sql.functions.col
    keySetsOf(table).foreach { case (ks, isPk) =>
      if (ks.exists(touched)) {
        val nonNull = ks.map(c => s"`$c` IS NOT NULL").mkString(" AND ")
        val dup = newTable.where(nonNull)
          .groupBy(ks.map(c => col(s"`$c`")): _*).count()
          .where("count > 1").limit(1).collect()
        if (dup.nonEmpty) {
          val pairs = ks.zipWithIndex.map { case (c, i) =>
            s"$c: ${render(dup.head.get(i))}" }.mkString(", ")
          val kind = if (isPk) "primary key" else "unique"
          throw new IllegalArgumentException(
            s"""Constraint Error: Duplicate key "$pairs" violates """ +
              s"$kind constraint.$indexDocTail")
        }
      }
    }
    if (fksOf(table).exists(_.cols.exists(touched)))
      enforceFks(session, table, newTable)
  }

  /** every non-NULL foreign key value in the batch must exist in its
    * referenced table (one anti-join probe per edge). */
  def enforceFks(session: org.apache.spark.sql.SparkSession,
      table: String, batch: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val present = batch.columns.map(_.toLowerCase).toSet
    fksOf(table).foreach { fk =>
      if (fk.cols.forall(present)) {
        val nonNull = fk.cols.map(c => s"`$c` IS NOT NULL")
          .mkString(" AND ")
        val missing = batch.where(nonNull).as("__b")
          .join(session.table(fk.parentTable).as("__p"),
            fk.cols.zip(fk.parentCols).map { case (c, p) =>
              col(s"__b.`$c`") === col(s"__p.`$p`") }.reduce(_ && _),
            "left_anti")
          .limit(1).collect()
        if (missing.nonEmpty) {
          val row = missing.head
          // DuckDB names the PARENT columns in this message (probed)
          val pairs = fk.parentCols.zip(fk.cols).map { case (p, c) =>
            s"$p: ${render(row.get(row.fieldIndex(c)))}" }.mkString(", ")
          throw new IllegalArgumentException(
            "Constraint Error: Violates foreign key constraint " +
              s"""because key "$pairs" does not exist in the """ +
              "referenced table")
        }
      }
    }
  }

  /** rows about to DISAPPEAR from `table` (DELETE, or an UPDATE that
    * moves their key): refuse while a child row still references them
    * (one semi-join probe per referencing edge). */
  def enforceRestrict(session: org.apache.spark.sql.SparkSession,
      table: String, doomed: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    referencingFks(table).foreach { case (child, fk) =>
      val hit = doomed.as("__d")
        .join(session.table(child).as("__c"),
          fk.parentCols.zip(fk.cols).map { case (p, c) =>
            col(s"__d.`$p`") === col(s"__c.`$c`") }.reduce(_ && _),
          "left_semi")
        .limit(1).collect()
      if (hit.nonEmpty) {
        val row = hit.head
        // DuckDB names the CHILD columns in the restrict message
        val pairs = fk.cols.zip(fk.parentCols).map { case (c, p) =>
          s"$c: ${render(row.get(row.fieldIndex(p)))}" }.mkString(", ")
        throw new IllegalArgumentException(
          "Constraint Error: Violates foreign key constraint because " +
            s"""key "$pairs" is still referenced by a foreign key in """ +
            "a different table")
      }
    }
  }
}
