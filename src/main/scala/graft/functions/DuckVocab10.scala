package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedExtractValue}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
import org.apache.spark.sql.types._

/** Round-10 DuckDB semantics wave, driven by the differential probe
  * batch (/tmp/probe_r10d): lambda index parameters are 1-BASED in
  * DuckDB's list functions, `concat()` stringifies and skips NULLs,
  * and `substr` follows the pg-style character-window model. The
  * reference delegates all of these verbatim
  * (src/duckdb_pgwire_extension.cpp:52), so value parity is the spec.
  * Registered AFTER DuckVocab9 — later createOrReplaceTempFunction
  * wins, so the overrides here refine the earlier spellings.
  */
/** printf over Java's Formatter, with DecimalType arguments re-typed
  * to double once resolved — Formatter's %f rejects Spark's Decimal
  * carrier (probed: DuckDB printf('%.2f', 2.5) = '2.50'). `%.Nf` args
  * are pre-rounded half-to-EVEN (C printf ties-to-even; Java's
  * Formatter rounds HALF_UP — printf('%.1f', 2.25) must be '2.2'). */
case class PrintfPoly(children: Seq[Expression]) extends RuntimeReplaceable {
  private lazy val fPrecByArg: Map[Int, Int] = children.head match {
    case Literal(s, StringType) if s != null =>
      val spec = """%(\d+\$)?[-+ 0#,]*\d*(?:\.(\d+))?([a-zA-Z%])""".r
      var auto = -1
      spec.findAllMatchIn(String.valueOf(s)).flatMap { m =>
        if (m.group(3) == "%") None
        else {
          auto += 1
          val pos = Option(m.group(1))
            .map(_.stripSuffix("$").toInt - 1).getOrElse(auto)
          if (m.group(3) == "f")
            Some(pos -> Option(m.group(2)).map(_.toInt).getOrElse(6))
          else None
        }
      }.toMap
    case _ => Map.empty
  }
  override lazy val replacement: Expression = {
    val fixed = children.head +: children.tail.zipWithIndex.map {
      case (a, i) =>
        val dbl = a.dataType match {
          case _: DecimalType => Cast(a, DoubleType)
          case _ => a
        }
        if (fPrecByArg.contains(i) &&
            (dbl.dataType == DoubleType || dbl.dataType == FloatType))
          Cast(BRound(Cast(dbl, DoubleType), Literal(fPrecByArg(i))),
            DoubleType)
        else dbl
    }
    FormatString(fixed: _*)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PrintfPoly =
    copy(children = newChildren)
}

object DuckVocab10 {

  private var uid = 0
  private def lv(): UnresolvedNamedLambdaVariable = synchronized {
    uid += 1; UnresolvedNamedLambdaVariable(Seq(s"v10x$uid"))
  }
  private def i32(e: Expression) = Cast(e, IntegerType)
  private def str(e: Expression) = Cast(e, StringType)

  /** DuckDB's optional index lambda parameter is 1-based (probed:
    * list_transform([9,8], (x,i) -> i) = [1, 2]); Spark's
    * ArrayTransform/ArrayFilter/ArrayAggregate supply 0-based
    * indices. When the lambda declares `extraArity` more parameters
    * than the value form, shift every body reference to the LAST
    * parameter by +1. Body references at registry time are unresolved
    * (UnresolvedAttribute from SQL text, UnresolvedNamedLambdaVariable
    * from the DataFrame API) — both are matched by name. Nested
    * same-named shadowing is not handled (DuckDB itself warns on it).
    */
  private def shiftIdx(lam: Expression, valueArity: Int): Expression =
    lam match {
      case LambdaFunction(body, args, hidden) if args.length == valueArity + 1 =>
        val idxName = args.last match {
          case u: UnresolvedNamedLambdaVariable =>
            u.nameParts.map(_.toLowerCase)
          case other => other.sql :: Nil
        }
        val shifted = body.transformUp {
          case a: UnresolvedAttribute
              if a.nameParts.map(_.toLowerCase) == idxName =>
            Add(a, Literal(1))
          case v: UnresolvedNamedLambdaVariable
              if v.nameParts.map(_.toLowerCase) == idxName =>
            Add(v, Literal(1))
        }
        LambdaFunction(shifted, args, hidden)
      case other => other
    }

  /** DuckDB casts a filter lambda's result to BOOLEAN (mirrors
    * DuckVocab9.boolLam, re-stated here so the index shift composes).
    */
  private def boolLam(f: Expression): Expression = f match {
    case LambdaFunction(fn, args, hidden) =>
      LambdaFunction(Cast(fn, BooleanType), args, hidden)
    case other => other
  }

  /** pg/DuckDB substr window semantics (probed grid 2026-08-14):
    * a negative start counts from the END (-1 = last char); the
    * requested window is [start, start+len) for len >= 0 and
    * [start+len, start) for len < 0, intersected with [1, n];
    * substr('abcdef', 0, 3) = 'ab', substr('abcdef', -1, -2) = 'de',
    * substr('abcdef', 2, -1) = 'a'. Spark's Substring treats 0 like 1
    * and returns '' for negative lengths. Built from codegen'd
    * If/Greatest/Substring so BINARY inputs keep working (the
    * zero-length Substring stands in for the empty literal, which
    * would otherwise force a string-typed If branch).
    */
  private def duckSubstr(s: Expression, startE: Expression,
      lenE: Option[Expression]): Expression = {
    val n = Length(s)
    val start = i32(startE)
    val start0 = If(LessThan(start, Literal(0)),
      Add(Add(n, Literal(1)), start), start)
    // Greatest SKIPS nulls, which would defeat null propagation — the
    // If keeps a null bound null, and a null Substring argument makes
    // the whole result null with the input's type (string or binary)
    def clamp(e: Expression, floor: Int): Expression =
      If(IsNull(e), e, Greatest(Seq(e, Literal(floor))))
    lenE match {
      case None =>
        // window [start0, inf): clamp the left edge; n chars always
        // covers the remainder
        Substring(s, clamp(start0, 1), n)
      case Some(l0) =>
        val len = i32(l0)
        val nonNeg = GreaterThanOrEqual(len, Literal(0))
        val lo = If(nonNeg, start0, Add(start0, len))
        val hi = If(nonNeg, Add(start0, len), start0)
        val loC = clamp(lo, 1)
        Substring(s, loC, clamp(Subtract(hi, loC), 0))
    }
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def alias(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")

    // grouping() is VARIADIC in DuckDB — grouping(a, b) is the
    // composite grouping_id bitmask, first argument most significant
    // (probed CUBE grid: (a,p)→0, (a,∅)→1, (∅,p)→2, (∅,∅)→3, which
    // is exactly Spark's grouping_id encoding). Spark's builtin takes
    // exactly one argument; the 1-arg form is byte-identical.
    alias("grouping") {
      case Seq(e) => Grouping(e)
      case es => GroupingID(es)
    }

    // ============ 1-based index lambdas (probed) ============
    for (name <- Seq("list_transform", "array_transform", "apply",
        "list_apply", "array_apply"))
      alias(name)(e => ArrayTransform(e(0), shiftIdx(e(1), 1)))
    for (name <- Seq("filter", "list_filter", "array_filter"))
      alias(name)(e => ArrayFilter(e(0), boolLam(shiftIdx(e(1), 1))))
    // seed-first fold; the 3-param lambda form (a, b, i) counts merge
    // steps from 1 (probed: list_reduce(['a','b'], (a,b,i) -> a||b||i)
    // = 'ab1'). ArrayAggregate's merge lambda is strictly binary, so
    // the index rides along zipped INTO the elements: the fold runs
    // over struct(e, i) pairs and the body's b/i references re-point
    // at the pair's fields.
    def reduce1(l: Expression, merge: Expression): Expression = {
      val fin = lv()
      val rest = Slice(l, Literal(2),
        Greatest(Seq(Literal(0),
          Subtract(Size(l, legacySizeOfNull = false), Literal(1)))))
      val seed = ElementAt(l, Literal(1), None, failOnError = false)
      merge match {
        case LambdaFunction(body, Seq(aVar, bVar, iVar), hidden) =>
          def nameOf(e: Expression): Seq[String] = e match {
            case u: UnresolvedNamedLambdaVariable => u.nameParts.map(_.toLowerCase)
            case other => Seq(other.sql.toLowerCase)
          }
          val (bName, iName) = (nameOf(bVar), nameOf(iVar))
          val x = lv(); val ix = lv(); val p = lv()
          val pairs = ArrayTransform(rest, LambdaFunction(
            CreateNamedStruct(Seq(
              Literal("e"), x, Literal("i"), Add(ix, Literal(1)))),
            Seq(x, ix)))
          def repoint(onto: String): PartialFunction[Expression, Expression] = {
            case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                if a.nameParts.map(_.toLowerCase) == (if (onto == "e") bName else iName) =>
              UnresolvedExtractValue(p, Literal(onto))
            case v: UnresolvedNamedLambdaVariable
                if v.nameParts.map(_.toLowerCase) == (if (onto == "e") bName else iName) =>
              UnresolvedExtractValue(p, Literal(onto))
          }
          val newBody = body.transformUp(repoint("e")).transformUp(repoint("i"))
          ArrayAggregate(pairs, seed,
            LambdaFunction(newBody, Seq(aVar, p), hidden),
            LambdaFunction(fin, Seq(fin)))
        case _ =>
          ArrayAggregate(rest, seed, merge, LambdaFunction(fin, Seq(fin)))
      }
    }
    alias("list_reduce")(e => reduce1(e(0), e(1)))
    alias("array_reduce")(e => reduce1(e(0), e(1)))
    alias("reduce") {
      case Seq(l, m) => reduce1(l, m)
      case Seq(l, z, m) => {
        val fin = lv()
        ArrayAggregate(l, z, m, LambdaFunction(fin, Seq(fin)))
      }
      case e => ArrayAggregate(e(0), e(1), e(2), e(3))
    }

    // ============ concat (probed) ============
    // DuckDB's concat() casts every argument to VARCHAR and SKIPS
    // NULLs (concat('a', 1, NULL, 2.5) = 'a12.5', concat(NULL, NULL)
    // = ''); `||` stays NULL-propagating and list-aware, unchanged.
    // ConcatWs('') is exactly the skip-NULLs fold. Internal operators
    // build Concat directly (never by registry name), so this
    // override cannot hijack them.
    alias("concat") {
      case Seq() => throw new IllegalArgumentException(
        "concat() needs at least one argument")
      case e => ConcatWs(Literal("") +: e.map(str))
    }

    // ============ simple case mapping (probed) ============
    // DuckDB's upper/lower are utf8proc SIMPLE per-codepoint maps —
    // upper('straße') = 'STRAẞE', lower('İ') = 'i', ligatures stay
    def caseMap(method: String, e: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        DuckStrings.getClass, StringType, method, Seq(str(e)),
        Seq(StringType), propagateNull = true, returnNullable = true)
    for (n <- Seq("upper", "ucase"))
      alias(n)(e => caseMap("upperSimple", e.head))
    for (n <- Seq("lower", "lcase"))
      alias(n)(e => caseMap("lowerSimple", e.head))

    // ============ aggregate defaults (probed) ============
    // string_agg's 1-arg separator defaults to ',' (probed:
    // string_agg over {a, b} = 'a,b'); NULL inputs are skipped
    // (CollectList's contract); all-skipped groups yield NULL, not ''
    def stringAgg(x: Expression, sep: Expression): Expression = {
      val collected = CollectList(str(x)).toAggregateExpression()
      If(EqualTo(Size(collected, legacySizeOfNull = false), Literal(0)),
        Literal(null, StringType), ArrayJoin(collected, sep, None))
    }
    for (n <- Seq("string_agg", "group_concat", "listagg"))
      alias(n) {
        case Seq(x) => stringAgg(x, Literal(","))
        case Seq(x, sep) => stringAgg(x, sep)
      }
    // list()/array_agg KEEP NULL inputs (probed: list over {1, NULL,
    // 2} = [1, NULL, 2]); Spark's CollectList drops them — the value
    // rides inside a struct, then projects back out. Over EMPTY input
    // DuckDB returns NULL where CollectList gives [] — the else-less
    // CaseWhen types the NULL from the branch (the duplicated
    // aggregate is computed once: physical planning dedupes
    // semantically-equal aggregate expressions)
    def listKeepNulls(x: Expression): Expression = {
      val v = lv()
      def arr = ArrayTransform(
        CollectList(CreateNamedStruct(Seq(Literal("v"), x)))
          .toAggregateExpression(),
        LambdaFunction(UnresolvedExtractValue(v, Literal("v")), Seq(v)))
      CaseWhen(Seq((GreaterThan(
        Size(arr, legacySizeOfNull = false), Literal(0)), arr)), None)
    }
    alias("list")(e => listKeepNulls(e.head))
    alias("array_agg")(e => listKeepNulls(e.head))
    // list_distinct DROPS NULLs (probed: [1,1,NULL,2] -> {1,2})
    def nn10(l: Expression): Expression = {
      val v = lv()
      ArrayFilter(l, LambdaFunction(IsNotNull(v), Seq(v)))
    }
    alias("list_distinct")(e => ArrayDistinct(nn10(e.head)))
    alias("array_distinct")(e => ArrayDistinct(nn10(e.head)))
    // list_contains: a missing needle is FALSE even among NULL
    // elements (probed: list_contains([1,NULL], 3) = false); a NULL
    // list or needle stays NULL
    def listContains(l: Expression, n: Expression): Expression = (l, n) match {
      // an untyped NULL operand fails ArrayContains' type check —
      // the answer is just NULL
      case (Literal(null, NullType), _) | (_, Literal(null, NullType)) =>
        Literal(null, BooleanType)
      case _ =>
        If(Or(IsNull(l), IsNull(n)), Literal(null, BooleanType),
          Coalesce(Seq(ArrayContains(l, n), Literal(false))))
    }
    alias("list_contains")(e => listContains(e(0), e(1)))
    alias("list_has")(e => listContains(e(0), e(1)))
    alias("array_contains")(e => listContains(e(0), e(1)))
    alias("array_has")(e => listContains(e(0), e(1)))

    // list_intersect DROPS NULLs (probed: [NULL,2] ∩ [2,NULL] = [2])
    alias("list_intersect")(e => ArrayIntersect(nn10(e(0)), e(1)))
    alias("array_intersect")(e => ArrayIntersect(nn10(e(0)), e(1)))
    // factorial of a NEGATIVE is 1 in DuckDB (probed: its loop from 2
    // to n is simply empty); Spark's builtin answers NULL
    alias("factorial")(e => {
      val n = Cast(e.head, IntegerType)
      If(IsNull(n), Literal(null, LongType),
        If(LessThan(n, Literal(0)), Literal(1L), Factorial(n)))
    })

    // ============ list_concat family (probed) ============
    // DuckDB treats a NULL operand as empty — list_concat([1], NULL)
    // = [1] — and yields NULL only when EVERY operand is NULL
    def listCat(e: Seq[Expression]): Expression =
      If(e.map(IsNull(_): Expression).reduce(And),
        Literal.create(null, ArrayType(NullType)),
        Concat(e.map(a => Coalesce(Seq(a, CreateArray(Nil))))))
    for (n <- Seq("list_concat", "list_cat", "array_concat", "array_cat"))
      alias(n)(e => listCat(e))

    // ============ date_part list form (probed) ============
    // date_part(['year','month'], d) returns a STRUCT keyed by the
    // requested parts; special DuckDB fields route through the same
    // registered functions the EXTRACT rewrite uses
    def onePart(p: String, d: Expression): Expression =
      SqlRewrites.extractFieldMap.get(p.toLowerCase) match {
        case Some(fn) =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
            fn, Seq(d), isDistinct = false)
        case None => DatePart.parseExtractField(p, d)
      }
    alias("date_part") {
      case Seq(CreateArray(parts, _), d) =>
        CreateNamedStruct(parts.flatMap {
          case Literal(p, StringType) if p != null =>
            Seq(Literal(String.valueOf(p)), onePart(String.valueOf(p), d))
          case other => throw new IllegalArgumentException(
            s"date_part: part names must be string literals, got $other")
        })
      case Seq(Literal(p, StringType), d) if p != null =>
        onePart(String.valueOf(p), d)
      case other => throw new IllegalArgumentException(
        "date_part: the part must be a string literal or a literal list")
    }
    alias("datepart") {
      case Seq(CreateArray(parts, _), d) =>
        CreateNamedStruct(parts.flatMap {
          case Literal(p, StringType) if p != null =>
            Seq(Literal(String.valueOf(p)), onePart(String.valueOf(p), d))
          case other => throw new IllegalArgumentException(
            s"datepart: part names must be string literals, got $other")
        })
      case Seq(Literal(p, StringType), d) if p != null =>
        onePart(String.valueOf(p), d)
      case other => throw new IllegalArgumentException(
        "datepart: the part must be a string literal or a literal list")
    }

    // ============ math domain errors (probed) ============
    // DuckDB errors OUT of these domains where Spark returns NaN/NULL
    // silently: sqrt(-x), ln/log/log10/log2 of <= 0, asin/acos outside
    // [-1, 1] — the loud-or-right posture wants the error.
    def domain(x0: Expression, bad: Expression => Expression, msg: String,
        f: Expression => Expression): Expression = {
      val x = Cast(x0, DoubleType)
      If(IsNull(x), Literal(null, DoubleType),
        If(bad(x), Cast(RaiseError(Literal(msg)), DoubleType), f(x)))
    }
    alias("sqrt")(e => domain(e.head, LessThan(_, Literal(0.0d)),
      "cannot take square root of a negative number", Sqrt))
    def logGuard(name: String, f: Expression => Expression): Unit =
      alias(name) {
        case Seq(x) => domain(x, LessThanOrEqual(_, Literal(0.0d)),
          "cannot take logarithm of a non-positive number", f)
        case e => Logarithm(e(0), e(1)) // 2-arg log(base, x)
      }
    logGuard("ln", Log)
    logGuard("log10", Log10)
    logGuard("log2", Log2)
    logGuard("log", Log10) // DuckDB's 1-arg log is log10 (probed r9)
    def rangeGuard(name: String, f: Expression => Expression): Unit =
      alias(name)(e => domain(e.head,
        x => Or(LessThan(x, Literal(-1.0d)), GreaterThan(x, Literal(1.0d))),
        s"${name.toUpperCase} is undefined outside [-1,1]", f))
    rangeGuard("asin", Asin)
    rangeGuard("acos", Acos)

    // ============ trim family arg order ============
    // DuckDB/pg: trim(string, characters); Spark's 2-arg SQL spelling
    // is trim(trimStr, srcStr) — REVERSED (probed: Spark
    // trim('xxabcxx','x') = ''). Built directly on the catalyst
    // constructors with DuckDB's order.
    alias("trim") {
      case Seq(s0) => StringTrim(s0)
      case Seq(s0, c) => StringTrim(s0, c)
    }
    alias("ltrim") {
      case Seq(s0) => StringTrimLeft(s0)
      case Seq(s0, c) => StringTrimLeft(s0, c)
    }
    alias("rtrim") {
      case Seq(s0) => StringTrimRight(s0)
      case Seq(s0, c) => StringTrimRight(s0, c)
    }

    // ============ chr / list_sort (probed) ============
    // DuckDB chr() is the full unicode CODEPOINT; Spark's builtin
    // wraps at 256 (chr(9731) = '\x03')
    alias("chr")(e => org.apache.spark.sql.catalyst.expressions.objects
      .StaticInvoke(DuckStrings.getClass, StringType, "codepointChr",
        Seq(i32(e.head)), Seq(IntegerType), propagateNull = true,
        returnNullable = true))
    // list_sort defaults: ASC NULLS LAST; direction/null-order string
    // args (probed: list_sort([3,NULL,1]) = [1,3,NULL];
    // 'DESC' = [3,1,NULL]; 'ASC','NULLS FIRST' = [NULL,1,3]).
    // Spark's pieces map exactly: ArraySort = asc nulls-last,
    // SortArray(true) = asc nulls-first, SortArray(false) = desc
    // nulls-last, Reverse(ArraySort) = desc nulls-first.
    def sortLit(e: Expression, what: String): String = e match {
      case Literal(s, StringType) if s != null =>
        String.valueOf(s).trim.toLowerCase
      case other => throw new IllegalArgumentException(
        s"list_sort: $what must be a string literal, got $other")
    }
    def listSortOf(l: Expression, desc: Boolean, nullsFirst: Boolean): Expression =
      (desc, nullsFirst) match {
        case (false, false) => new ArraySort(l)
        case (false, true) => SortArray(l, Literal(true))
        case (true, false) => SortArray(l, Literal(false))
        case (true, true) => Reverse(new ArraySort(l))
      }
    def sortDir(s: String): Boolean = s match {
      case "asc" | "ascending" => false
      case "desc" | "descending" => true
      case other => throw new IllegalArgumentException(
        s"list_sort: unknown order '$other'")
    }
    def nullOrd(s: String, desc: Boolean): Boolean = s match {
      case "nulls first" => true
      case "nulls last" => false
      case other => throw new IllegalArgumentException(
        s"list_sort: unknown null order '$other'")
    }
    alias("list_sort") {
      case Seq(l) => new ArraySort(l)
      case Seq(l, o) =>
        listSortOf(l, sortDir(sortLit(o, "order")), nullsFirst = false)
      case Seq(l, o, n) =>
        val d = sortDir(sortLit(o, "order"))
        listSortOf(l, d, nullOrd(sortLit(n, "null order"), d))
    }
    alias("array_sort") {
      case Seq(l) => new ArraySort(l)
      // Spark's comparator-lambda form stays available — OrderedAgg's
      // in-aggregate ORDER BY builds on it
      case Seq(l, f: LambdaFunction) => new ArraySort(l, f)
      case Seq(l, o) =>
        listSortOf(l, sortDir(sortLit(o, "order")), nullsFirst = false)
      case Seq(l, o, n) =>
        val d = sortDir(sortLit(o, "order"))
        listSortOf(l, d, nullOrd(sortLit(n, "null order"), d))
    }

    // ============ substr family (probed) ============
    alias("substr") {
      case Seq(s, st) => duckSubstr(s, st, None)
      case Seq(s, st, l) => duckSubstr(s, st, Some(l))
    }
    alias("substring") {
      case Seq(s, st) => duckSubstr(s, st, None)
      case Seq(s, st, l) => duckSubstr(s, st, Some(l))
    }
  }
}
