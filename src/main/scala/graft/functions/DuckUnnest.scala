package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB `unnest(x [, recursive := true] [, max_depth := n])` as one
  * Catalyst [[Generator]] — the full surface of the delegated engine's
  * unnest (forwarded verbatim by the reference at cpp:52), not just the
  * list-flattening form Explode covers.
  *
  * Semantics probed on DuckDB 1.0 (2026-08 grid):
  *  - one depth budget D: default 1; `recursive := true` ⇒ unbounded;
  *    `max_depth := n` ⇒ n. Each list flatten AND each struct
  *    expansion consumes one level (`unnest([{a:1}], max_depth := 2)`
  *    expands both).
  *  - `unnest(struct)` emits ONE row whose columns are the struct's
  *    fields; nested structs keep expanding while budget remains, but
  *    expansion never descends into lists (`{'l': [1,2]}` keeps `l`).
  *    A NULL struct emits one row of NULL fields.
  *  - `unnest(list)` emits one row per (recursively flattened) leaf;
  *    a NULL list — top-level or nested — contributes NO rows, while
  *    a NULL leaf element emits a NULL row. When budget remains after
  *    the list levels and the leaf is a struct, its fields become the
  *    output columns (`[[{a:1}]], recursive` → column `a`).
  *  - anything else (incl. MAP) errors: "UNNEST() can only be applied
  *    to lists, structs and NULL" — DuckDB's own binder message.
  */
case class DuckUnnest(child: Expression, depth: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "unnest"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: StructType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"UNNEST() can only be applied to lists, structs and NULL, not ${other.sql}")
  }

  /** leaf fields of a struct flattened by the remaining budget (the
    * outer expansion itself consumed one level, so nesting needs >1) */
  private def structLeaves(st: StructType, budget: Int): Seq[StructField] =
    st.fields.toSeq.flatMap { f =>
      f.dataType match {
        case nested: StructType if budget > 1 => structLeaves(nested, budget - 1)
        case _ => Seq(f)
      }
    }

  /** (#array levels flattened within budget, remaining leaf type) */
  private def arrayChain(dt: DataType, budget: Int): (Int, DataType) = dt match {
    case ArrayType(et, _) if budget > 0 =>
      val (d, l) = arrayChain(et, budget - 1); (d + 1, l)
    case other => (0, other)
  }

  override def elementSchema: StructType = child.dataType match {
    case st: StructType => StructType(structLeaves(st, depth))
    case at: ArrayType =>
      val (used, leaf) = arrayChain(at, depth)
      leaf match {
        case st: StructType if depth - used > 0 =>
          StructType(structLeaves(st, depth - used))
        case other =>
          StructType(Seq(StructField("unnest", other, nullable = true)))
      }
    case _ => // NullType: zero rows, one untyped column
      StructType(Seq(StructField("unnest", NullType, nullable = true)))
  }

  /** flattened struct VALUES in [[structLeaves]] order; a NULL row
    * yields NULLs for every leaf under it */
  private def structValues(row: InternalRow, st: StructType,
      budget: Int, out: ArrayBuffer[Any]): Unit = {
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      f.dataType match {
        case nested: StructType if budget > 1 =>
          val sub = if (row == null || row.isNullAt(i)) null
            else row.getStruct(i, nested.fields.length)
          structValues(sub, nested, budget - 1, out)
        case dt =>
          out += (if (row == null || row.isNullAt(i)) null else row.get(i, dt))
      }
      i += 1
    }
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    child.dataType match {
      case st: StructType =>
        val vals = new ArrayBuffer[Any](elementSchema.length)
        structValues(v.asInstanceOf[InternalRow], st, depth, vals)
        Seq(new GenericInternalRow(vals.toArray))
      case at: ArrayType =>
        if (v == null) return Nil
        val (used, leaf) = arrayChain(at, depth)
        val structBudget = depth - used
        val expandStruct = leaf.isInstanceOf[StructType] && structBudget > 0
        val rows = new ArrayBuffer[InternalRow]
        def emit(value: Any): Unit =
          if (expandStruct) {
            val st = leaf.asInstanceOf[StructType]
            val vals = new ArrayBuffer[Any](elementSchema.length)
            structValues(value.asInstanceOf[InternalRow], st, structBudget, vals)
            rows += new GenericInternalRow(vals.toArray)
          } else rows += new GenericInternalRow(Array[Any](value))
        def walk(value: Any, dt: DataType, lvl: Int): Unit = dt match {
          case ArrayType(et, _) if lvl < used =>
            if (value != null) { // NULL nested list → no rows (probed)
              val ad = value.asInstanceOf[ArrayData]
              var i = 0
              while (i < ad.numElements()) {
                walk(if (ad.isNullAt(i)) null else ad.get(i, et), et, lvl + 1)
                i += 1
              }
            }
          case _ => emit(value)
        }
        walk(v, at, 0)
        rows
      case _ => Nil // NullType literal
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DuckUnnest =
    copy(child = newChild)
}

/** Several `unnest` calls in ONE select list zip positionally in
  * DuckDB — row i of each, padded with NULLs to the longest — they do
  * NOT cross-product (probed: `SELECT unnest([1,2,3]), unnest([10,20])`
  * → 3 rows, last = (3, NULL)). Spark's analyzer stacks the
  * generators (nested Generate = cartesian), so [[ZipUnnestsRule]]
  * collapses adjacent DuckUnnest Generates into one of these.
  */
case class ZippedGenerator(gens: Seq[Generator])
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = gens
  override def nullable: Boolean = false
  override def prettyName: String = "unnest_zip"

  // padding makes every output field nullable regardless of source
  override def elementSchema: StructType = StructType(
    gens.flatMap(_.elementSchema.fields.map(_.copy(nullable = true))))

  /** a STRUCT unnest is column expansion, not row generation — DuckDB
    * REPEATS its one row on every zipped row (probed: `unnest([1,2]),
    * unnest({'p':9})` → (1,9),(2,9)); list unnests pad with NULL */
  private def repeats(g: Generator): Boolean = g match {
    case u: DuckUnnest => u.child.dataType.isInstanceOf[StructType]
    case _ => false
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    // copy defensively: a generator may reuse its row buffer
    val parts: Seq[IndexedSeq[InternalRow]] =
      gens.map(_.eval(input).iterator.map(_.copy()).toIndexedSeq)
    val widths = gens.map(_.elementSchema.length)
    val n = parts.map(_.size).max
    (0 until n).map { i =>
      val vals = new Array[Any](widths.sum)
      var off = 0
      parts.indices.foreach { p =>
        val w = widths(p)
        val rowOpt =
          if (repeats(gens(p)) && parts(p).nonEmpty) Some(parts(p)(0))
          else if (i < parts(p).size) Some(parts(p)(i))
          else None // leave nulls (the pad)
        rowOpt.foreach { r =>
          var j = 0
          while (j < w) {
            vals(off + j) = r.get(j, gens(p).elementSchema(j).dataType); j += 1
          }
        }
        off += w
      }
      new GenericInternalRow(vals)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZippedGenerator =
    copy(gens = newChildren.map(_.asInstanceOf[Generator]))
}

object DuckUnnest {

  /** Build from the registry argument list. SqlRewrites lowers the
    * DuckDB named-arg sugar `recursive := true` to `'recursive', true`
    * pairs before parsing, so options arrive as literal pairs here.
    */
  def fromArgs(e: Seq[Expression]): DuckUnnest = {
    require(e.nonEmpty, "unnest() requires an argument")
    var depth = 1
    e.drop(1).grouped(2).foreach {
      case Seq(Literal(n: UTF8String, StringType), v) =>
        (n.toString.toLowerCase, v) match {
          case ("recursive", Literal(b: Boolean, BooleanType)) =>
            if (b) depth = Int.MaxValue
          case ("max_depth", Literal(d, IntegerType | LongType | ShortType)) =>
            depth = d.toString.toInt
            require(depth >= 1, "unnest max_depth must be >= 1")
          case (other, value) => throw new IllegalArgumentException(
            s"unnest: unknown option $other := $value " +
              "(supported: recursive, max_depth)")
        }
      case other => throw new IllegalArgumentException(
        s"unnest: expected `name := value` options, got ${other.mkString(", ")}")
    }
    DuckUnnest(e.head, depth)
  }
}
