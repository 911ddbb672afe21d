package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: integer dot product of two
  * `array<long>` columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * — materializes an intermediate 64-element array per row pair and walks
  * it through two higher-order-function interpreters; on an all-pairs
  * similarity join that allocation dominates the profile. This expression
  * is a single codegen'd loop over the two `ArrayData` buffers: no
  * allocation, no virtual dispatch, stays inside whole-stage codegen.
  *
  * This is the one place (SURVEY.md §7.2) where the engine drops below
  * built-in operators — a scalar `Expression` with `doGenCode`, the
  * preferred extension point before custom plans or UDFs.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes (AbstractDataType is private[sql] in Spark 4) —
  // checkInputDataTypes below rejects non-array<bigint> inputs at
  // ANALYSIS time instead: the function is session-registered and
  // reachable from arbitrary SQL, and getLong() over e.g. an int-element
  // UnsafeArrayData would read 8-byte strides across 4-byte slots — a
  // silently wrong number, not an error
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  /** Can either array carry null ELEMENTS? Static: drives both the
    * nullability contract and whether codegen pays for per-element null
    * checks (the quantized-vector call sites are containsNull=false and
    * keep the unguarded loop). Lazy val, not def: nullSafeEval consults
    * it inside the per-element loop on the interpreted path. */
  @transient private lazy val elemsNullable: Boolean =
    Seq(left, right).exists(_.dataType
      match { case ArrayType(_, cn) => cn; case _ => false })

  override def nullable: Boolean = super.nullable || elemsNullable

  /** A null element nulls the whole product — the same propagation as the
    * composable `aggregate(zip_with(a, b, _*_), 0, _+_)` formulation this
    * expression replaces. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (elemsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullGuard =
        if (elemsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |    ${ev.isNull} = true; break;
             |  }
             |  """.stripMargin
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard$s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Idempotently register the engine's native functions on the session
    * (temp-function registry — the SparkSessionExtensions route needs
    * control of session construction, which a library query pack does
    * not have). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_long",
      (exprs: Seq[Expression]) => DotProductLong(exprs(0), exprs(1)),
      "built-in")

  /** Column API for the dot product over two NAMED columns; `register`
    * must have run on the session that evaluates it. (Parsed by name —
    * keeps us off Spark 4's internal Column/ColumnNode constructors.) */
  def dotLong(a: String, b: String): Column = expr(s"graft_dot_long($a, $b)")
}
