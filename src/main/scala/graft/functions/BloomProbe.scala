package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a BROADCAST Bloom
  * filter, for prefiltering a huge streamed side before a verifying
  * equi-join (the q37 oversized-eval fallback: prefilter is
  * probabilistic, the join behind it makes the output exact).
  *
  * The `udf((k: Long) => bloom.value.mightContainLong(k))` formulation
  * this replaces drops the entire train-side scan out of whole-stage
  * codegen and pays boxing + closure dispatch per gram row — on the
  * 10^13-gram corpus the fallback exists for, that is the hot loop. Here
  * the probe is one generated virtual call on a per-codegen-object
  * cached filter reference; the filter itself still ships via torrent
  * broadcast (the expression serializes only the broadcast handle, never
  * the ~120 MB bit array).
  *
  * Hashing contract: probes MUST use the same byte view the build side
  * used ([[org.apache.spark.sql.DataFrameStatFunctions.bloomFilter]] —
  * `mightContainLong` for long keys, `mightContainString` for string
  * keys). A mismatched probe could produce false NEGATIVES, which unlike
  * false positives the verifying join cannot repair. */
case class BloomMightContain(child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint or string key, got ${dt.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => bloom.value.mightContainLong(v.asInstanceOf[Long])
    case _ => bloom.value.mightContainString(v.toString)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfCls = classOf[BloomFilter].getName
    val bcCls = classOf[Broadcast[_]].getName
    val ref = ctx.addReferenceObj("graftBloomBc", bloom, bcCls)
    // resolve the broadcast once per codegen object, not once per row
    val bf = ctx.addMutableState(bfCls, "graftBloom",
      v => s"$v = ($bfCls)(($bcCls)$ref).value();")
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case LongType => s"${ev.value} = $bf.mightContainLong($v);"
      case _ => s"${ev.value} = $bf.mightContainString($v.toString());"
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  private val ids = new AtomicLong()

  /** Column probing `bloom` with the named key column. The expression
    * carries a runtime object (the broadcast handle), which cannot ride
    * through SQL text — so each call registers a uniquely-named temp
    * function whose builder closes over the handle and parses a call to
    * it (the same registry route as [[GraftFunctions.register]], and the
    * public seam Spark 4 leaves for expressions with captured state).
    * Registrations are a few hundred bytes each and session-scoped;
    * callers probe once per guarded fallback, not per row. */
  def probe(spark: SparkSession, keyCol: String,
      bloom: Broadcast[BloomFilter]): Column = {
    val name = s"graft_bloom_probe_${ids.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (exprs: Seq[Expression]) => BloomMightContain(exprs(0), bloom),
      "built-in")
    expr(s"$name($keyCol)")
  }
}
