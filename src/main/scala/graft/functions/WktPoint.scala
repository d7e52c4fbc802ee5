package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `wkt_point(location)` — parse a WKT `POINT (lon lat)` string into a
  * `struct<latitude double, longitude double>` in one pass.
  *
  * This is the showcase custom Catalyst `Expression` (SURVEY.md §7.4,
  * reference UDF at /root/reference/pipeline.py:38,67-79): a genuinely
  * codegen'd `UnaryExpression` (no `CodegenFallback`), so it fuses into
  * whole-stage codegen like a built-in — one compiled regex + one parse
  * per row, versus two separate `regexp_extract` passes. Returns null on
  * non-matching input, reproducing the reference's silent-NA path.
  */
case class WktPoint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wkt_point requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = WktPoint.outputType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WktPoint.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // static forwarder on the companion class (`WktPoint.MODULE$` is not
    // a bytecode member — Janino rejects it and Spark silently falls
    // back to interpreted execution for the whole stage)
    val helper = WktPoint.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $helper.parse($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WktPoint =
    copy(child = newChild)

  override def prettyName: String = "wkt_point"
}

object WktPoint {

  val outputType: StructType = StructType(Seq(
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false)))

  // Same pattern family as the reference (pipeline.py:38); compiled once
  // per JVM and shared by interpreted eval and generated code.
  private val pattern =
    java.util.regex.Pattern.compile(
      """POINT\s*\(\s*([-\d.]+)\s+([-\d.]+)\s*\)""")

  /** Parse; null when the pattern does not match or numbers do not parse
    * (mirrors the reference's except-return-None,
    * /root/reference/pipeline.py:77-78).
    */
  def parse(s: UTF8String): InternalRow = {
    if (s == null) return null
    val m = pattern.matcher(s.toString)
    if (!m.find()) return null
    try {
      val lon = java.lang.Double.parseDouble(m.group(1))
      val lat = java.lang.Double.parseDouble(m.group(2))
      new GenericInternalRow(Array[Any](lat, lon))
    } catch {
      case _: NumberFormatException => null
    }
  }

  /** Column-API entry point (requires [[graft.plans.GraftExtensions]] or
    * [[graft.plans.GraftFunctions.register]] on the session).
    */
  def wkt_point(c: Column): Column =
    org.apache.spark.sql.functions.call_function("wkt_point", c)

  /** (name, info, builder) triple for SparkSessionExtensions /
    * FunctionRegistry registration.
    */
  def registration: (String, ExpressionInfo, Seq[Expression] => Expression) = (
    "wkt_point",
    new ExpressionInfo(classOf[WktPoint].getName, "wkt_point"),
    (exprs: Seq[Expression]) => WktPoint(exprs.head))
}
