package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.WktPoint

/** Optimizer rule: a WKT point that is *synthesized and immediately
  * parsed* — `wkt_point(concat('POINT (', x, ' ', y, ')'))` — collapses
  * to a direct struct, eliminating the string format + regex parse
  * round-trip entirely.
  *
  * Soundness: restricted to INTEGRAL source expressions (their
  * cast-to-string rendering always matches the parser's `[-\d.]+`
  * pattern; float/double may render scientific notation, which the
  * regex would mis-capture, so those are left alone). Null semantics
  * preserved exactly: a null coordinate makes Concat null makes the
  * parse null, so the rewrite guards with IsNull and returns a null
  * STRUCT (not a struct of nulls).
  *
  * This is the §7.3(b→rule) showcase: expression + registration +
  * optimizer rule = the full SparkSessionExtensions stack.
  */
object FoldWktPoint extends Rule[LogicalPlan] {

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def lit(e: Expression, s: String): Boolean = e match {
    case Literal(v, StringType) => v != null && v.toString == s
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case WktPoint(Concat(Seq(p1, Cast(lon, StringType, _, _), sp,
                               Cast(lat, StringType, _, _), p2)))
          if lit(p1, "POINT (") && lit(sp, " ") && lit(p2, ")") &&
             isIntegral(lon.dataType) && isIntegral(lat.dataType) =>
        If(
          Or(IsNull(lon), IsNull(lat)),
          Literal.create(null, WktPoint.outputType),
          CreateNamedStruct(Seq(
            Literal("latitude"), Cast(lat, DoubleType),
            Literal("longitude"), Cast(lon, DoubleType))))
    }
}
