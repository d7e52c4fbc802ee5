package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.functions.{FoldText, RollingFingerprint, VectorOps, WktPoint}

/** Engine extension point (SparkSessionExtensions): registers the
  * custom codegen'd expressions so they are first-class in both the
  * Column API and SQL text (`SELECT wkt_point(location) ...`).
  *
  * Wire-up:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  * or post-hoc on an existing session via [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    (Seq(WktPoint.registration, RollingFingerprint.registration,
         FoldText.registration, graft.functions.BpeEncode.registration,
         graft.functions.UnigramEncode.registration,
         graft.functions.WordPieceEncode.registration,
         graft.functions.MinhashSig.registration) ++
        graft.functions.ByteBpe.registrations ++
        VectorOps.registrations).foreach {
      case (name, info, builder) =>
        e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => FoldWktPoint)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

/** Post-hoc registration for sessions built without extensions (e.g. the
  * driver-owned Verify/Bench sessions): function registry + the fold
  * rule via experimental extraOptimizations.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    (Seq(WktPoint.registration, RollingFingerprint.registration,
         FoldText.registration, graft.functions.BpeEncode.registration,
         graft.functions.UnigramEncode.registration,
         graft.functions.WordPieceEncode.registration,
         graft.functions.MinhashSig.registration) ++
        graft.functions.ByteBpe.registrations ++
        VectorOps.registrations).foreach {
      case (name, _, builder) =>
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(FoldWktPoint))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FoldWktPoint
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}
