package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import graft.model.EvSchema

/** The reference's clean pipeline (/root/reference/pipeline.py:81-123)
  * re-expressed as composable, pure `DataFrame => DataFrame` stages.
  *
  * Every stage is declarative (built-in column expressions only), so the
  * whole pipeline collapses into ONE Catalyst plan: a single pass over
  * the scan with whole-stage-codegen'd projections — versus the
  * reference's eager per-statement pandas materialization. At 100 TB the
  * difference is structural: no intermediate frames, predicate `dropCritical`
  * pushes toward the scan, and unused columns prune out of the read.
  */
object CleanPipeline {

  type Stage = DataFrame => DataFrame

  /** P1 — impose the 11 canonical names positionally, truncating any
    * ragged extra columns (/root/reference/pipeline.py:85-96).
    */
  val imposeColumns: Stage = { df =>
    val take = df.columns.take(EvSchema.sourceColumns.length)
    val renamed = take.zip(EvSchema.sourceColumns).map {
      case (from, to) => col(from).as(to)
    }
    df.select(renamed.toIndexedSeq: _*)
  }

  /** P2 — trim + map the pandas string-NA sentinels {'nan','None',''}
    * to real nulls on the text columns (/root/reference/pipeline.py:98-102).
    */
  val cleanText: Stage = { df =>
    EvSchema.textColumns.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      val t = trim(col(c).cast(StringType))
      d.withColumn(c, when(t.isin("nan", "None", ""), lit(null)).otherwise(t))
    }
  }

  /** P3 — numeric coercion with null-on-failure, the Spark-native
    * equivalent of pd.to_numeric(errors='coerce').astype('Int64')
    * (/root/reference/pipeline.py:107-110). try_cast is used so the
    * semantics hold even under ANSI mode.
    */
  val coerceNumerics: Stage = { df =>
    EvSchema.numericColumns.foldLeft(df) { case (d, (c, t)) =>
      if (d.columns.contains(c))
        // to_numeric accepts "2020.0"; cast via double first to match.
        d.withColumn(c, col(c).try_cast("double").try_cast(t.sql))
      else d
    }
  }

  /** Generic typed-schema imposition for all-strings sources (CSV with
    * imposed names, [[graft.sources.XlsxSource]] under `typedDates`):
    * cast each frame column to its target type from `schema` with
    * null-on-failure (`try_cast`, so the contract holds under ANSI
    * mode too), pandas' `errors='coerce'` for a whole schema at once.
    * Columns absent from the schema pass through unchanged; schema
    * fields absent from the frame are ignored (caller's resolver owns
    * name drift). Projection-only — one codegen span, no shuffle.
    */
  def imposeTypes(df: DataFrame, schema: StructType): DataFrame = {
    val target = schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(df.columns.map { c =>
      target.get(c) match {
        case Some(t) => col(c).try_cast(t.sql).as(c)
        case None    => col(c)
      }
    }.toIndexedSeq: _*)
  }

  /** P4 — WKT `POINT (lon lat)` → (latitude, longitude) doubles, the
    * reference's one real UDF (/root/reference/pipeline.py:38,67-79),
    * here two codegen'd regexp_extract expressions: group 2 is latitude,
    * group 1 longitude (the reference swaps the order), with no-match →
    * empty string → null, reproducing its silent-NA path.
    */
  val wktPattern = """POINT\s*\(\s*([-\d\.]+)\s+([-\d\.]+)\s*\)"""

  val extractLatLon: Stage = { df =>
    df.withColumn("latitude",
        nullif(regexp_extract(col("location"), wktPattern, 2), lit(""))
          .try_cast("double"))
      .withColumn("longitude",
        nullif(regexp_extract(col("location"), wktPattern, 1), lit(""))
          .try_cast("double"))
  }

  /** F1 — drop rows missing critical identifiers
    * (/root/reference/pipeline.py:104-105).
    */
  val dropCritical: Stage =
    _.na.drop("any", EvSchema.criticalColumns)

  /** P6/P7 — drop the consumed raw `location`, project to canonical
    * order (/root/reference/pipeline.py:118-120).
    */
  val finalProject: Stage = { df =>
    df.drop("location")
      .select(EvSchema.finalColumns.map(col).toIndexedSeq: _*)
  }

  /** The full §3.2 clean lifecycle as one composed plan
    * (/root/reference/pipeline.py:81-123).
    */
  val clean: Stage =
    imposeColumns
      .andThen(cleanText)
      .andThen(dropCritical)
      .andThen(coerceNumerics)
      .andThen(extractLatLon)
      .andThen(finalProject)

  /** §7.5 extension: the `|`/`||`-delimited multi-value `utility` column
    * (/root/reference/musemotion-populate-table.sql:22) as a first-class
    * array — split on one-or-more pipes, trimmed, empties removed.
    */
  val utilityArray: Stage = { df =>
    df.withColumn("utilities",
      filter(
        transform(split(col("utility"), "\\|+"), x => trim(x)),
        x => x.isNotNull && x =!= ""))
  }
}
