package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Declarative input-schema validation in front of scoring (reference:
  * src/inference/api_server.py:96-131 _validate_records — missing /
  * unexpected feature columns rejected with precise reasons before the
  * model sees a row — and src/feature/schemas.py's typed config
  * contract). The batch/streaming analog of a per-request 422: instead
  * of failing the job on the first malformed record, every row is
  * checked by ONE codegen'd column expression and routed to either the
  * clean frame (declared columns cast to their declared types) or a
  * quarantine frame that carries the per-row violation reasons.
  *
  * Scale: validation is a narrow map (no shuffle, no UDF — the rule
  * set compiles to a single `array_compact(array(when ...))`
  * expression); ok/quarantine are two filter scans of the same input,
  * each fully pushdown/codegen-friendly.
  *
  * Structural mismatches (a declared column absent from the frame) are
  * not row-level events — they fail fast with the missing names, the
  * engine-side analog of the API's 422 "missing_features" detail.
  */
object FeatureSchema {

  /** One column's contract. `dtype` is the type the clean frame casts
    * to; a value that cannot cast (e.g. "abc" as double) is a
    * violation. Bounds are checked AFTER the cast; `domain` is checked
    * against the string form.
    */
  final case class Rule(
      name: String,
      dtype: DataType,
      nullable: Boolean = false,
      min: Option[Double] = None,
      max: Option[Double] = None,
      domain: Option[Seq[String]] = None)

  final case class Result(ok: DataFrame, quarantine: DataFrame)

  private def violationsFor(rule: Rule): Seq[Column] = {
    val raw = col(rule.name)
    // try_cast throughout: under ANSI mode (the Spark 4 default) a
    // plain cast THROWS on malformed input — the exact failure mode a
    // validation gate exists to absorb; here "doesn't cast" is a
    // violation value, never an exception
    val casted = raw.try_cast(rule.dtype.sql)
    val nullV =
      if (rule.nullable) Seq.empty
      else Seq(when(raw.isNull, lit(s"${rule.name}: null")))
    val castV = Seq(when(raw.isNotNull && casted.isNull,
      lit(s"${rule.name}: not castable to ${rule.dtype.simpleString}")))
    val minV = rule.min.map(m => when(casted.try_cast("double") < m,
      lit(s"${rule.name}: below min $m"))).toSeq
    val maxV = rule.max.map(m => when(casted.try_cast("double") > m,
      lit(s"${rule.name}: above max $m"))).toSeq
    val domV = rule.domain.map(d => when(raw.isNotNull && !raw.try_cast("string").isin(d: _*),
      lit(s"${rule.name}: not in domain"))).toSeq
    nullV ++ castV ++ minV ++ maxV ++ domV
  }

  /** The per-row violation list (empty array = clean row) as one
    * column expression — exposed so streaming sinks can embed it
    * without a second validate pass.
    */
  def violations(rules: Seq[Rule]): Column =
    array_compact(array(rules.flatMap(violationsFor): _*))

  /** Split `df` into (clean rows with declared columns cast, malformed
    * rows + `violations` array<string>). Fails fast (with the missing
    * names) if a declared column is absent — the structural 422.
    */
  def validate(df: DataFrame, rules: Seq[Rule]): Result = {
    val missing = rules.map(_.name).filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing declared columns: ${missing.mkString(", ")}")
    val flagged = df.withColumn("__violations", violations(rules))
    val ok = flagged.filter(size(col("__violations")) === 0)
      .drop("__violations")
    val casted = rules.foldLeft(ok)((d, r) =>
      d.withColumn(r.name, col(r.name).try_cast(r.dtype.sql)))
    val quarantine = flagged.filter(size(col("__violations")) > 0)
      .withColumnRenamed("__violations", "violations")
    Result(casted, quarantine)
  }
}
