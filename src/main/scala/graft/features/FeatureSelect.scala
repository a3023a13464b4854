package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filter-method feature selection scores (the reference stops at
  * VarianceThreshold — reference: utils/data.py VarianceThreshold
  * selector; mutual information is the standard next rung of the same
  * family, sklearn mutual_info_classif for discrete features).
  *
  * Scale shape: ALL features ride ONE shuffle — the frame is melted to
  * (feature, x, y) rows (map-side partial aggregation absorbs the
  * ×|features| row blow-up), grouped to joint cells, and the
  * marginal/total sums run as windows PARTITIONED BY feature over the
  * tiny per-feature cell frames (O(cardinality × classes) rows each —
  * never the data). Nothing data-proportional reaches the driver.
  */
object FeatureSelect {

  /** Mutual information I(X; Y) in nats between each discrete feature
    * column and the label: one row (feature, mi) per input, computed
    * from exact joint counts — I = Σ_cells p(x,y) · ln(p(x,y) /
    * (p(x)·p(y))). Continuous features must be discretized by the
    * caller (e.g. a fixed-width bin expression); nulls form their own
    * category ("__null") rather than silently dropping rows.
    */
  /** Shared melt → joint-cell → marginal-window backbone of
    * [[mutualInfo]] and [[chiSquare]]: (feature, x, y, n, tot, nx, ny)
    * rows, one per OBSERVED joint cell. Nulls on both sides become the
    * "__null" category (a real category, never dropped or miscounted).
    */
  private def jointCells(df: DataFrame, features: Seq[(String, Column)],
      labelCol: Column): DataFrame = {
    require(features.nonEmpty, "at least one feature required")
    val pairs = features.flatMap { case (name, x) =>
      Seq(lit(name), coalesce(x.cast("string"), lit("__null")))
    }
    val melted = df.select(coalesce(labelCol.cast("string"), lit("__null")).as("y"),
      explode(map(pairs: _*)).as(Seq("feature", "x")))
    val joint = melted.groupBy(col("feature"), col("x"), col("y"))
      .agg(count(lit(1)).as("n"))
    joint
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("feature"))))
      .withColumn("nx", sum(col("n")).over(Window.partitionBy(col("feature"), col("x"))))
      .withColumn("ny", sum(col("n")).over(Window.partitionBy(col("feature"), col("y"))))
  }

  def mutualInfo(df: DataFrame, features: Seq[(String, Column)], labelCol: Column): DataFrame =
    jointCells(df, features, labelCol)
      .withColumn("term",
        (col("n") / col("tot")) *
          log((col("n") / col("tot")) / ((col("nx") / col("tot")) * (col("ny") / col("tot")))))
      .groupBy(col("feature"))
      .agg(sum(col("term")).as("mi"))

  /** The top `k` features by mutual information with the label — the
    * SelectKBest(mutual_info_classif) shape. Deterministic: ties break
    * by feature name.
    */
  def selectKBest(df: DataFrame, features: Seq[(String, Column)], labelCol: Column,
      k: Int): Seq[String] =
    mutualInfo(df, features, labelCol)
      .orderBy(col("mi").desc, col("feature").asc)
      .limit(k).select("feature").collect().map(_.getString(0)).toSeq

  /** Pearson chi-square independence statistic between each discrete
    * feature and the label (scipy `chi2_contingency` / the SelectKBest
    * chi2 family), plus degrees of freedom and Cramér's V effect size:
    * one row (feature, chi2, dof, cramers_v) per input.
    *
    * Zero-observed cells need no special handling: Σ(O−E)²/E over ALL
    * cells equals Σ_observed O²/E − N (expand the square; ΣE over the
    * full grid is N), so the sum runs over observed joint cells only —
    * the same melted single-shuffle shape as [[mutualInfo]].
    */
  def chiSquare(df: DataFrame, features: Seq[(String, Column)], labelCol: Column): DataFrame =
    jointCells(df, features, labelCol)
      .groupBy(col("feature"))
      .agg(
        // clamp: the identity form floats to ~-1e-11 under exact
        // independence (termwise Σ(O−E)²/E is non-negative by
        // construction; this form isn't), which would NaN the sqrt
        greatest(
          first(col("tot")) *
            sum(col("n").cast("double") * col("n") / (col("nx").cast("double") * col("ny"))) -
            first(col("tot")),
          lit(0.0)).as("chi2"),
        countDistinct(col("x")).as("kx"),
        countDistinct(col("y")).as("ky"),
        first(col("tot")).as("tot"))
      .select(col("feature"), col("chi2"),
        ((col("kx") - 1) * (col("ky") - 1)).as("dof"),
        // single-category feature or label → dof 0, V defined as 0
        when(least(col("kx"), col("ky")) <= 1, lit(0.0))
          .otherwise(sqrt(col("chi2") / (col("tot").cast("double") *
            least(col("kx") - 1, col("ky") - 1)))).as("cramers_v"))
}
