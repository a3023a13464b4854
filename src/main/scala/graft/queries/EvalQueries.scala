package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ml.Evaluator

/** Evaluation-metric queries (SURVEY.md §2.4 [Q] rows).
  *
  * A model's scores aren't deterministic SQL, so these run the ml
  * Evaluator library over a deterministic scorer: a fixed rational
  * function of events columns (no transcendentals — both engines
  * compute bit-identical doubles). The metric machinery exercised here
  * is exactly what ml.Trainer uses on real model outputs.
  */
object EvalQueries {
  import CoreQueries.Q

  private def r6(c: Column): Column = round(c, 6) + lit(0.0)

  /** label = value >= 50; score = 0.7·min(value,200)/200 + noise(id). */
  private def scored(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d).select(
      $"event_id",
      when($"value" >= 50, 1).otherwise(0).as("label"),
      (least($"value", lit(200.0)) / lit(200.0) * lit(0.7) +
        ($"event_id" % 100).cast("double") / lit(1000.0) * lit(3.0) / lit(10.0)).as("score"))
  }

  private val scoredSql: String =
    """SELECT event_id,
      | CASE WHEN value >= 50 THEN 1 ELSE 0 END AS label,
      | least(value, 200.0) / 200.0 * 0.7 + CAST(event_id % 100 AS DOUBLE) / 1000.0 * 3.0 / 10.0 AS score
      |FROM events""".stripMargin

  def qConfusionMatrix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = scored(s, d).withColumn("pred", Evaluator.predictAt($"score", 0.5))
    Evaluator.confusionMatrix(df, "label", "pred").orderBy($"label", $"pred")
  }

  val qConfusionMatrixOracle: String =
    s"""WITH sc AS ($scoredSql)
       |SELECT label, CAST(score >= 0.5 AS INT) AS pred, count(*) AS n
       |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def qEvalMetrics(s: SparkSession, d: String): DataFrame = {
    val m = Evaluator.binaryMetrics(scored(s, d), "label", "score", "event_id", 0.5, 0.5)
    m.select(m.columns.toIndexedSeq.map(c => r6(col(c)).as(c)): _*)
  }

  val qEvalMetricsOracle: String =
    s"""WITH sc AS ($scoredSql),
       |cm AS (SELECT
       |  sum(CASE WHEN label = 1 AND score >= 0.5 THEN 1 ELSE 0 END) AS tp,
       |  sum(CASE WHEN label = 0 AND score >= 0.5 THEN 1 ELSE 0 END) AS fp,
       |  sum(CASE WHEN label = 1 AND score < 0.5 THEN 1 ELSE 0 END) AS fn,
       |  sum(CASE WHEN label = 0 AND score < 0.5 THEN 1 ELSE 0 END) AS tn
       | FROM sc),
       |rk AS (SELECT label, score, row_number() OVER (ORDER BY score ASC, event_id ASC) AS r FROM sc),
       |mr AS (SELECT label, avg(r) OVER (PARTITION BY score) AS r FROM rk),
       |auc AS (SELECT sum(CASE WHEN label = 1 THEN r ELSE 0 END) AS srp,
       |  sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS npos,
       |  sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS nneg FROM mr)
       |SELECT
       | round(CAST(tp + tn AS DOUBLE) / (tp + tn + fp + fn), 6) + 0 AS accuracy,
       | round(CAST(tp AS DOUBLE) / (tp + fp), 6) + 0 AS "precision",
       | round(CAST(tp AS DOUBLE) / (tp + fn), 6) + 0 AS recall,
       | round((2.0 * tp) / (2.0 * tp + 1.0 * fn + fp), 6) + 0 AS f1,
       | round((1.25 * tp) / (1.25 * tp + 0.25 * fn + fp), 6) + 0 AS fbeta,
       | round((srp - CAST(npos AS DOUBLE) * (npos + 1) / 2) / (npos * nneg), 6) + 0 AS roc_auc
       |FROM cm CROSS JOIN auc""".stripMargin

  def qRocAuc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.binaryMetrics(scored(s, d), "label", "score", "event_id", 0.5, 0.5)
      .select(r6($"roc_auc").as("roc_auc"))
  }

  val qRocAucOracle: String =
    s"""WITH sc AS ($scoredSql),
       |rk AS (SELECT label, score, row_number() OVER (ORDER BY score ASC, event_id ASC) AS r FROM sc),
       |mr AS (SELECT label, avg(r) OVER (PARTITION BY score) AS r FROM rk)
       |SELECT round((sum(CASE WHEN label = 1 THEN r ELSE 0 END)
       |   - CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS DOUBLE) * (sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1) / 2)
       | / (sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) * sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)), 6) + 0 AS roc_auc
       |FROM mr""".stripMargin

  def qEce(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.ece(scored(s, d), "label", "score", 10)
      .select(r6($"ece").as("ece"), $"n")
  }

  val qEceOracle: String =
    s"""WITH sc AS ($scoredSql),
       |b AS (SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
       |  count(*) AS n, avg(score) AS conf, avg(CAST(label AS DOUBLE)) AS acc
       | FROM sc GROUP BY 1)
       |SELECT round(sum(n * abs(conf - acc)) / sum(n), 6) + 0 AS ece,
       | CAST(sum(n) AS BIGINT) AS n
       |FROM b""".stripMargin

  def qLiftGains(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.liftGains(scored(s, d), "label", "score", "event_id", 10)
      .select($"decile", $"n", $"n_pos", r6($"cum_gain").as("cum_gain"), r6($"lift").as("lift"))
      .orderBy($"decile")
  }

  val qLiftGainsOracle: String =
    s"""WITH sc AS ($scoredSql),
       |t AS (SELECT label, ntile(10) OVER (ORDER BY score DESC, event_id ASC) AS decile FROM sc),
       |p AS (SELECT decile, count(*) AS n, CAST(sum(label) AS BIGINT) AS n_pos FROM t GROUP BY 1)
       |SELECT decile, n, n_pos,
       | round(CAST(sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |   / sum(n_pos) OVER (), 6) + 0 AS cum_gain,
       | round((CAST(n_pos AS DOUBLE) / n) / (CAST(sum(n_pos) OVER () AS DOUBLE) / sum(n) OVER ()), 6) + 0 AS lift
       |FROM p ORDER BY decile""".stripMargin

  private val sweepThresholds: Seq[Double] = (1 to 19).map(_ * 0.05)

  def qThresholdSweep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.thresholdSweep(scored(s, d), "label", "score", sweepThresholds, 0.5)
      .select(r6($"threshold").as("threshold"), $"tp", $"fp", $"fn", $"tn", r6($"fbeta").as("fbeta"))
      .orderBy($"threshold")
  }

  val qThresholdSweepOracle: String =
    s"""WITH sc AS ($scoredSql),
       |g AS (SELECT CAST(i AS DOUBLE) * 0.05 AS threshold FROM generate_series(1, 19) AS t(i))
       |SELECT round(threshold, 6) + 0 AS threshold,
       | CAST(sum(CASE WHEN label = 1 AND score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       | CAST(sum(CASE WHEN label = 0 AND score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       | CAST(sum(CASE WHEN label = 1 AND score < threshold THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       | CAST(sum(CASE WHEN label = 0 AND score < threshold THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       | round((1.25 * sum(CASE WHEN label = 1 AND score >= threshold THEN 1 ELSE 0 END))
       |  / (1.25 * sum(CASE WHEN label = 1 AND score >= threshold THEN 1 ELSE 0 END)
       |     + 0.25 * sum(CASE WHEN label = 1 AND score < threshold THEN 1 ELSE 0 END)
       |     + sum(CASE WHEN label = 0 AND score >= threshold THEN 1 ELSE 0 END)), 6) + 0 AS fbeta
       |FROM sc CROSS JOIN g GROUP BY threshold ORDER BY threshold""".stripMargin

  def qRocCurve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.rocPrCurve(scored(s, d), "label", "score", sweepThresholds)
      .select(r6($"threshold").as("threshold"), r6($"fpr").as("fpr"), r6($"tpr").as("tpr"),
        r6($"precision").as("prec"), r6($"recall").as("recall"))
      .orderBy($"threshold")
  }

  val qRocCurveOracle: String =
    s"""WITH sc AS ($scoredSql),
       |g AS (SELECT CAST(i AS DOUBLE) * 0.05 AS threshold FROM generate_series(1, 19) AS t(i)),
       |cm AS (SELECT threshold,
       |  sum(CASE WHEN label = 1 AND score >= threshold THEN 1 ELSE 0 END) AS tp,
       |  sum(CASE WHEN label = 0 AND score >= threshold THEN 1 ELSE 0 END) AS fp,
       |  sum(CASE WHEN label = 1 AND score < threshold THEN 1 ELSE 0 END) AS fn,
       |  sum(CASE WHEN label = 0 AND score < threshold THEN 1 ELSE 0 END) AS tn
       | FROM sc CROSS JOIN g GROUP BY threshold)
       |SELECT round(threshold, 6) + 0 AS threshold,
       | round(CASE WHEN fp + tn = 0 THEN NULL ELSE CAST(fp AS DOUBLE) / (fp + tn) END, 6) + 0 AS fpr,
       | round(CASE WHEN tp + fn = 0 THEN NULL ELSE CAST(tp AS DOUBLE) / (tp + fn) END, 6) + 0 AS tpr,
       | round(CASE WHEN tp + fp = 0 THEN NULL ELSE CAST(tp AS DOUBLE) / (tp + fp) END, 6) + 0 AS prec,
       | round(CASE WHEN tp + fn = 0 THEN NULL ELSE CAST(tp AS DOUBLE) / (tp + fn) END, 6) + 0 AS recall
       |FROM cm ORDER BY threshold""".stripMargin

  def qCalibrationCurve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.calibrationCurve(scored(s, d), "label", "score", 10)
      .select($"bin", $"n", r6($"mean_predicted").as("mean_predicted"),
        r6($"fraction_positive").as("fraction_positive"))
      .orderBy($"bin")
  }

  val qCalibrationCurveOracle: String =
    s"""WITH sc AS ($scoredSql)
       |SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin, count(*) AS n,
       | round(avg(score), 6) + 0 AS mean_predicted,
       | round(avg(CAST(label AS DOUBLE)), 6) + 0 AS fraction_positive
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  def qBrier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.brierScore(scored(s, d), "label", "score")
      .select(r6($"brier").as("brier"), $"n")
  }

  val qBrierOracle: String =
    s"""WITH sc AS ($scoredSql)
       |SELECT round(avg((score - CAST(label AS DOUBLE)) * (score - CAST(label AS DOUBLE))), 6) + 0 AS brier,
       | count(*) AS n
       |FROM sc""".stripMargin

  def qKsStat(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.ksStatistic(scored(s, d), "label", "score")
      .select(r6($"ks").as("ks"), $"n_thresholds")
  }

  val qKsStatOracle: String =
    s"""WITH sc AS ($scoredSql),
       |g AS (SELECT score,
       |  sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS np,
       |  sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS nn
       | FROM sc GROUP BY 1),
       |c AS (SELECT
       |  sum(np) OVER (ORDER BY score) AS cp, sum(nn) OVER (ORDER BY score) AS cn,
       |  sum(np) OVER () AS tp, sum(nn) OVER () AS tn
       | FROM g)
       |SELECT round(max(abs(CAST(cp AS DOUBLE) / tp - CAST(cn AS DOUBLE) / tn)), 6) + 0 AS ks,
       | count(*) AS n_thresholds
       |FROM c""".stripMargin

  def qPrAuc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.averagePrecision(scored(s, d), "label", "score")
      .select(r6($"pr_auc").as("pr_auc"))
  }

  val qPrAucOracle: String =
    s"""WITH sc AS ($scoredSql),
       |g AS (SELECT score,
       |  sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS np, count(*) AS nr
       | FROM sc GROUP BY 1),
       |c AS (SELECT np,
       |  sum(np) OVER (ORDER BY score DESC) AS cp,
       |  sum(nr) OVER (ORDER BY score DESC) AS cn,
       |  sum(np) OVER () AS tpos
       | FROM g)
       |SELECT round(sum(CAST(np AS DOUBLE) * cp / cn) / max(tpos), 6) + 0 AS pr_auc
       |FROM c""".stripMargin

  /** Multiclass metrics over a deterministic 10-class scorer. */
  def qMulticlassMetrics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = Tables.embeddings(s, d).select(
      $"label",
      (($"label" + when($"vec_id" % 4 === 0, 1).otherwise(0)) % 10).as("pred"))
    Evaluator.multiclassMetrics(df, "label", "pred")
      .select($"clazz", $"n_true", $"n_pred", $"tp",
        r6($"prec").as("prec"), r6($"rec").as("rec"), r6($"f1").as("f1"),
        r6($"accuracy").as("accuracy"))
      .orderBy($"clazz")
  }

  val qMulticlassMetricsOracle: String =
    """WITH sc AS (
      | SELECT label, (label + CASE WHEN vec_id % 4 = 0 THEN 1 ELSE 0 END) % 10 AS pred
      | FROM embeddings),
      |bt AS (SELECT label AS clazz, count(*) AS n_true,
      |  CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS BIGINT) AS tp
      | FROM sc GROUP BY 1),
      |bp AS (SELECT pred AS clazz, count(*) AS n_pred FROM sc GROUP BY 1),
      |j AS (SELECT coalesce(bt.clazz, bp.clazz) AS clazz,
      |  coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred, coalesce(tp, 0) AS tp
      | FROM bt FULL OUTER JOIN bp ON bt.clazz = bp.clazz),
      |m AS (SELECT *,
      |  CASE WHEN n_pred = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / n_pred END AS prec0,
      |  CASE WHEN n_true = 0 THEN 0.0 ELSE CAST(tp AS DOUBLE) / n_true END AS rec0
      | FROM j)
      |SELECT clazz, n_true, n_pred, tp,
      | round(prec0, 6) + 0 AS prec,
      | round(rec0, 6) + 0 AS rec,
      | round(CASE WHEN prec0 + rec0 = 0 THEN 0.0 ELSE 2.0 * prec0 * rec0 / (prec0 + rec0) END, 6) + 0 AS f1,
      | round(CAST(sum(tp) OVER () AS DOUBLE) / sum(n_true) OVER (), 6) + 0 AS accuracy
      |FROM m ORDER BY clazz""".stripMargin

  /** Per-slice (event_type) ROC-AUC — segment/fairness evaluation via
    * Evaluator.groupedAuc's per-(group, distinct-score) shape.
    */
  def qAucByType(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = Tables.events(s, d).select(
      $"event_type",
      when($"value" >= 50, 1).otherwise(0).as("label"),
      (least($"value", lit(200.0)) / lit(200.0) * lit(0.7) +
        ($"event_id" % 100).cast("double") / lit(1000.0) * lit(3.0) / lit(10.0)).as("score"))
    Evaluator.groupedAuc(df, "event_type", "label", "score")
      .select($"event_type", $"n", r6($"roc_auc").as("roc_auc"))
      .orderBy($"event_type")
  }

  val qAucByTypeOracle: String =
    """WITH sc AS (SELECT event_type, event_id,
      |  CASE WHEN value >= 50 THEN 1 ELSE 0 END AS label,
      |  least(value, 200.0) / 200.0 * 0.7 + CAST(event_id % 100 AS DOUBLE) / 1000.0 * 3.0 / 10.0 AS score
      | FROM events),
      |rk AS (SELECT event_type, label, score,
      |  row_number() OVER (PARTITION BY event_type ORDER BY score ASC, event_id ASC) AS r FROM sc),
      |mr AS (SELECT event_type, label, avg(r) OVER (PARTITION BY event_type, score) AS r FROM rk),
      |a AS (SELECT event_type,
      |  sum(CASE WHEN label = 1 THEN r ELSE 0 END) AS srp,
      |  sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS npos,
      |  sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS nneg,
      |  count(*) AS n
      | FROM mr GROUP BY event_type)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      | round((srp - CAST(npos AS DOUBLE) * (npos + 1) / 2) / (npos * nneg), 6) + 0 AS roc_auc
      |FROM a ORDER BY event_type""".stripMargin

  /** Population stability index of the score distribution between the
    * even- and odd-id halves of events (serving-drift monitor shape).
    */
  def qPsi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sc = Tables.events(s, d).select(
      $"event_id",
      (least($"value", lit(200.0)) / lit(200.0) * lit(0.7) +
        ($"event_id" % 100).cast("double") / lit(1000.0) * lit(3.0) / lit(10.0)).as("score"))
    Evaluator.psi(sc.filter($"event_id" % 2 === 0), sc.filter($"event_id" % 2 === 1), "score", 10)
      .select(r6($"psi").as("psi"), $"n_bins")
  }

  val qPsiOracle: String =
    """WITH sc AS (SELECT event_id,
      |  least(value, 200.0) / 200.0 * 0.7 + CAST(event_id % 100 AS DOUBLE) / 1000.0 * 3.0 / 10.0 AS score
      | FROM events),
      |g AS (SELECT unnest(range(0, 10)) AS bin),
      |b AS (SELECT CAST(least(floor(score*10), 9) AS INT) AS bin, count(*) AS nb FROM sc WHERE event_id % 2 = 0 GROUP BY 1),
      |c AS (SELECT CAST(least(floor(score*10), 9) AS INT) AS bin, count(*) AS nc FROM sc WHERE event_id % 2 = 1 GROUP BY 1),
      |j AS (SELECT g.bin, coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
      |      FROM g LEFT JOIN b ON g.bin = b.bin LEFT JOIN c ON g.bin = c.bin),
      |t AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM j),
      |p AS (SELECT bin, greatest(nb / tb, 0.0001) AS p, greatest(nc / tc, 0.0001) AS q
      |      FROM j CROSS JOIN t)
      |SELECT round(sum((p - q) * ln(p / q)), 6) + 0 AS psi, count(*) AS n_bins FROM p""".stripMargin

  /** Matthews correlation coefficient at threshold 0.5 — the balanced
    * single-number summary of the confusion matrix (robust to class
    * imbalance); pure integer arithmetic + sqrt, oracle-exact.
    */
  def qMcc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = scored(s, d)
    df.agg(
        sum(when($"label" === 1 && $"score" >= 0.5, 1L).otherwise(0L)).as("tp"),
        sum(when($"label" === 0 && $"score" >= 0.5, 1L).otherwise(0L)).as("fp"),
        sum(when($"label" === 1 && $"score" < 0.5, 1L).otherwise(0L)).as("fn"),
        sum(when($"label" === 0 && $"score" < 0.5, 1L).otherwise(0L)).as("tn"))
      .select($"tp", $"fp", $"fn", $"tn",
        // numerator in DOUBLE: tp*tn in Long wraps past 2^63 around
        // ~3e9 rows per cell (the 100 TB regime this repo targets)
        r6(($"tp".cast("double") * $"tn" - $"fp".cast("double") * $"fn") /
          sqrt(($"tp" + $"fp").cast("double") * ($"tp" + $"fn") * ($"tn" + $"fp") * ($"tn" + $"fn")))
          .as("mcc"))
  }

  val qMccOracle: String =
    s"""WITH sc AS ($scoredSql),
       |cm AS (SELECT
       |  CAST(sum(CASE WHEN label = 1 AND score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(sum(CASE WHEN label = 0 AND score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(sum(CASE WHEN label = 1 AND score < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(sum(CASE WHEN label = 0 AND score < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       | FROM sc)
       |SELECT tp, fp, fn, tn,
       | round(CAST(tp*tn - fp*fn AS DOUBLE)
       |   / sqrt(CAST(tp+fp AS DOUBLE) * (tp+fn) * (tn+fp) * (tn+fn)), 6) + 0 AS mcc
       |FROM cm""".stripMargin

  /** Jensen-Shannon divergence of the binned score distributions of
    * the even/odd event cohorts — the symmetric, bounded cousin of
    * [[qPsi]]'s drift measure. Same fixed-bin shape.
    */
  def qJsDiv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sc = Tables.events(s, d).select(
      $"event_id",
      (least($"value", lit(200.0)) / lit(200.0) * lit(0.7) +
        ($"event_id" % 100).cast("double") / lit(1000.0) * lit(3.0) / lit(10.0)).as("score"))
    Evaluator.jsDivergence(
        sc.filter($"event_id" % 2 === 0), sc.filter($"event_id" % 2 === 1), "score", 10)
      .select(r6($"js_div").as("js_div"), $"n_bins")
  }

  val qJsDivOracle: String =
    """WITH sc AS (SELECT event_id,
      |  least(value, 200.0) / 200.0 * 0.7 + CAST(event_id % 100 AS DOUBLE) / 1000.0 * 3.0 / 10.0 AS score
      | FROM events),
      |g AS (SELECT unnest(range(0, 10)) AS bin),
      |b AS (SELECT CAST(least(floor(score*10), 9) AS INT) AS bin, count(*) AS nb FROM sc WHERE event_id % 2 = 0 GROUP BY 1),
      |c AS (SELECT CAST(least(floor(score*10), 9) AS INT) AS bin, count(*) AS nc FROM sc WHERE event_id % 2 = 1 GROUP BY 1),
      |j AS (SELECT g.bin, coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
      |      FROM g LEFT JOIN b ON g.bin = b.bin LEFT JOIN c ON g.bin = c.bin),
      |t AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM j),
      |p AS (SELECT nb / tb AS p, nc / tc AS q, (nb / tb + nc / tc) / 2 AS m FROM j CROSS JOIN t)
      |SELECT round((sum(CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0 END)
      |      + sum(CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0 END)) / 2, 6) + 0 AS js_div,
      | count(*) AS n_bins
      |FROM p""".stripMargin

  /** Regression metrics of an exact OLS simple-regression fit of
    * l_extendedprice on l_quantity: fit from raw moment sums (one
    * aggregation; the SAME closed form both engines — not each
    * engine's regr_* internals), then MAE/RMSE/R² of the fitted
    * predictor via Evaluator.regressionMetrics. Fit is a 1-row
    * broadcast — the fit-once-broadcast pattern of the feature
    * pipeline.
    */
  def qRegressionMetrics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d).select(
      $"l_quantity".cast("double").as("x"), $"l_extendedprice".cast("double").as("y"))
    val fit = li.agg(count(lit(1)).cast("double").as("fn"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select(
        (($"fn" * $"sxy" - $"sx" * $"sy") / ($"fn" * $"sxx" - $"sx" * $"sx")).as("slope"),
        $"sy", $"sx", $"fn")
      .select($"slope", (($"sy" - $"slope" * $"sx") / $"fn").as("intercept"))
      // 1-row fit consumed twice (predictor + output columns):
      // materialize it once instead of re-scanning lineitem per consumer
      .localCheckpoint()
    val pred = li.crossJoin(broadcast(fit))
      .withColumn("p", $"intercept" + $"slope" * $"x")
    Evaluator.regressionMetrics(pred, "y", "p")
      .crossJoin(broadcast(fit))
      .select($"n", (round($"slope", 4) + lit(0.0)).as("slope"),
        (round($"intercept", 4) + lit(0.0)).as("intercept"),
        (round($"mae", 4) + lit(0.0)).as("mae"),
        (round($"rmse", 4) + lit(0.0)).as("rmse"),
        r6($"r2").as("r2"))
  }

  val qRegressionMetricsOracle: String =
    """WITH li AS (SELECT CAST(l_quantity AS DOUBLE) AS x, CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem),
      |mo AS (SELECT CAST(count(*) AS DOUBLE) AS fn, sum(x) AS sx, sum(y) AS sy,
      |  sum(x*y) AS sxy, sum(x*x) AS sxx FROM li),
      |f AS (SELECT (fn*sxy - sx*sy) / (fn*sxx - sx*sx) AS slope, sy, sx, fn FROM mo),
      |f2 AS (SELECT slope, (sy - slope*sx) / fn AS intercept FROM f),
      |p AS (SELECT x, y, intercept + slope*x AS p FROM li CROSS JOIN f2),
      |m AS (SELECT count(*) AS n, sum(abs(y - p)) AS sae, sum((y - p)*(y - p)) AS sse,
      |  sum(y*y) AS syy, sum(y) AS sy FROM p)
      |SELECT n, round(slope, 4) + 0 AS slope, round(intercept, 4) + 0 AS intercept,
      | round(sae / n, 4) + 0 AS mae,
      | round(sqrt(sse / n), 4) + 0 AS rmse,
      | round(1.0 - sse / (syy - sy*sy/n), 6) + 0 AS r2
      |FROM m CROSS JOIN f2""".stripMargin

  /** NDCG@10 per event_type: score = value, graded relevance =
    * user_id % 4, exponential gain — ranking-quality seat of the
    * evaluator family (sklearn ndcg_score semantics at k).
    */
  def qNdcg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = Tables.events(s, d).select(
      $"event_type", $"event_id", $"value".as("score"),
      ($"user_id" % 4).cast("double").as("rel"))
    Evaluator.ndcgAt(df, "event_type", "score", "rel", "event_id", 10)
      .select($"event_type", r6($"dcg").as("dcg"), r6($"idcg").as("idcg"),
        r6($"ndcg").as("ndcg"))
      .orderBy($"event_type")
  }

  val qNdcgOracle: String =
    """WITH sc AS (SELECT event_type, event_id, value AS score,
      |  CAST(user_id % 4 AS DOUBLE) AS rel FROM events),
      |r AS (SELECT event_type, rel,
      |  row_number() OVER (PARTITION BY event_type ORDER BY score DESC, event_id ASC) AS pos,
      |  row_number() OVER (PARTITION BY event_type ORDER BY rel DESC, event_id ASC) AS ideal_pos
      | FROM sc),
      |a AS (SELECT event_type,
      |  sum(CASE WHEN pos <= 10 THEN (power(2.0, rel) - 1) / log2(pos + 1) ELSE 0 END) AS dcg,
      |  sum(CASE WHEN ideal_pos <= 10 THEN (power(2.0, rel) - 1) / log2(ideal_pos + 1) ELSE 0 END) AS idcg
      | FROM r GROUP BY 1)
      |SELECT event_type, round(dcg, 6) + 0 AS dcg, round(idcg, 6) + 0 AS idcg,
      | round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6) + 0 AS ndcg
      |FROM a ORDER BY event_type""".stripMargin

  /** Cohen's kappa between the true label and the thresholded scorer —
    * chance-corrected agreement (sklearn cohen_kappa_score).
    */
  def qCohenKappa(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = scored(s, d)
      .select($"label", Evaluator.predictAt($"score", 0.5).as("pred"))
    Evaluator.cohenKappa(df, "label", "pred")
      .select($"n", r6($"po").as("po"), r6($"pe").as("pe"), r6($"kappa").as("kappa"))
  }

  val qCohenKappaOracle: String =
    s"""WITH sc AS ($scoredSql),
       |x AS (SELECT label AS a, CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS b FROM sc),
       |c AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |  avg(CASE WHEN a = b THEN 1.0 ELSE 0.0 END) AS po FROM x),
       |ma AS (SELECT a AS k, count(*) AS na FROM x GROUP BY 1),
       |mb AS (SELECT b AS k, count(*) AS nb FROM x GROUP BY 1),
       |e AS (SELECT sum(CAST(na AS DOUBLE) * nb) AS sab FROM ma JOIN mb ON ma.k = mb.k)
       |SELECT CAST(n AS BIGINT) AS n, round(po, 6) + 0 AS po,
       | round(sab / (n * n), 6) + 0 AS pe,
       | round(CASE WHEN sab / (n * n) < 1.0
       |   THEN (po - sab / (n * n)) / (1.0 - sab / (n * n)) ELSE 0.0 END, 6) + 0 AS kappa
       |FROM c CROSS JOIN e""".stripMargin

  /** Per-group fairness audit of the deterministic scorer with
    * user_id % 3 as the (synthetic) protected attribute: selection
    * rate, TPR, FPR per group + demographic-parity and
    * equal-opportunity gaps (Evaluator.fairnessMetrics).
    */
  def qFairness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val df = Tables.events(s, d).select(
      ($"user_id" % 3).cast("int").as("grp"),
      when($"value" >= 50, 1).otherwise(0).as("label"),
      (least($"value", lit(200.0)) / lit(200.0) * lit(0.7) +
        ($"event_id" % 100).cast("double") / lit(1000.0) * lit(3.0) / lit(10.0)).as("score"))
    Evaluator.fairnessMetrics(df, "grp", "label", "score", 0.5)
      .select($"grp", $"n", r6($"sel_rate").as("sel_rate"), r6($"tpr").as("tpr"),
        r6($"fpr").as("fpr"), r6($"dp_gap").as("dp_gap"), r6($"tpr_gap").as("tpr_gap"))
      .orderBy($"grp")
  }

  val qFairnessOracle: String =
    """WITH sc AS (SELECT CAST(user_id % 3 AS INT) AS grp,
      |  CASE WHEN value >= 50 THEN 1 ELSE 0 END AS label,
      |  least(value, 200.0) / 200.0 * 0.7 + CAST(event_id % 100 AS DOUBLE) / 1000.0 * 3.0 / 10.0 AS score
      | FROM events),
      |g AS (SELECT grp, count(*) AS n,
      |  avg(CASE WHEN score >= 0.5 THEN 1.0 ELSE 0.0 END) AS sel_rate,
      |  sum(CASE WHEN label = 1 AND score >= 0.5 THEN 1 ELSE 0 END)
      |    / CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS tpr,
      |  sum(CASE WHEN label = 0 AND score >= 0.5 THEN 1 ELSE 0 END)
      |    / CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS fpr
      | FROM sc GROUP BY 1)
      |SELECT grp, n, round(sel_rate, 6) + 0 AS sel_rate,
      | round(tpr, 6) + 0 AS tpr, round(fpr, 6) + 0 AS fpr,
      | round(max(sel_rate) OVER () - min(sel_rate) OVER (), 6) + 0 AS dp_gap,
      | round(max(tpr) OVER () - min(tpr) OVER (), 6) + 0 AS tpr_gap
      |FROM g ORDER BY grp""".stripMargin

  /** Binary log loss (cross-entropy) of the deterministic scorer with
    * sklearn's [eps, 1−eps] probability clipping.
    */
  def qLogLoss(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Evaluator.logLoss(scored(s, d), "label", "score")
      .select(r6($"log_loss").as("log_loss"), $"n")
  }

  val qLogLossOracle: String =
    s"""WITH sc AS ($scoredSql),
       |p AS (SELECT label, least(greatest(score, 1e-7), 1.0 - 1e-7) AS pc FROM sc)
       |SELECT round(-avg(label * ln(pc) + (1.0 - label) * ln(1.0 - pc)), 6) + 0 AS log_loss,
       | count(*) AS n
       |FROM p""".stripMargin

  /** Multi-feature drift audit in one melted pass
    * ([[Evaluator.psiByFeature]]): PSI for four lineitem features at
    * once between the even/odd-orderkey cohorts, exact quantile-edge
    * bins fit on the reference cohort from a per-(feature, value)
    * HISTOGRAM — raw rows are touched by exactly one hash aggregation
    * whose shuffle is the distinct-value cells (map-side combine), and
    * edges/bins/PSI all run on cells (r11; the melted range-sort shape
    * it replaced measured 51 s at the sf10 decade, this one 8 s). The
    * cohorts here are a synthetic A/B split, so near-zero PSI is the
    * expected (and verified) reading; the op's job is the shape: one
    * rows-scan job + cell-sized work for ANY number of features, not a
    * per-feature job loop.
    */
  def qDriftAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    Evaluator.psiByFeature(
        li.filter($"l_orderkey" % 2 === 0), li.filter($"l_orderkey" % 2 === 1), feats)
      .select($"feature", r6($"psi").as("psi"), $"n_ref", $"n_cur")
      .orderBy($"feature")
  }

  val qDriftAuditOracle: String =
    """WITH m AS (
      | SELECT 'l_quantity' AS feature, CAST(l_quantity AS DOUBLE) AS v, l_orderkey % 2 = 0 AS ref FROM lineitem
      | UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE), l_orderkey % 2 = 0 FROM lineitem
      | UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE), l_orderkey % 2 = 0 FROM lineitem
      | UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE), l_orderkey % 2 = 0 FROM lineitem),
      |e AS (SELECT feature,
      |  round(quantile_cont(v, 0.25), 4) + 0 AS e1,
      |  round(quantile_cont(v, 0.5), 4) + 0 AS e2,
      |  round(quantile_cont(v, 0.75), 4) + 0 AS e3
      | FROM m WHERE ref GROUP BY feature),
      |b AS (SELECT m.feature,
      |  CASE WHEN v <= e1 THEN 0 WHEN v <= e2 THEN 1 WHEN v <= e3 THEN 2 ELSE 3 END AS bin,
      |  CAST(ref AS INT) AS r FROM m JOIN e ON m.feature = e.feature),
      |c AS (SELECT feature, bin, sum(r) AS nb, sum(1 - r) AS nc FROM b GROUP BY feature, bin),
      |t AS (SELECT feature, sum(nb) AS tb, sum(nc) AS tc FROM c GROUP BY feature),
      |p AS (SELECT c.feature, greatest(nb * 1.0 / tb, 0.0001) AS p, greatest(nc * 1.0 / tc, 0.0001) AS q
      | FROM c JOIN t ON c.feature = t.feature)
      |SELECT p.feature, round(sum((p - q) * ln(p / q)), 6) + 0 AS psi,
      | CAST(max(tb) AS BIGINT) AS n_ref, CAST(max(tc) AS BIGINT) AS n_cur
      |FROM p JOIN t ON p.feature = t.feature
      |GROUP BY p.feature ORDER BY p.feature""".stripMargin

  val all: Map[String, Q] = Map(
    "q_drift_audit" -> qDriftAudit,
    "q_regression_metrics" -> qRegressionMetrics,
    "q_ndcg" -> qNdcg,
    "q_cohen_kappa" -> qCohenKappa,
    "q_logloss" -> qLogLoss,
    "q_fairness" -> qFairness,
    "q_mcc" -> qMcc,
    "q_js_div" -> qJsDiv,
    "q_auc_by_type" -> qAucByType,
    "q_psi" -> qPsi,
    "q_brier" -> qBrier,
    "q_ks_stat" -> qKsStat,
    "q_pr_auc" -> qPrAuc,
    "q_multiclass_metrics" -> qMulticlassMetrics,
    "q_roc_curve" -> qRocCurve,
    "q_calibration_curve" -> qCalibrationCurve,
    "q_confusion_matrix" -> qConfusionMatrix,
    "q_eval_metrics" -> qEvalMetrics,
    "q_roc_auc" -> qRocAuc,
    "q_ece" -> qEce,
    "q_lift_gains" -> qLiftGains,
    "q_threshold_sweep" -> qThresholdSweep
  )

  val oracles: Map[String, String] = Map(
    "q_drift_audit" -> qDriftAuditOracle,
    "q_regression_metrics" -> qRegressionMetricsOracle,
    "q_ndcg" -> qNdcgOracle,
    "q_cohen_kappa" -> qCohenKappaOracle,
    "q_logloss" -> qLogLossOracle,
    "q_fairness" -> qFairnessOracle,
    "q_mcc" -> qMccOracle,
    "q_js_div" -> qJsDivOracle,
    "q_auc_by_type" -> qAucByTypeOracle,
    "q_psi" -> qPsiOracle,
    "q_brier" -> qBrierOracle,
    "q_ks_stat" -> qKsStatOracle,
    "q_pr_auc" -> qPrAucOracle,
    "q_multiclass_metrics" -> qMulticlassMetricsOracle,
    "q_roc_curve" -> qRocCurveOracle,
    "q_calibration_curve" -> qCalibrationCurveOracle,
    "q_confusion_matrix" -> qConfusionMatrixOracle,
    "q_eval_metrics" -> qEvalMetricsOracle,
    "q_roc_auc" -> qRocAucOracle,
    "q_ece" -> qEceOracle,
    "q_lift_gains" -> qLiftGainsOracle,
    "q_threshold_sweep" -> qThresholdSweepOracle
  )
}
