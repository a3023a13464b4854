package graft.ml

import java.io.FileInputStream
import java.util.Properties

import scala.jdk.CollectionConverters._

/** Config-driven training: parse a properties file into
  * [[TrainPipeline.Config]] — the declarative surface of the
  * reference's training-config.yml + config_loader.py:54 (search
  * spaces, trial budgets, metrics, thresholds as data, not code).
  * Java properties instead of YAML keeps it dependency-free; the
  * schema mirrors the reference's keys:
  *
  * {{{
  * label_col=label
  * pk_col=id
  * feature_array_col=features
  * train_fraction=0.8
  * seed=42
  * trials_per_model=5
  * deployment_threshold=0.6
  * fbeta_beta=0.5
  * threshold_grid=0.05:0.95:0.05      # lo:hi:step, or a comma list
  * balance_classes=true
  * models=logreg,gbt                  # logreg | rf | gbt
  * model.logreg.space=regParam:1e-4:1.0:log
  * model.gbt.space=maxDepth:2:5,maxIter:5:15
  * }}}
  */
object TrainConfig {

  /** Model name → kind (reference: training-config.yml model registry;
    * gbt covers the LightGBM/XGBoost seats — Spark's native GBT).
    */
  def parseModelKind(s: String): Trainer.ModelKind = s.trim.toLowerCase match {
    case "logreg" | "logistic_regression"      => Trainer.LogReg
    case "rf" | "random_forest"                => Trainer.RandomForest
    case "gbt" | "lightgbm" | "xgboost"        => Trainer.GBT
    case other => throw new IllegalArgumentException(s"unknown model kind: $other")
  }

  /** `name:lo:hi[:log]` items, comma-separated
    * (reference: training-config.yml search_space_params [lo, hi, log]).
    */
  def parseSpace(s: String): Seq[Trainer.ParamRange] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { item =>
      item.split(":").map(_.trim) match {
        case Array(name, lo, hi) =>
          Trainer.ParamRange(name, lo.toDouble, hi.toDouble)
        case Array(name, lo, hi, "log") =>
          Trainer.ParamRange(name, lo.toDouble, hi.toDouble, log = true)
        case _ => throw new IllegalArgumentException(s"bad param range: $item")
      }
    }

  /** Threshold grid: either `lo:hi:step` (BigDecimal steps — no float
    * drift) or an explicit comma list.
    */
  def parseGrid(s: String): Seq[Double] =
    if (s.contains(":")) s.split(":") match {
      case Array(loS, hiS, stepS) =>
        val Seq(lo, hi, step) = Seq(loS, hiS, stepS).map(x => BigDecimal(x.trim))
        Iterator.iterate(lo)(_ + step).takeWhile(_ <= hi).map(_.toDouble).toSeq
      case _ => throw new IllegalArgumentException(
        s"grid '$s' must have exactly 3 fields lo:hi:step")
    } else s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toDouble)

  /** Build a Config from a key→value map; unset keys keep the
    * [[TrainPipeline.Config]] defaults.
    */
  def fromMap(p: Map[String, String]): TrainPipeline.Config = {
    val base = TrainPipeline.Config(
      labelCol = p.getOrElse("label_col",
        throw new IllegalArgumentException("label_col is required")),
      pkCol = p.getOrElse("pk_col",
        throw new IllegalArgumentException("pk_col is required")),
      featureArrayCol = p.getOrElse("feature_array_col",
        throw new IllegalArgumentException("feature_array_col is required")))
    val models = p.get("models").map {
      _.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { m =>
        val space = p.getOrElse(s"model.$m.space",
          throw new IllegalArgumentException(s"model.$m.space is required for model $m"))
        (parseModelKind(m), parseSpace(space))
      }
    }.getOrElse(base.models)
    base.copy(
      trainFraction = p.get("train_fraction").map(_.toDouble).getOrElse(base.trainFraction),
      seed = p.get("seed").map(_.toLong).getOrElse(base.seed),
      models = models,
      trialsPerModel = p.get("trials_per_model").map(_.toInt).getOrElse(base.trialsPerModel),
      deploymentThreshold =
        p.get("deployment_threshold").map(_.toDouble).getOrElse(base.deploymentThreshold),
      fbetaBeta = p.get("fbeta_beta").map(_.toDouble).getOrElse(base.fbetaBeta),
      thresholdGrid = p.get("threshold_grid").map(parseGrid).getOrElse(base.thresholdGrid),
      balanceClasses = p.get("balance_classes").map(_.toBoolean).getOrElse(base.balanceClasses),
      searchStrategy = p.getOrElse("search_strategy", base.searchStrategy),
      calibrate = p.get("calibrate").map(_.toBoolean).getOrElse(base.calibrate),
      trackerDir = p.get("tracker_dir"),
      trackerBackend = p.getOrElse("tracker_backend", base.trackerBackend),
      logCurves = p.get("log_curves").map(_.toBoolean).getOrElse(base.logCurves),
      objective = p.getOrElse("objective", base.objective))
  }

  /** Config sanity checks (reference: schemas.py:74 check_params) —
    * fail fast at load time, not mid-training. Returns the config for
    * chaining.
    */
  def validate(cfg: TrainPipeline.Config): TrainPipeline.Config = {
    def req(cond: Boolean, msg: String): Unit =
      if (!cond) throw new IllegalArgumentException(msg)
    req(cfg.trainFraction > 0 && cfg.trainFraction < 1,
      s"train_fraction must be in (0,1), got ${cfg.trainFraction}")
    req(cfg.trialsPerModel >= 1, s"trials_per_model must be >= 1, got ${cfg.trialsPerModel}")
    req(cfg.models.nonEmpty, "at least one model required")
    req(cfg.models.forall(_._2.nonEmpty), "every model needs a non-empty search space")
    req(cfg.models.forall(_._2.forall(r => r.lo <= r.hi && (!r.log || r.lo > 0))),
      "param ranges must have lo <= hi (and lo > 0 when log-scaled)")
    req(cfg.thresholdGrid.nonEmpty && cfg.thresholdGrid.forall(t => t >= 0 && t <= 1),
      "threshold_grid values must lie in [0,1]")
    req(cfg.deploymentThreshold >= 0 && cfg.deploymentThreshold <= 1.01,
      s"deployment_threshold out of range: ${cfg.deploymentThreshold}")
    req(Set("random", "halving", "tpe", "parallel").contains(cfg.searchStrategy),
      s"search_strategy must be random|halving|tpe|parallel, got ${cfg.searchStrategy}")
    req(cfg.fbetaBeta > 0, s"fbeta_beta must be positive, got ${cfg.fbetaBeta}")
    req(TrackerRegistry.registered.contains(cfg.trackerBackend),
      s"tracker_backend must be one of ${TrackerRegistry.registered.mkString("|")}, " +
        s"got ${cfg.trackerBackend}")
    req(Set("binary", "multiclass").contains(cfg.objective),
      s"objective must be binary|multiclass, got ${cfg.objective}")
    if (cfg.objective == "multiclass") {
      req(cfg.searchStrategy == "random",
        "multiclass supports search_strategy=random only (weighted-F1 scoring)")
      req(!cfg.calibrate, "calibrate applies to binary scores only")
      req(cfg.models.forall(_._1 != Trainer.GBT),
        "GBTClassifier is binary-only in MLlib; drop it for multiclass")
    }
    cfg
  }

  /** Load a properties file into a validated Config. */
  def load(path: String): TrainPipeline.Config = {
    val props = new Properties()
    val in = new FileInputStream(path)
    try props.load(in) finally in.close()
    validate(fromMap(props.asScala.toMap))
  }
}
