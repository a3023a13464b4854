package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.ml.{CometTracker, EvalArtifacts, ExperimentTracker, ModelRegistry,
  TrackerRegistry, Trainer}

/** The Comet-wire backend against a LOCAL stub implementing the same
  * REST surface (write/experiment/create + metric + parameter +
  * log-other; experiments + experiment/metrics-raw + parameters +
  * log-other reads) with an in-memory store — no network egress, and
  * the tracker code path is identical to a real server. Together with
  * MlflowTrackerSpec this proves the registry's remote-backend claim
  * for BOTH wire formats the reference registers
  * (orchestrator.py:84-105). The behavioral contract mirrors the
  * other backend specs: log → list → best-run selection → trials →
  * artifacts → registry stages — and the stub REJECTS requests
  * missing the Authorization header, pinning the auth plumbing.
  */
class CometTrackerSpec extends SparkSpec {
  private implicit val fmt: Formats = DefaultFormats

  private final class Stub {
    final case class StoredExp(
      key: String, name: String, project: String,
      var params: Map[String, String] = Map.empty,
      var others: Map[String, String] = Map.empty,
      // (metricName, value, step) in log order
      var metrics: List[(String, Double, Int)] = Nil)

    val exps = scala.collection.mutable.LinkedHashMap[String, StoredExp]()

    private def body(ex: HttpExchange): JValue =
      JsonMethods.parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))

    private def respond(ex: HttpExchange, v: JValue): Unit = {
      val bytes = JsonMethods.compact(JsonMethods.render(v)).getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    private def query(ex: HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).map(_.split("&")
        .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap).getOrElse(Map.empty)

    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/rest/v2/", (ex: HttpExchange) => try {
      // Comet's documented auth: every request carries the API key
      if (Option(ex.getRequestHeaders.getFirst("Authorization")).forall(_.isEmpty)) {
        val msg = """{"msg":"missing api key"}""".getBytes("UTF-8")
        ex.sendResponseHeaders(401, msg.length.toLong)
        ex.getResponseBody.write(msg); ex.close()
      } else {
        val path = ex.getRequestURI.getPath.stripPrefix("/api/rest/v2/")
        path match {
          case "write/experiment/create" =>
            val b = body(ex)
            val key = java.util.UUID.randomUUID().toString.replace("-", "")
            exps(key) = StoredExp(key, (b \ "experimentName").extract[String],
              (b \ "projectName").extract[String])
            respond(ex, JObject("experimentKey" -> JString(key)))
          case "write/experiment/metric" =>
            val b = body(ex)
            val e = exps((b \ "experimentKey").extract[String])
            e.metrics = e.metrics :+ (((b \ "metricName").extract[String],
              (b \ "metricValue").extract[Double], (b \ "step").extractOrElse[Int](0)))
            respond(ex, JObject())
          case "write/experiment/parameter" =>
            val b = body(ex)
            val e = exps((b \ "experimentKey").extract[String])
            e.params += ((b \ "parameterName").extract[String] ->
              (b \ "parameterValue").extract[String])
            respond(ex, JObject())
          case "write/experiment/log-other" =>
            val b = body(ex)
            val e = exps((b \ "experimentKey").extract[String])
            e.others += ((b \ "key").extract[String] -> (b \ "value").extract[String])
            respond(ex, JObject())
          case "experiments" =>
            val proj = query(ex)("projectName")
            respond(ex, JObject("experiments" -> JArray(
              exps.values.filter(_.project == proj).toList.map(e => JObject(
                "experimentKey" -> JString(e.key),
                "experimentName" -> JString(e.name))))))
          case "experiment/metrics-raw" =>
            val e = exps(query(ex)("experimentKey"))
            respond(ex, JObject("metrics" -> JArray(e.metrics.map { case (n, v, st) =>
              JObject("metricName" -> JString(n), "metricValue" -> JDouble(v),
                "step" -> JInt(st), "timestamp" -> JInt(0)) })))
          case "experiment/parameters" =>
            val e = exps(query(ex)("experimentKey"))
            respond(ex, JObject("results" -> JArray(e.params.toList.map { case (n, v) =>
              JObject("name" -> JString(n), "valueCurrent" -> JString(v)) })))
          case "experiment/log-other" =>
            val e = exps(query(ex)("experimentKey"))
            respond(ex, JObject("logOtherList" -> JArray(e.others.toList.map { case (n, v) =>
              JObject("name" -> JString(n), "valueCurrent" -> JString(v)) })))
          case other =>
            ex.sendResponseHeaders(404, -1); ex.close()
        }
      }
    } catch {
      case e: Throwable =>
        val msg = e.toString.getBytes("UTF-8")
        ex.sendResponseHeaders(500, msg.length.toLong)
        ex.getResponseBody.write(msg); ex.close()
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("comet wire backend: runs, selection, trials, artifacts, stages round-trip") {
    val stub = new Stub
    try {
      val t = TrackerRegistry.create("comet", spark, stub.url)
      assert(TrackerRegistry.registered.contains("comet"))
      t.logRun(ExperimentTracker.Run("r1", "logreg", Map("regParam" -> 0.1),
        Map("auc" -> 0.81), timestampMs = 1000L, artifacts = Map("model" -> "/m/r1")))
      t.logRun(ExperimentTracker.Run("r2", "gbt", Map("maxDepth" -> 3.0),
        Map("auc" -> 0.86), timestampMs = 2000L, artifacts = Map("model" -> "/m/r2")))
      t.logRun(ExperimentTracker.Run("r3", "rf", Map.empty,
        Map("auc" -> 0.99), timestampMs = 3000L)) // no model artifact

      // the wire really was exercised: the stub holds the experiments
      assert(stub.exps.size === 3)
      assert(stub.exps.values.exists(_.name == "r2"))
      assert(stub.exps.values.forall(_.others.contains("graft.model")))

      // listRuns: most recent first, params/metrics/artifacts rebuilt
      val listed = t.listRuns().collect()
      assert(listed.map(_.getAs[String]("runId")).toSeq == Seq("r3", "r2", "r1"))
      assert(t.bestRun("auc", 10).map(_.runId).contains("r3"))
      assert(t.bestDeployableRun("auc", 10).map(_.runId).contains("r2"))

      // trials via trial_metric history + params-JSON others
      t.logTrials("r2", Seq(
        Trainer.Trial(Map("maxDepth" -> 2.0), 0.80),
        Trainer.Trial(Map("maxDepth" -> 3.0), 0.86)))
      val trials = t.trialsOf("r2").collect()
      assert(trials.length === 2)
      assert(trials(1).getAs[Double]("metric") === 0.86)
      assert(trials(1).getAs[Map[String, Double]]("params") == Map("maxDepth" -> 3.0))
      // the run-level metric must not be polluted by trial samples
      assert(t.listRuns()
        .filter(org.apache.spark.sql.functions.col("runId") === "r2").collect()
        .head.getAs[Map[String, Double]]("metrics") == Map("auc" -> 0.86))

      // artifacts under the local per-experiment root
      import spark.implicits._
      t.logConfusionMatrix("r2", Seq((0, 0, 5L), (1, 1, 7L)).toDF("label", "pred", "n"))
      assert(t.confusionMatrix("r2").count() === 2)
      t.logCurve("r2", "roc", EvalArtifacts.Curve("line", "fpr", "tpr",
        Seq((0.0, 0.0), (1.0, 1.0)).toDF("fpr", "tpr")))
      assert(t.curveNames("r2") == Seq("roc"))
      assert(t.curve("r2", "roc").chart === "line")
      assert(t.curve("r2", "roc").frame.count() === 2)

      // registry stages as append-only others; archived not deployable
      ModelRegistry.register(t, "r2")
      ModelRegistry.archive(t, "r2")
      assert(t.runIdsAtStage(ModelRegistry.Archived) == Seq("r2"))
      assert(ModelRegistry.stageOf(t, "r2").contains(ModelRegistry.Archived))
      assert(t.bestDeployableRun("auc", 10).map(_.runId).contains("r1"))
    } finally stub.stop()
  }

  test("re-logged run metric resolves by max step, not wire order") {
    val stub = new Stub
    try {
      val t = new CometTracker(spark, stub.url)
      t.logRun(ExperimentTracker.Run("r1", "rf", Map.empty, Map("auc" -> 0.5), 1L))
      // a real metrics-raw response has NO ordering contract: simulate a
      // server returning the step-1 re-log BEFORE the stale step-0
      // sample — wire-order .last would resolve auc to the stale 0.5
      val e = stub.exps.values.find(_.name == "r1").get
      e.metrics = List(("auc", 0.9, 1), ("auc", 0.5, 0))
      val m = t.listRuns().collect().head.getAs[Map[String, Double]]("metrics")
      assert(m == Map("auc" -> 0.9), s"stale sample won: $m")
    } finally stub.stop()
  }

  test("second logTrials call appends steps instead of restarting at 0") {
    val stub = new Stub
    try {
      val t = new CometTracker(spark, stub.url)
      t.logRun(ExperimentTracker.Run("r1", "rf", Map.empty, Map("auc" -> 0.5), 1L))
      t.logTrials("r1", Seq(
        Trainer.Trial(Map("d" -> 1.0), 0.70),
        Trainer.Trial(Map("d" -> 2.0), 0.75)))
      t.logTrials("r1", Seq(Trainer.Trial(Map("d" -> 3.0), 0.80)))
      val trials = t.trialsOf("r1").collect()
      assert(trials.map(_.getAs[Int]("trial")).toSeq == Seq(0, 1, 2))
      assert(trials.map(_.getAs[Double]("metric")).toSeq == Seq(0.70, 0.75, 0.80))
      assert(trials(2).getAs[Map[String, Double]]("params") == Map("d" -> 3.0),
        "appended trial must keep its own params, not overwrite step 0's")
    } finally stub.stop()
  }

  test("requests without the api key are rejected by the server, loudly") {
    val stub = new Stub
    try {
      val t = new CometTracker(spark, stub.url, apiKey = "")
      val e = intercept[IllegalArgumentException] {
        t.logRun(ExperimentTracker.Run("r1", "rf", Map.empty, Map.empty, 1L))
      }
      assert(e.getMessage.contains("401"), e.getMessage)
    } finally stub.stop()
  }
}
