package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.SaltedRuns

class TmpNullableForkSpec extends SparkSpec {
  import spark.implicits._

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
  import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

  private def shuffleStages(df: org.apache.spark.sql.DataFrame): Seq[ShuffleQueryStageExec] = {
    df.collect()
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def rec(p: SparkPlan): Seq[QueryStageExec] = {
      val here = p.collect { case s: QueryStageExec => s }
      here ++ here.flatMap(s => rec(s.plan))
    }
    rec(root).collect { case s: ShuffleQueryStageExec => s }
  }

  test("TMP: chunkedRowsAgg one-exchange contract with a NULLABLE key") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 1500).map { i =>
      val key: Option[Long] = if (rnd.nextBoolean()) Some(1L) else Some(2L + rnd.nextInt(3))
      (key, (rnd.nextInt(300) + 1).toLong, i.toLong, rnd.nextInt(100).toDouble)
    }.toDF("k", "ord", "tie", "v")
    assert(rows.schema("k").nullable, "fixture must be nullable to reproduce")
    val out = SaltedRuns.chunkedRowsAgg(rows, "k", $"ord", Seq($"tie"), k = 3,
      wd => avg($"v").over(wd), "mavg", chunkSize = 64L, hotThreshold = 50L)
    val stages = shuffleStages(out)
    val real = stages.map(_.plan).collect { case e: ShuffleExchangeLike => e }
    val reused = stages.map(_.plan).collect { case r: ReusedExchangeExec => r }
    val nB = real.count(_.outputPartitioning.toString.contains("__sr_b"))
    info(s"real shuffles=${real.size} (__sr_b: $nB), reused=${reused.size}")
    assert(nB == 1,
      s"NULLABLE-key fork: ${nB} (key, __sr_b) data shuffles:\n${real.mkString("\n")}")
  }
}
