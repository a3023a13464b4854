package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev probe: which task metric actually carries parquet scan bytes on
  * this Spark build + local FS? (Bench's IO line depends on it.)
  */
object IoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled",
        sys.env.getOrElse("PROBE_VECTORED", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val br = new AtomicLong; val rr = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { br.addAndGet(m.inputMetrics.bytesRead); rr.addAndGet(m.inputMetrics.recordsRead); () }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        println(s"[probe] stage ${sc.stageInfo.stageId}: in=${m.inputMetrics.bytesRead}b/${m.inputMetrics.recordsRead}r " +
          s"shufR=${m.shuffleReadMetrics.totalBytesRead} shufW=${m.shuffleWriteMetrics.bytesWritten}")
      }
    })
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val n = df.selectExpr("sum(l_quantity)").collect()(0)
    org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
    println(s"[probe] sum=$n taskEnd bytesRead=${br.get} recordsRead=${rr.get}")
    // hadoop FS statistics view
    import scala.jdk.CollectionConverters._
    org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala.foreach { s =>
      println(s"[probe] fs ${s.getScheme}: read=${s.getBytesRead} written=${s.getBytesWritten}")
    }
    spark.stop()
  }
}
