package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing of the psiByFeature histogram path. */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = graft.GraftSession.builder("drift-probe", cpus)
      .master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val li = graft.Tables.lineitem(spark, d)
    val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = li.filter($"l_orderkey" % 2 === 0)
    val cur = li.filter($"l_orderkey" % 2 === 1)
    def melt(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(array(feats.map(f =>
        struct(lit(f).as("feature"), col(f).cast("double").as("v"))): _*)).as("m"))
        .select(col("m.feature").as("feature"), col("m.v").as("v"))
    val cells = melt(base).withColumn("r", lit(1L))
      .unionByName(melt(cur).withColumn("r", lit(0L)))
      .groupBy(col("feature"), col("v"))
      .agg(sum(col("r")).as("nb"), sum(lit(1L) - col("r")).as("nc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("stats job (fills cache)") {
      cells.groupBy(col("feature")).agg(sum(col("nb")), count(lit(1))).collect()
    }
    println("cells: " + cells.count())
    t("window+fetch job") {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("feature")).orderBy(col("v"))
      cells.filter(col("v").isNotNull && !isnan(col("v")))
        .withColumn("cum", sum(col("nb")).over(w))
        .filter(col("cum") - col("nb") < 100 && col("cum") >= 100)
        .collect()
    }
    t("bin+agg job") {
      cells.groupBy(col("feature"),
          when(col("v") <= 1.0, 0).when(col("v") <= 2.0, 1).otherwise(2).as("bin"))
        .agg(sum(col("nb")), sum(col("nc"))).collect()
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    t("full psiByFeature") {
      graft.ml.Evaluator.psiByFeature(base, cur, feats).collect()
    }
    println("jobs in full run: " + jobs.get())
    jobs.set(0)
    t("full psiByFeature again") {
      graft.ml.Evaluator.psiByFeature(base, cur, feats).collect()
    }
    println("jobs in full run 2: " + jobs.get())
    spark.stop()
  }
}
