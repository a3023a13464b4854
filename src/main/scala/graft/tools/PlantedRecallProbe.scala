package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** Dev probe (VERDICT r16 #7): planted-neighbor ANN recall one-two
  * decades above the oracle seat's 600-row cap, through the REAL
  * production path — [[Similarity.planesFor]] geometry +
  * [[Similarity.annLshMulti]] (seeded gaussian planes, multi-table
  * candidate union, exact cosine top-k).
  *
  * Setup mirrors q_ann_planted: every `every`-th corpus vector gets a
  * perturbed twin (first coordinate +0.25; corpus vectors are unit —
  * planted cosine ≈ 0.97), and recall@3 is the fraction of twins whose
  * source lands in their top-3. Two numbers disentangle the failure
  * modes: `top3_frac` (end-to-end, can lose to genuinely-closer
  * neighbors) and `collide_frac` (pure LSH geometry — source and twin
  * share a bucket in ≥1 table), computed directly from the same seeded
  * planes without the join.
  *
  * Output: one JSON line per run.
  */
object PlantedRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/benchdata/sf1")
    val every = args.lift(1).map(_.toLong).getOrElse(40L)
    val threshold = args.lift(2).map(_.toDouble).getOrElse(0.95)
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val corpus = graft.Tables.embeddings(spark, sfDir)
      .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("v"))
      .localCheckpoint()
    val n = corpus.count()
    val (p, l) = Similarity.planesFor(n, threshold)
    // query-id offset must clear the ACTUAL id space (r18): the fixed
    // 2e9 collided with ScaleReplicate's per-replica +k*1e9 offsets at
    // sf>=1, aliasing query ids onto replica>=2 corpus ids (the first
    // sf1 run read top3_frac 1.18 — impossible — because corpus rows
    // passed the query-id filter and duplicate ids corrupted the join)
    val qOff = corpus.agg(max($"id")).head().getLong(0) + 1000000000L
    val queries = corpus.filter($"id" % every === 0)
      .select(($"id" + qOff).as("id"),
        concat(array(element_at($"v", 1) + lit(0.25)),
          slice($"v", 2, dim - 1)).as("v"))
      .localCheckpoint()
    val nq = queries.count()
    val seeds = (0L until l.toLong).toSeq
    val t0 = System.nanoTime()
    val top = Similarity.annLshMulti(
      corpus.unionByName(queries), "id", "v", dim, p, seeds, 3)
    val found = top.filter($"query_id" >= qOff &&
      $"neighbor_id" === $"query_id" - qOff).count()
    val sec = (System.nanoTime() - t0) / 1e9
    // pure-geometry recall: source/twin bucket equality in >=1 table,
    // from the same seeded planes annLshMulti used
    val pairs = corpus.filter($"id" % every === 0)
      .select($"id".as("sid"), $"v".as("sv"))
      .join(queries.select(($"id" - qOff).as("sid"), $"v".as("qv")), Seq("sid"))
    val collided = pairs.filter(seeds.map(s =>
      Similarity.hyperplaneBucket($"qv", dim, p, s) ===
        Similarity.hyperplaneBucket($"sv", dim, p, s)).reduce(_ || _)).count()
    val (cpuC, ioC) = Calib.readBoth(spark) // self-annotating (r18)
    def f4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"planted_recall","sf":"$sfDir","n":$n,"n_queries":$nq,"threshold":$threshold,"n_planes":$p,"n_tables":$l,"top3_frac":${f4(found.toDouble / nq)},"collide_frac":${f4(collided.toDouble / nq)},"sec":${f4(sec)},${Calib.jsonFields(cpuC, ioC)}}""")
    spark.stop()
  }
}
