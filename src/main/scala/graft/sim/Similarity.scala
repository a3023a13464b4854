package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.6).
  *
  * Scale design: brute force is only ever (bounded query set) ×
  * (distributed corpus scan) — the query side is broadcast, the scan
  * side streams, per-partition top-k happens before the final window.
  * Full-corpus all-pairs work goes through LSH buckets (sub-quadratic).
  */
object Similarity {

  /** Cosine similarity between two array<float/double> columns.
    * Elements are cast to double first; the fold is sequential, so the
    * result is bit-deterministic for a given pair (engine-independent).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u * v), lit(0.0), (acc, v) => acc + v)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  private def dotCol(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (u, v) => u * v), lit(0.0), (acc, v) => acc + v)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded). Queries are broadcast; each side's
    * norm is computed ONCE before the join (not per pair); ranking is
    * per-query (rounded score desc, id asc — fully deterministic).
    *
    * Ranking goes through [[TopKAggregator.topKPerKey]] (map-side
    * combinable bounded buffers, ≤k rows per query leave each task) —
    * NOT `row_number().over(partitionBy(query_id))`, whose per-query
    * group is the ENTIRE corpus and whose WindowExec would sort
    * |queries|×|corpus| rows at scale.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    def prep(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).cast("long").as(id), col(vecCol).cast("array<double>").as(v))
        .withColumn(s"${v}_nrm", sqrt(dotCol(col(v), col(v))))
    val q = prep(queries, "query_id", "qv")
    val c = prep(corpus, "neighbor_id", "cv")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(dotCol(col("qv"), col("cv")) / (col("qv_nrm") * col("cv_nrm")), 4) + lit(0.0))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    TopKAggregator.topKPerKey(scored, "query_id", "neighbor_id", "cos", k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** All-pairs near-duplicate vectors above a cosine threshold. The
    * caller bounds the input (subset / LSH bucket); this is the exact
    * verifier, not the candidate generator. Norms precomputed per side.
    */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val vd = vecs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotCol(col("v"), col("v"))))
    val a = vd.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = vd.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_raw", dotCol(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_raw") >= threshold)
      .select(col("id_a"), col("id_b"), (round(col("cos_raw"), 4) + lit(0.0)).as("cos"))
  }

  /** LSH-bucketed near-duplicate pairs: candidates come from the union
    * of `seeds.size` independent hyperplane tables (pairs sharing a
    * bucket in ANY table), [[nearDupPairs]]-style exact cosine
    * verification runs only within the candidate set. The all-pairs
    * theta join never happens — candidate cost is Σ_tables Σ_buckets
    * |bucket|², the LSH trade every large-scale near-dup system makes.
    *
    * Recall: a pair at angle θ collides in one table with probability
    * (1−θ/π)^nPlanes, missed by all L tables with probability
    * (1−(1−θ/π)^nPlanes)^L — vanishing for production thresholds
    * (cos ≥ 0.7). Everything is seeded and deterministic.
    *
    * Cost honesty: candidates per table ≈ n²/2^nPlanes (2^nPlanes
    * buckets), so at FIXED nPlanes the candidate set is still
    * quadratic and L tables of few planes can exceed the n²/2
    * all-pairs join. The sub-quadratic win requires nPlanes to grow
    * with corpus size; at thresholds near the background similarity of
    * random vectors no LSH configuration prunes meaningfully. Use
    * [[planesFor]] to derive (nPlanes, nTables) that are provably
    * sub-quadratic with bounded miss probability — it rejects
    * thresholds where that's impossible (there, use exact
    * [[nearDupPairs]] on a bounded subset, as q_embed_neardup does).
    */
  def nearDupPairsLsh(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      nPlanes: Int, seeds: Seq[Long], threshold: Double): DataFrame = {
    val vd = vecs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotCol(col("v"), col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = seeds.map { s =>
      val b = vd.select(col("id"), hyperplaneBucket(col("v"), dim, nPlanes, s).as("bucket"))
      b.select(col("bucket"), col("id").as("id_a"))
        .join(b.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    }.reduce(_ unionByName _).distinct()
    val verified = cands
      .join(vd.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(vd.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cos_raw", dotCol(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_raw") >= threshold)
      .select(col("id_a"), col("id_b"), (round(col("cos_raw"), 4) + lit(0.0)).as("cos"))
    // eager materialization then release — same cache lifecycle as the
    // dedup pipelines (bounded by contract: thresholded pairs)
    val res = verified.localCheckpoint()
    vd.unpersist()
    res
  }

  /** LSH configuration for [[nearDupPairsLsh]] that is actually
    * sub-quadratic at the given corpus size — encodes the recall/cost
    * math the Scaladoc above warns about, so a 100 TB caller can't
    * ship a fixed-planes config that silently degrades to all-pairs
    * (or to ~50% recall, as a hand-tuned seed set does off its tuning
    * corpus).
    *
    * A pair at cosine `threshold` (angle θ) collides per table with
    * probability p1^p, p1 = 1−θ/π; L tables miss it with probability
    * (1−p1^p)^L ≤ `maxMissProb`. More planes prune random collisions
    * harder (n²/2^p expected background candidates per table) but need
    * more tables for the same recall, and each table is a shuffle —
    * so: pick the LARGEST p whose required L fits `maxTables` (capped
    * at log2(n); beyond that buckets are already singletons), then
    * require the background-candidate cost 2^p/L to beat the all-pairs
    * join by ≥4× or refuse. At thresholds near the background
    * similarity of random vectors (≲0.6–0.7) no (p, L) qualifies —
    * the correct answers there are exact [[nearDupPairs]] on a
    * bounded subset or [[annIvf]].
    *
    * @return (nPlanes, nTables); generate seeds as `0L until nTables`
    *         or any distinct values — recall needs independence, not
    *         tuning.
    */
  def planesFor(corpusSize: Long, threshold: Double,
      maxMissProb: Double = 1e-3, maxTables: Int = 128): (Int, Int) = {
    require(corpusSize > 1, "corpusSize must be > 1")
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1), got $threshold")
    require(maxMissProb > 0.0 && maxMissProb < 1.0, "maxMissProb must be in (0,1)")
    val p1 = 1.0 - math.acos(threshold) / math.Pi // per-plane collision prob
    val lnNeed = math.log(1.0 / maxMissProb)
    // largest p with L(p) ≈ ln(1/miss)/p1^p <= maxTables
    val pBudget = math.floor(math.log(lnNeed / maxTables) / math.log(p1)).toInt
    val pCap = math.ceil(math.log(corpusSize.toDouble) / math.log(2.0)).toInt
    val p = math.min(pBudget, pCap)
    def refuse(detail: String): Nothing = throw new IllegalArgumentException(
      s"cosine threshold $threshold at corpus size $corpusSize: $detail. " +
        "Raise the threshold (real near-dup regimes are >=0.7), or use exact " +
        "nearDupPairs on a bounded subset / annIvf instead.")
    if (p < 1) refuse(s"no plane count reaches miss<=$maxMissProb within $maxTables tables")
    val perTable = math.pow(p1, p)
    val nTables = math.max(1,
      math.ceil(math.log(maxMissProb) / math.log1p(-perTable)).toInt)
    val speedup = math.pow(2.0, p) / nTables
    if (speedup < 4.0) refuse(
      f"the best config ($p planes x $nTables tables) only beats the all-pairs " +
        f"join by $speedup%.1fx on background candidates")
    (p, nTables)
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `nPlanes` seeded hyperplanes packed into a long. Vectors in the
    * same bucket are ANN candidates — the scale path for full-corpus
    * kNN (join on bucket, verify exactly within).
    */
  def hyperplaneBucket(vecCol: Column, dim: Int, nPlanes: Int, seed: Long): Column =
    hyperplaneBucketOf(vecCol, gaussianPlanes(dim, nPlanes, seed))

  /** [[hyperplaneBucket]] with EXPLICIT planes — the oracle-replayable
    * form: a caller supplying integer-valued planes (and integral or
    * half-integral vectors) gets buckets an external engine can
    * reproduce exactly (q_ann_planted's DuckDB oracle replays this
    * expression term for term: left-to-right dot, sign at >= 0).
    */
  def hyperplaneBucketOf(vecCol: Column, planes: Seq[Seq[Double]]): Column = {
    val vd = vecCol.cast("array<double>")
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val pl = array(p.map(lit): _*)
      val d = aggregate(zip_with(vd, pl, (u, v) => u * v), lit(0.0), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private def gaussianPlanes(dim: Int, nPlanes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus,
    * each vector assigned to its nearest centroid's list; queries probe
    * only their own cell. The standard sub-quadratic scale path when
    * LSH recall is insufficient: work per query is corpus/k on average,
    * and the centroid model is tiny (broadcast).
    */
  def annIvf(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      nCells: Int, k: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val toVec = (df: DataFrame) => df.withColumn("__fv",
      array_to_vector(col(vecCol).cast("array<double>")))
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("__fv")
      .setPredictionCol("cell")
    val model = km.fit(toVec(corpus))
    val assignedCorpus = model.transform(toVec(corpus))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("cell"))
    val assignedQueries = model.transform(toVec(queries))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"))
    val scored = assignedCorpus.join(assignedQueries, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4) + lit(0.0))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    TopKAggregator.topKPerKey(scored, "query_id", "neighbor_id", "cos", k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** IVF + SQ8: the inverted-file search of [[annIvf]] over a
    * scalar-quantized corpus — the memory shape real billion-vector
    * indexes ship (IVF for sub-quadratic probing, int8 codes for a 4×
    * storage cut; q_embed_quantize measures the fidelity cost of the
    * same grid). Per-dimension min/max are fit in one narrow aggregate
    * (O(dims) rows collected, shipped back as array literals); corpus
    * vectors are snapped to the 255-step reconstruction grid BEFORE
    * scoring — exactly what scoring against stored int8 codes
    * computes — while queries stay full-precision (asymmetric distance
    * computation, the standard IVF-SQ trade). The k-means coarse
    * quantizer is fit on the ORIGINAL vectors: index build is offline
    * and pays full precision once; only the stored codes are lossy.
    */
  def annIvfSq8(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      nCells: Int, k: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val stats = corpus
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("pos")).collect()
    val mnL = lit(stats.map(_.getDouble(1)))
    val mxL = lit(stats.map(_.getDouble(2)))
    def sq8(v: Column): Column = transform(v, (x, i) => {
      val mn = element_at(mnL, i + 1)
      val mx = element_at(mxL, i + 1)
      when(mx > mn, mn + round((x - mn) / (mx - mn) * 255) / lit(255.0) * (mx - mn))
        .otherwise(mn)
    })
    val toVec = (df: DataFrame) => df.withColumn("__fv",
      array_to_vector(col(vecCol).cast("array<double>")))
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("__fv")
      .setPredictionCol("cell")
    val model = km.fit(toVec(corpus))
    val assignedCorpus = model.transform(toVec(corpus))
      .select(col(idCol).as("neighbor_id"),
        sq8(col(vecCol).cast("array<double>")).as("cv"), col("cell"))
    val assignedQueries = model.transform(toVec(queries))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"))
    val scored = assignedCorpus.join(assignedQueries, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4) + lit(0.0))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    TopKAggregator.topKPerKey(scored, "query_id", "neighbor_id", "cos", k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Per-subvector codebook assignment — the PQ encode step made
    * deterministic and oracle-checkable (the q_cluster_assign pattern
    * applied per subvector): each vector is sliced into
    * `codebooks.size` contiguous subvectors; each subvector is assigned
    * to its nearest codebook entry by squared Euclidean distance
    * rounded to 4 dp (ties → smaller code id — engine-independent).
    * `codebooks(j)(c)` is code c's centroid for subvector j. Scale: the
    * codebook frame is m×nCodes rows (broadcast); the vector side
    * explodes ×m but never shuffles — the argmin is the same bounded
    * map-side-combinable [[TopKAggregator.topKPerKey]] top-1 as
    * [[assignToCentroids]]. Returns (id, sub_id, code, dist2).
    */
  def pqAssign(vecs: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = codebooks.size
    require(m > 0 && codebooks.forall(_.nonEmpty), "empty codebooks")
    val sub = codebooks.head.head.size
    val spark = vecs.sparkSession
    import spark.implicits._
    val vd = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val subRows = vd.select(col("id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("sub_id"), slice(col("v"), j * sub + 1, sub).as("sv"))): _*)).as("s"))
      .select(col("id"), col("s.sub_id").as("sub_id"), col("s.sv").as("sv"))
    val cbDf = codebooks.zipWithIndex.flatMap { case (cbj, j) =>
      cbj.zipWithIndex.map { case (ce, c) => (j, c.toLong, ce) }
    }.toDF("sub_id", "code", "ce")
    // |sv−ce|² as sv·sv − 2 sv·ce + ce·ce, each dot the same sequential
    // fold as [[cosine]] — the exact arithmetic DuckDB's
    // list_dot_product combination reproduces (q_cluster_assign
    // discipline), so the 4-dp rounding below is engine-exact
    val scored = subRows.join(broadcast(cbDf), Seq("sub_id"))
      .withColumn("dist2", round(
        dotCol(col("sv"), col("sv")) - lit(2.0) * dotCol(col("sv"), col("ce")) +
          dotCol(col("ce"), col("ce")), 4) + lit(0.0))
      // composite (id, sub_id) packed into one long key (sub_id < m)
      .select((col("id") * m + col("sub_id")).as("key"), col("code"),
        (-col("dist2")).as("negd"))
    TopKAggregator.topKPerKey(scored, "key", "code", "negd", 1)
      .select(expr(s"key div $m").as("id"), (col("key") % m).cast("int").as("sub_id"),
        col("code"), (-col("negd") + lit(0.0)).as("dist2"))
  }

  /** IVF + PQ: the inverted-file search of [[annIvf]] over a
    * product-quantized corpus — the memory story past SQ8's 4×: m
    * subvector codebooks of `nCodes` entries store each vector as m
    * codes (m bytes at nCodes=256 vs 4·dim float32 — 16–32× for
    * dim 64–128), the standard billion-vector ANN layout. Codebooks
    * are fit per subvector with k-means ON THE ORIGINAL slices (index
    * build is offline, pays full precision once); corpus vectors are
    * scored through their RECONSTRUCTION (per-subvector centroid
    * concat — exactly what stored codes decode to) while queries stay
    * full-precision: asymmetric distance computation. Coarse cells,
    * probing, and top-k are identical to [[annIvf]].
    *
    * `rerank > 0` adds the standard exact re-ranking pass: PQ ordering
    * selects the top-`rerank` candidates per query (rerank ≪ cell
    * size — e.g. 10·k), then ONLY those candidates' full-precision
    * vectors are fetched (broadcast semi-join on the bounded candidate
    * id set — the corpus-wide scan stays code-only) and exact cosine
    * picks the final k. Recovers full-precision-IVF recall when the
    * true neighbors sit inside PQ's top-rerank — the cases
    * reconstruction error reorders are exactly neighbors separated by
    * less than the quantization noise, which re-ranking re-sorts —
    * at O(queries × rerank) extra vector reads instead of O(corpus).
    */
  def annIvfPq(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      nCells: Int, m: Int, nCodes: Int, k: Int, seed: Long = 42L,
      rerank: Int = 0): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must divide into $m subvectors")
    val sub = dim / m
    val toVec = (df: DataFrame) => df.withColumn("__fv",
      array_to_vector(col(vecCol).cast("array<double>")))
    val km = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("__fv")
      .setPredictionCol("cell")
    val model = km.fit(toVec(corpus))
    // m independent sub-codebooks (seeded per subvector)
    val subModels = (0 until m).map { j =>
      new KMeans().setK(nCodes).setSeed(seed + j + 1)
        .setFeaturesCol(s"__sv_$j").setPredictionCol(s"__code_$j")
        .fit(corpus.withColumn(s"__sv_$j",
          array_to_vector(slice(col(vecCol).cast("array<double>"), j * sub + 1, sub))))
    }
    // encode: m assignments; decode: concat of assigned centroids
    val encoded = subModels.zipWithIndex.foldLeft(model.transform(toVec(corpus))) {
      case (df, (sm, j)) => sm.transform(df.withColumn(s"__sv_$j",
        array_to_vector(slice(col(vecCol).cast("array<double>"), j * sub + 1, sub))))
    }
    val reconstructed = concat((0 until m).map { j =>
      val cbL = array(subModels(j).clusterCenters
        .map(c => array(c.toArray.map(lit): _*)): _*)
      element_at(cbL, col(s"__code_$j") + 1)
    }: _*)
    val assignedCorpus = encoded
      .select(col(idCol).as("neighbor_id"), reconstructed.as("cv"), col("cell"))
    val assignedQueries = model.transform(toVec(queries))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"))
    val scored = assignedCorpus.join(assignedQueries, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv")), 4) + lit(0.0))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val pqTop = TopKAggregator.topKPerKey(scored, "query_id", "neighbor_id", "cos",
      math.max(k, rerank))
    if (rerank <= 0)
      pqTop.select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    else {
      val cand = pqTop.select(col("query_id"), col("neighbor_id"))
      // candidate ids are bounded (queries × rerank) → broadcast; the
      // full-vector fetch touches only matching corpus rows
      val candVecs = corpus
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
        .join(broadcast(cand), Seq("neighbor_id"))
      val qVecs = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      val rescored = candVecs.join(broadcast(qVecs), Seq("query_id"))
        .withColumn("cos", round(cosine(col("qv"), col("nv")), 4) + lit(0.0))
        .select(col("query_id"), col("neighbor_id"), col("cos"))
      TopKAggregator.topKPerKey(rescored, "query_id", "neighbor_id", "cos", k)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
    }
  }

  /** LSH-bucketed ANN: exact top-k within each bucket. Sub-quadratic;
    * recall depends on nPlanes (fewer planes → bigger buckets → higher
    * recall, more work). One table — for production recall targets use
    * [[annLshMulti]] with a [[planesFor]]-derived (nPlanes, nTables).
    */
  def annLsh(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      nPlanes: Int, seed: Long, k: Int): DataFrame =
    annLshMulti(vecs, idCol, vecCol, dim, nPlanes, Seq(seed), k)

  /** Multi-table hyperplane-LSH ANN: candidate (query, neighbor) pairs
    * from the union of `seeds.size` independent tables (colliding in
    * ANY table), deduplicated BEFORE scoring, exact cosine top-k over
    * the candidate set. This is [[nearDupPairsLsh]]'s recall math
    * applied to kNN: a neighbor at per-table collision probability
    * p1^nPlanes is missed by all L tables with probability
    * (1−p1^nPlanes)^L, so a [[planesFor]] config bounds the miss rate
    * while each table still prunes ~2^nPlanes× of the all-pairs work.
    *
    * Like the dedup pipelines, the (bounded, ≤ |ids|·k rows) result is
    * materialized EAGERLY via localCheckpoint so the input cache can be
    * released here rather than leaking a release obligation to the
    * caller. Trade: checkpoint blocks are not fault-tolerant — if the
    * result must outlive executor churn, write it to storage promptly.
    */
  def annLshMulti(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      nPlanes: Int, seeds: Seq[Long], k: Int): DataFrame =
    annLshMultiTables(vecs, idCol, vecCol, k,
      seeds.map(s => gaussianPlanes(dim, nPlanes, s)))

  /** [[annLshMulti]] with EXPLICIT plane tables (one Seq[plane] per
    * table) — same candidate/scoring/top-k path; this is the seam the
    * seeded form delegates through, and the oracle-replayable entry for
    * deterministic integer-valued planes (q_ann_planted).
    */
  def annLshMultiTables(vecs: DataFrame, idCol: String, vecCol: String,
      k: Int, tables: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(tables.nonEmpty, "at least one LSH table required")
    val vd = vecs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotCol(col("v"), col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = tables.map { planes =>
      val b = vd.select(col("id"), hyperplaneBucketOf(col("v"), planes).as("bucket"))
      b.select(col("bucket"), col("id").as("query_id"))
        .join(b.select(col("bucket"), col("id").as("neighbor_id")), Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _).distinct()
    val scored = cands
      .join(vd.select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn")), Seq("query_id"))
      .join(vd.select(col("id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn")), Seq("neighbor_id"))
      .withColumn("cos",
        round(dotCol(col("qv"), col("cv")) / (col("qn") * col("cn")), 4) + lit(0.0))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val res = TopKAggregator.topKPerKey(scored, "query_id", "neighbor_id", "cos", k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
      .localCheckpoint()
    vd.unpersist()
    res
  }

  /** Nearest-centroid assignment: each vector joined against a BOUNDED
    * centroid frame (broadcast — k rows never justify a shuffle of the
    * corpus side), scored by cosine rounded to 4 dp, winner picked per
    * vector via [[TopKAggregator.topKPerKey]] (map-side combinable;
    * ties broken by smallest centroid id, fully deterministic). This is
    * the coarse-assignment step IVF and SemDedup share, exposed so the
    * oracle surface can pin it (q_cluster_assign) independently of any
    * iterative fit. Scale: one broadcast hash join + one bounded-buffer
    * aggregation — no shuffle of the vector side at all.
    */
  def assignToCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String): DataFrame = {
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val c = centroids.select(col(centIdCol).cast("long").as("cid"),
      col(centVecCol).cast("array<double>").as("cv"))
    val scored = v.join(broadcast(c))
      .withColumn("cos", round(cosine(col("v"), col("cv")), 4) + lit(0.0))
      .select(col("id"), col("cid"), col("cos"))
    TopKAggregator.topKPerKey(scored, "id", "cid", "cos", 1)
      .select(col("id"), col("cid").as("cluster_id"), col("cos"))
  }

  /** SemDedup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by k-means clustering followed by within-cluster
    * cosine thresholding. Candidate generation is the cluster
    * partition itself — pairwise work is O(Σ cluster_size²), bounded
    * by choosing nClusters ∝ √n (the paper uses 11k clusters for
    * 300M embeddings) — never all-pairs over the corpus.
    *
    * Within a cluster, any pair with rounded cosine ≥ `threshold`
    * marks the member MORE similar to its centroid as removed (the
    * paper's keep-rule: retain the item farthest from the centroid,
    * i.e. the least redundant exemplar), ties broken by larger id
    * removed. The rule is applied pairwise-transitively (a victim can
    * itself eliminate a higher-priority victim's neighbor only via its
    * own pairs), which matches the paper's greedy sweep and is order-
    * independent: victim = lexicographic max of ((centroid_cos, id))
    * per pair, removed = DISTINCT victims.
    *
    * Returns (id, cluster_id, centroid_cos, keep). Spec'd in
    * TextDedupSimSpec (planted duplicate groups collapse to one kept
    * member each; spread singletons all survive).
    */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
      nClusters: Int, threshold: Double, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("__fv", array_to_vector(col("v")))
    val km = new KMeans().setK(nClusters).setSeed(seed).setFeaturesCol("__fv")
      .setPredictionCol("cluster_id")
    val model = km.fit(v)
    val centArr = model.clusterCenters.map(_.toArray)
    val centLit = array(centArr.map(c => array(c.map(lit): _*)): _*)
    val assigned = model.transform(v)
      .withColumn("centroid_cos",
        round(cosine(col("v"), element_at(centLit, col("cluster_id") + 1)), 4) + lit(0.0))
      .select(col("id"), col("v"), col("cluster_id").cast("long").as("cluster_id"),
        col("centroid_cos"))
    keepRule(assigned, threshold)
  }

  /** [[semDedup]] with caller-supplied centroids instead of a k-means
    * fit — assignment via [[assignToCentroids]] (cosine argmax; for
    * unit-normalized embeddings this matches k-means' Euclidean
    * argmin). With a DETERMINISTIC centroid frame every step is
    * engine-reproducible algebra, which is how q_semdedup_audit pins
    * the full keep-rule by DuckDB oracle rather than only by spec.
    */
  def semDedupWithCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      threshold: Double): DataFrame = {
    val v = vecs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val assigned = assignToCentroids(vecs, idCol, vecCol, centroids, centIdCol, centVecCol)
      .withColumnRenamed("cos", "centroid_cos")
      .join(v, Seq("id"))
      .select(col("id"), col("v"), col("cluster_id"), col("centroid_cos"))
    keepRule(assigned, threshold)
  }

  /** SemDedup's keep-rule over an assigned frame (id, v, cluster_id,
    * centroid_cos): within a cluster, any pair with rounded cosine ≥
    * threshold marks the member MORE similar to its centroid as
    * removed (ties: larger id removed); removed = DISTINCT victims.
    * The cluster partition bounds the pairwise join; the input is
    * persisted across its two consumers (pair sides + final flag join)
    * and the bounded result is checkpointed so the cache releases here.
    */
  private def keepRule(assignedIn: DataFrame, threshold: Double): DataFrame = {
    // explicit width before the persist (r18; the r13 bytes-blind
    // lesson): the assigned frame arrives through a tiny-bytes
    // aggregate exchange that AQE coalesces to ONE partition, and the
    // within-cluster pair join broadcasts one side — so ALL of the
    // O(Σ cluster²) cosine work ran on the cached frame's single
    // partition (stage-profiled at sf0.1: one 4.6 s single-task stage
    // = 70% of q_semdedup_audit). Pair work is per-row CPU, not
    // bytes; REPARTITION_BY_NUM is exempt from AQE coalescing. Width
    // is 2× cores, NOT rangeWidth: the frame sits above a broadcast
    // join whose multiplied sizeInBytes estimate saturates the 1024
    // cap (measured: six 1024-task stages of scheduling overhead on
    // 2000 rows — the chunkedCarry width lesson).
    val width = 2 * assignedIn.sparkSession.sparkContext.defaultParallelism
    val assigned = assignedIn
      .repartition(width, col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cluster_id"), col("id").as("id_a"),
      col("v").as("va"), col("centroid_cos").as("ca"))
    val b = assigned.select(col("cluster_id"), col("id").as("id_b"),
      col("v").as("vb"), col("centroid_cos").as("cb"))
    val victims = a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosine(col("va"), col("vb")), 4) + lit(0.0) >= threshold)
      .select(when(col("ca") > col("cb") ||
          (col("ca") === col("cb") && col("id_a") > col("id_b")), col("id_a"))
        .otherwise(col("id_b")).as("id"))
      .distinct()
    val res = assigned
      .join(victims.withColumn("__rm", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster_id"), col("centroid_cos"),
        col("__rm").isNull.as("keep"))
      .localCheckpoint()
    assigned.unpersist()
    res
  }
}
