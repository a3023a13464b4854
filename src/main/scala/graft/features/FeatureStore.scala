package graft.features

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Offline feature-store layout + retrieval (reference:
  * src/feature/prep_data.py:152-180 save_transformed_data — features
  * and target written as separate event-timestamped parquet — and the
  * Feast get_historical_features point-in-time retrieval pattern).
  *
  * Scale: writes are plain partitionable parquet; point-in-time
  * retrieval is the single-shuffle [[AsofJoin]], not a theta-join.
  */
object FeatureStore {

  /** Write features (all columns minus label) and target (pk + label)
    * with an event-timestamp column, each as parquet under `dir`.
    */
  def saveOffline(df: DataFrame, pkCol: String, labelCol: String,
      tsCol: String, dir: String): Unit = {
    df.drop(labelCol).write.mode("overwrite").parquet(s"$dir/features.parquet")
    df.select(col(pkCol), col(labelCol), col(tsCol))
      .write.mode("overwrite").parquet(s"$dir/target.parquet")
  }

  /** Entity-key retrieval: join features to target on the primary key
    * (the reference's training-set construction when timestamps align).
    */
  def loadTrainingSet(spark: SparkSession, dir: String, pkCol: String): DataFrame = {
    val features = spark.read.parquet(s"$dir/features.parquet")
    val target = spark.read.parquet(s"$dir/target.parquet")
    val dup = target.columns.filter(features.columns.contains).filterNot(_ == pkCol)
    features.join(target.drop(dup.toIndexedSeq: _*), Seq(pkCol))
  }

  /** Point-in-time retrieval: for each entity row (pk, ts), the latest
    * feature values at or before ts — leakage-safe historical features.
    */
  def historicalFeatures(entities: DataFrame, features: DataFrame, pkCol: String,
      tsCol: String, tieBreakCol: String, featureCols: Seq[String]): DataFrame =
    AsofJoin.asofBackward(entities, features, pkCol, tsCol, tieBreakCol, featureCols)

  /** Online feature-view materialization (reference:
    * src/feature/feature_repo/define_feature.py:24-50 FeatureView over
    * the event-timestamped source + feature_store.yaml's online store;
    * Feast `materialize` compacts history to latest-per-entity serving
    * state). ONE hash aggregate — `max_by` of the feature struct keyed
    * on (ts, tieBreak), map-side combinable, O(1) state per key —
    * never a per-key window sort or value buffer, so the compaction is
    * a single shuffle on the entity key at any history size.
    *
    * Semantics contract (spec'd in SourcesPlanSpec "online
    * materialization equals historicalFeatures"): equals
    * [[historicalFeatures]] evaluated at the max event time — i.e. the
    * online row IS the point-in-time row "now".
    */
  def materializeOnline(features: DataFrame, pkCol: String, tsCol: String,
      tieBreakCol: String, featureCols: Seq[String]): DataFrame = {
    val carried = tsCol +: featureCols
    features.groupBy(col(pkCol))
      .agg(max_by(struct(carried.map(col): _*),
        struct(col(tsCol), col(tieBreakCol))).as("__latest"))
      .select(col(pkCol) +: carried.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Write the online view as a bucketed table on the entity key, so a
    * serving-side point lookup or a scoring join against the snapshot
    * co-locates by key with NO further shuffle of the snapshot (the
    * same property the bucketed-tables spec pins for fact tables).
    */
  def saveOnline(spark: SparkSession, features: DataFrame, pkCol: String, tsCol: String,
      tieBreakCol: String, featureCols: Seq[String], table: String, path: String,
      buckets: Int = 32): Unit =
    materializeOnline(features, pkCol, tsCol, tieBreakCol, featureCols)
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, pkCol).sortBy(pkCol)
      .saveAsTable(table)
}
