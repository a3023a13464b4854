package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * At 100 TB these reads are plain distributed parquet scans; Catalyst
  * pushes filters/column pruning into them, so every query should
  * start from these and select/filter declaratively (never cache the
  * whole table eagerly).
  */
object Tables {
  /** Read a table and normalize every TIMESTAMP_NTZ column to
    * TIMESTAMP. The regenerated testdata writes naive
    * TIMESTAMP(MICROS) (isAdjustedToUTC=false), which Spark infers as
    * TIMESTAMP_NTZ — a type `unix_micros`, `Row.getTimestamp`, and
    * the pre-regeneration query surface all reject. The generator's
    * naive values ARE UTC instants and every entry point (Verify,
    * Bench, specs) runs with spark.sql.session.timeZone=UTC, so the
    * cast is digit-preserving and reproduces the original instants.
    */
  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(raw) { (df, c) =>
      df.withColumn(c, df.col(c).cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** events.parquet has shipped with two physical encodings of `ts`:
    * TIMESTAMP(NANOS) (readable only via nanosAsLong → long) and
    * TIMESTAMP(MICROS) (a plain timestamp). Dispatch on the decoded
    * type so either generation of the testdata loads to the same
    * logical schema: `ts: timestamp` at microsecond precision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // nanosAsLong is a session default (GraftSession / Verify / Bench /
    // SparkSpec all set it at build time) — not set per-call here,
    // because a mid-session conf flip does not invalidate plans already
    // cached against the other decoding.
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos decoded as long: truncate with integer division (no
        // double round-trip, which would lose precision at 1e18 nanos).
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
