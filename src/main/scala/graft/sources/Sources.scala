package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus ingestion entry points (SURVEY.md §2.10) — how raw data in
  * object storage becomes the tables the rest of the library runs on.
  * Both are plain distributed reads: at 100 TB the file listing is
  * driver-side metadata, the content scan is fully parallel, and
  * every downstream id is CONTENT-derived — deterministic across
  * re-ingests, partitionings, and engines (no
  * monotonically_increasing_id, whose values depend on partition
  * layout).
  */
object Sources {

  /** Raw text-corpus ingestion: one document per line over a
    * directory/glob of text files (the jsonl-adjacent layout crawl
    * dumps actually arrive in). Emits the `documents`-shaped columns
    * the curation pipeline consumes: content-addressed doc_id
    * (xxhash64 of the text — identical lines share an id, which is
    * exactly what a dedup-first pipeline wants), the text, and the
    * originating file name as `source`. Blank lines are dropped.
    */
  def textCorpus(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        xxhash64(col("value")).as("doc_id"),
        col("value").as("text"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("source"))

  /** Media ingestion via Spark's binaryFile source: each file becomes
    * one row of (content-addressed media_id, opaque binary payload,
    * typed metadata) matching [[graft.multimodal.Multimodal]]'s
    * schema contract — the real entry path for an image/audio corpus
    * in object storage. Format comes from the file extension;
    * width/height are −1 (unknown) until a decode pass fills them —
    * the binaryFile source also supports `pathGlobFilter` pushdown
    * ("*.png") and, on partitioned layouts, partition pruning, so a
    * format-filtered scan never reads the excluded bytes.
    */
  def mediaFromFiles(spark: SparkSession, path: String,
      globFilter: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val withGlob = globFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
    withGlob.load(path)
      .select(
        xxhash64(col("content")).as("media_id"),
        col("content").as("payload"),
        struct(
          lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("format"),
          lit(-1).as("width"),
          lit(-1).as("height")).as("meta"),
        col("path"),
        col("length").as("n_bytes"))
  }
}
