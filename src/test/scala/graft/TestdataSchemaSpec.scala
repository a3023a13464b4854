package graft

import org.apache.spark.sql.types._

/** Testdata-schema tripwire (r8 postmortem item #4).
  *
  * The driver regenerates /root/testdata between rounds, and in round
  * 8 a silent physical-encoding change (events.ts TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)) took down 49 oracle queries and 9 specs as
  * anonymous AnalysisExceptions. This spec pins, for every SF, the
  * LOGICAL schema each Tables loader must deliver — so the next
  * regeneration that drifts produces ONE named failure with the table,
  * SF, and column spelled out instead of a wall of red rows.
  *
  * Types are asserted post-loader: what downstream queries consume,
  * including whichever ts-encoding branch Tables.events takes.
  */
class TestdataSchemaSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private val expected: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, Seq[(String, DataType)])] = Seq(
    ("region", Tables.region, Seq("r_regionkey" -> IntegerType, "r_name" -> StringType)),
    ("nation", Tables.nation, Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)),
    ("customer", Tables.customer, Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)),
    ("supplier", Tables.supplier, Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)),
    ("part", Tables.part, Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)),
    ("orders", Tables.orders, Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType)),
    ("lineitem", Tables.lineitem, Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType)),
    ("events", Tables.events, Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType)),
    ("documents", Tables.documents, Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)),
    ("embeddings", Tables.embeddings, Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  )

  for (dir <- sfDirs; (name, loader, cols) <- expected) {
    test(s"tripwire: $name at $dir loads the expected logical schema") {
      val df = loader(spark, dir)
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      assert(actual.map(_._1) == cols.map(_._1),
        s"TESTDATA DRIFT: $dir/$name.parquet columns changed.\n" +
          s"  expected: ${cols.map(_._1).mkString(", ")}\n" +
          s"  actual:   ${actual.map(_._1).mkString(", ")}")
      for (((n, exp), (_, act)) <- cols.zip(actual)) {
        // Array element nullability is writer-dependent noise; compare shape.
        val same = (exp, act) match {
          case (ArrayType(e1, _), ArrayType(e2, _)) => e1 == e2
          case (a, b)                               => a == b
        }
        assert(same,
          s"TESTDATA DRIFT: $dir/$name.parquet column `$n` is $act, loader expects $exp " +
            "(if this is events.ts, the physical timestamp encoding changed again — " +
            "check the dispatch in Tables.events)")
      }
    }
    // The tripwire must also catch a content regeneration that keeps the
    // schema but empties a table (rows>0 is what every oracle assumes).
    test(s"tripwire: $name at $dir is non-empty") {
      assert(loader(spark, dir).limit(1).count() == 1L,
        s"TESTDATA DRIFT: $dir/$name.parquet has no rows")
    }
  }

  // Queries assume these ids are primary keys (joins, dedup baselines,
  // per-doc aggregations) — a regeneration that introduced duplicates
  // would corrupt results without any schema change.
  private val primaryKeys = Seq(
    "customer" -> "c_custkey", "orders" -> "o_orderkey",
    "events" -> "event_id", "documents" -> "doc_id", "embeddings" -> "vec_id")

  private val loaderByName = expected.map { case (n, l, _) => n -> l }.toMap

  for (dir <- sfDirs; (name, pk) <- primaryKeys) {
    test(s"tripwire: $name.$pk is unique at $dir") {
      // Through the Tables loader, not a raw read: a raw read of a
      // TIMESTAMP(NANOS) events file would throw the anonymous
      // vectorized-reader error this spec exists to name.
      val df = loaderByName(name)(spark, dir)
      val total = df.count()
      val distinct = df.select(pk).distinct().count()
      assert(total == distinct,
        s"TESTDATA DRIFT: $dir/$name.parquet has $total rows but only " +
          s"$distinct distinct $pk values — queries assume $pk is a primary key")
    }
  }
}
