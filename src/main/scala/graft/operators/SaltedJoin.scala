package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting (SURVEY.md §4).
  *
  * AQE's skew-join split handles most cases at runtime; salting is the
  * explicit fallback when one side's hot keys are known to concentrate
  * in a few reducers (e.g. a power-law user id). The skewed (large)
  * side gets a random salt in [0, salts); the other side is replicated
  * across all salts; the join key becomes (key, salt), spreading each
  * hot key over `salts` reducers. Result is row-identical to the plain
  * join (spec-asserted).
  */
object SaltedJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `key`, salted
    * `salts` ways. `small` is replicated ×salts — size it accordingly.
    */
  def innerSalted(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", (rand(42L) * salts).cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
