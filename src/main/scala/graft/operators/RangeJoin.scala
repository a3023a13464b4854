package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band) join without an equi-key: pairs every anchor row with
  * the probe rows whose point falls in `[anchor, anchor + width)`.
  *
  * A naive theta-join is a broadcast-nested-loop (O(|A|·|P|) — dead at
  * 100 TB). This implementation makes it an EQUI-join: bucket both
  * sides by `floor(point / width)`; a window of length `width` starting
  * at `a` can only intersect buckets `floor(a/width)` and
  * `floor(a/width)+1`, so each anchor is duplicated into exactly those
  * two buckets (a 2× blowup on the SMALL side by contract), the join
  * key is the bucket id (hash shuffle, AQE-balanced), and the exact
  * range predicate filters within buckets. Work is O(candidate pairs),
  * which for time-window semantics is the output size itself.
  *
  * Column names of `anchors` and `probes` must be disjoint.
  */
object RangeJoin {

  /** Band join on long-typed points (e.g. epoch micros).
    *
    * @param anchors  the window-defining side (kept whole; should be
    *                 the smaller side — it is duplicated ×2)
    * @param probes   the probed side
    * @param anchorPt anchor window start (long expression over `anchors`)
    * @param probePt  probe point (long expression over `probes`)
    * @param width    window length; probe matches iff
    *                 anchorPt <= probePt < anchorPt + width
    */
  def bandJoin(anchors: DataFrame, probes: DataFrame,
      anchorPt: Column, probePt: Column, width: Long): DataFrame = {
    require(width > 0, "band width must be positive")
    // floor division (DIV truncates toward zero — wrong for negative points)
    def fdiv(c: String): String = s"($c - pmod($c, ${width}L)) DIV ${width}L"
    val a = anchors.withColumn("__apt", anchorPt)
      .withColumn("__bucket",
        explode(array(expr(fdiv("__apt")), expr(s"${fdiv("__apt")} + 1"))))
    val p = probes.withColumn("__ppt", probePt)
      .withColumn("__bucket", expr(fdiv("__ppt")))
    a.join(p, Seq("__bucket"))
      .filter(col("__ppt") >= col("__apt") && col("__ppt") < col("__apt") + width)
      .drop("__bucket", "__apt", "__ppt")
  }
}
