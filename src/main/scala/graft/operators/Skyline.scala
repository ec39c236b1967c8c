package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated by any other
  * row, where `q` dominates `p` iff `q.d1 >= p.d1 && q.d2 >= p.d2`
  * and at least one inequality is strict (both dimensions
  * maximizing). Identical points never dominate each other, so exact
  * duplicates of a frontier point are all kept.
  *
  * The naive formulation is a quadratic self-anti-join. This operator
  * uses the classic sort-scan decomposition instead:
  *
  *  1. `groupBy(d1).max(d2)` — one LINEAR hash aggregate (map-side
  *     partial) collapsing the data to its distinct `d1` values;
  *     only the per-`d1` maximum of `d2` can ever be on the frontier.
  *  2. A running max of `d2` over the aggregate, ordered by `d1`
  *     descending — a `d1` value is on the frontier iff its max-`d2`
  *     strictly exceeds every max-`d2` at strictly larger `d1`
  *     (rows-frame ending at -1; the groupBy made `d1` distinct, so
  *     the rows frame IS the strictly-greater value frame).
  *  3. A broadcast semi-join back: keep rows whose `(d1, d2)` equals
  *     a surviving `(d1, max-d2)` pair.
  *
  * Scale: steps 1 and 3 are linear; step 2's unpartitioned window
  * runs over `|distinct d1|` aggregated rows, not the data. When
  * `d1` is high-cardinality enough that even the aggregate is big,
  * pre-bucket `d1` (e.g. `floor(d1 / w)`) and skyline the per-bucket
  * maxima first — skylines compose (the frontier of a union is the
  * frontier of the per-part frontiers), so the coarse pass prunes
  * all but a sliver before this exact pass. The frontier itself is
  * the broadcast side of step 3 (frontiers are small by nature: one
  * row per distinct surviving `d1`).
  *
  * Rows with NULL in either dimension are dropped up front: NULL
  * cannot be compared, so dominance is undefined for it (a SQL
  * `NOT EXISTS` oracle would keep every NULL row vacuously — an
  * artifact, not a semantics; this operator makes the choice
  * explicit).
  */
object Skyline {

  /** Pareto-frontier rows of `df` maximizing both `d1` and `d2`. */
  def pareto2dMax(df: DataFrame, d1: String, d2: String): DataFrame = {
    Seq("__mx", "__hmx", "__fd1").foreach { r =>
      require(!df.columns.contains(r),
        s"Skyline.pareto2dMax reserves column name $r")
    }
    val perD1 = df.na.drop(Seq(d1, d2))
      .groupBy(col(d1)).agg(max(col(d2)).as("__mx"))
    val strictlyHigher = Window.orderBy(col(d1).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // renamed so the join-back cannot trip self-join attribute
    // ambiguity (frontier descends from df)
    val frontier = perD1
      .withColumn("__hmx", max(col("__mx")).over(strictlyHigher))
      .filter(col("__hmx").isNull || col("__mx") > col("__hmx"))
      .select(col(d1).as("__fd1"), col("__mx"))
    df.join(broadcast(frontier),
        col(d1) === col("__fd1") && col(d2) === col("__mx"), "left_semi")
  }
}
