package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting via degree-oriented wedge enumeration (the
  * MapReduce form of Suri & Vassilvitskii, WWW 2011 — "Counting
  * triangles and the curse of the last reducer"). Input: an
  * undirected edge list `(u, v)` with u < v, no duplicates.
  *
  * The scale trap is the wedge join: joining edges on a shared vertex
  * enumerates Σ deg² wedges, which power-law hubs blow up
  * quadratically. Degree orientation is the standard fix — direct
  * every edge from its (degree, id)-smaller endpoint to the larger;
  * out-degree is then bounded by O(√m) (arboricity), the wedge
  * stream shrinks ~14× on the co-purchase graph (84 M → 6 M at
  * sf0.1), and each triangle is generated exactly once: the wedge
  * apex is the triangle's min-rank vertex and the wedge pair is
  * enumerated in rank order, so the closing edge is exactly the
  * oriented spelling — no duplicate direction to discard.
  *
  * The oriented list is lazily localCheckpoint'd (the wedge join
  * reads it three times); the degree join stays a shuffle join — deg
  * is O(nodes), NOT broadcastable at 100 TB.
  */
object Triangles {

  /** Undirected degree table `(node, dg)` of an edge list. */
  def degreesOf(edges: DataFrame): DataFrame =
    edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))

  /** Degree orientation `(s, t, dt)`: s → t with (deg, id)-rank of s
    * below t; `dt` carries t's degree so wedge enumeration can stay
    * in rank order without another degree join.
    */
  def orientByDegree(edges: DataFrame, deg: DataFrame): DataFrame = {
    val lower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    edges
      .join(deg.select(col("node").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("dg").as("dv")), "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"),
        when(lower, col("dv")).otherwise(col("du")).as("dt"))
      .localCheckpoint(eager = false)
  }

  /** One row per triangle `(x, y, z)` in orientation-rank order. */
  def enumerate(edges: DataFrame): DataFrame = {
    // the edge list feeds both the degree agg and the orientation
    // join — pin it once instead of recomputing its (possibly
    // expensive) lineage twice
    val e = edges.localCheckpoint(eager = false)
    val oe = orientByDegree(e, degreesOf(e))
    val wedgeOrder = col("e1.dt") < col("e2.dt") ||
      (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))
    oe.as("e1")
      .join(oe.as("e2"), col("e2.s") === col("e1.s") && wedgeOrder)
      .join(oe.as("e3"),
        col("e3.s") === col("e1.t") && col("e3.t") === col("e2.t"))
      .select(col("e1.s").as("x"), col("e1.t").as("y"),
        col("e2.t").as("z"))
  }

  /** Per-node triangle participation `(node, n_tri)` — nodes in no
    * triangle are absent (left-join [[degreesOf]] to keep them).
    */
  def perNode(edges: DataFrame): DataFrame =
    enumerate(edges)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
}
