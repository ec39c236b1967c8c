package graft.operators

import graft.functions.BloomMightContainExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-pruned semi/anti joins: the 100 TB decontamination pattern.
  *
  * An exact semi/anti join of a huge fact table against a modest key
  * set shuffles (or at best broadcast-hash-probes) EVERY fact row.
  * A Bloom filter of the dim keys — ~9.6 bits/key at 1% fpp, so
  * ~1.2 MB per million keys (raise fpp for very large dims; the
  * candidate branch stays exact) — rides inside the fact scan as a
  * plain codegen'd filter
  * ([[BloomMightContainExpr]]) and settles most rows map-side:
  *
  *  - semi join: "definitely not in dim" rows (the vast majority in a
  *    decontamination scan) are dropped before the shuffle; only the
  *    candidates (true matches + fpp stragglers) reach the exact join
  *    that removes false positives. One pass over the fact table.
  *  - anti join: "definitely not" rows ARE the answer and bypass the
  *    join entirely; only candidates go through the exact anti join.
  *    The fact side is read twice (once per branch) — two cheap scans
  *    traded for a fact-sized shuffle, the right trade whenever the
  *    join input would spill (and the scans share pushed filters /
  *    pruned columns; on a cached or mid-pipeline input they're free).
  *
  * Results are EXACT for any fpp: the filter only ever mis-routes a
  * row into the candidate branch, where the exact join corrects it.
  * Null keys never match an equi-join, so they are dropped by the
  * semi form and passed through by the anti form — same as the plain
  * joins.
  *
  * The reference's warehouse runs this class of EXISTS / NOT EXISTS
  * scan (dbt models + GE expectation sweeps); at corpus scale the same
  * shape is eval-set decontamination (docs NOT IN contaminated ids).
  */
object BloomJoin {

  /** Build a Bloom filter over `keys(keyCol)` distributed: one
    * `treeAggregate` pass, each partition folding its keys into a
    * local filter, merged pairwise on the way up. Explicit put/probe
    * symmetry (putLong/mightContainLong, putString/mightContainString)
    * rather than relying on any internal builder's hashing scheme.
    * Size the filter with `expectedItems` when the cardinality is
    * known; otherwise one extra count pass sizes it exactly.
    */
  def buildFilter(keys: DataFrame, keyCol: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): BloomFilter = {
    val dt = keys.schema(keyCol).dataType
    val col0 = keys.select(col(keyCol)).na.drop()
    val n = if (expectedItems > 0) expectedItems
      else math.max(col0.count(), 1L)
    col0.rdd.treeAggregate(BloomFilter.create(n, fpp))(
      seqOp = (f, row) => {
        dt match {
          case LongType    => f.putLong(row.getLong(0))
          case IntegerType => f.putLong(row.getInt(0).toLong)
          case ShortType   => f.putLong(row.getShort(0).toLong)
          case ByteType    => f.putLong(row.getByte(0).toLong)
          case StringType  => f.putString(row.getString(0))
          case other => throw new IllegalArgumentException(
            s"BloomJoin: unsupported key type ${other.sql}")
        }
        f
      },
      combOp = (a, b) => { a.mergeInPlace(b); a })
  }

  private def probe(big: DataFrame, bigKey: String,
      filter: BloomFilter): Column = {
    BloomMightContainExpr.register(big.sparkSession)
    BloomMightContainExpr.mightContain(filter, col(bigKey))
  }

  /** `big` rows whose `bigKey` appears in `dim(dimKey)` — exact left
    * semi join, Bloom-pruned map-side so only candidate rows reach the
    * join.
    */
  def semiJoinPruned(big: DataFrame, dim: DataFrame, bigKey: String,
      dimKey: String, fpp: Double = 0.01): DataFrame = {
    val dimKeys = dim.select(col(dimKey))
    val candidates = big.filter(probe(big, bigKey, buildFilter(dimKeys, dimKey, fpp)))
    candidates.join(dimKeys, candidates(bigKey) === dimKeys(dimKey),
      "left_semi")
  }

  /** `big` rows whose `bigKey` does NOT appear in `dim(dimKey)` —
    * exact left anti join; "definitely absent" rows (including null
    * keys, which never match an equi-join) bypass the join.
    */
  def antiJoinPruned(big: DataFrame, dim: DataFrame, bigKey: String,
      dimKey: String, fpp: Double = 0.01): DataFrame = {
    val dimKeys = dim.select(col(dimKey))
    val mc = probe(big, bigKey, buildFilter(dimKeys, dimKey, fpp))
    // null-key rows: mc is null, !mc is null — coalesce keeps them on
    // the definite-out branch, matching plain anti-join semantics
    val definiteOut = big.filter(coalesce(!mc, lit(true)))
    val candidates = big.filter(mc)
    definiteOut.unionByName(
      candidates.join(dimKeys, candidates(bigKey) === dimKeys(dimKey),
        "left_anti"))
  }
}
