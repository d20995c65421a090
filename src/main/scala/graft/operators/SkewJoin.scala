package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.plans.BandJoin

/** Skew-safe equi-join via key salting.
  *
  * When one join key dominates (a "hot key"), the shuffle sends its entire
  * partition to one task. AQE's skew-join split handles sort-merge cases
  * adaptively; salting is the explicit, planner-independent form — and the
  * only option when the skewed side feeds an aggregation that must stay
  * co-partitioned. Mechanics:
  *
  *  - fact side: add salt = deterministic hash of the whole row, mod n —
  *    hot-key rows spread over n sub-keys (no rand(): keeps the plan
  *    re-executable/deterministic, which Spark otherwise only guarantees
  *    per-stage-attempt for nondeterministic expressions);
  *  - dim side: explode each row n times, one per salt value;
  *  - join on (key, salt); drop the salt.
  *
  * Result is row-identical to the plain join (asserted in SkewJoinSpec).
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    require(buckets > 0)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(c => col(s"`$c`")): _*), lit(buckets))
        .cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Salting composed with the custom band join ([[BandJoin.bandJoin]]) —
    * the demonstration behind BandJoin's scaladoc claim that "skewed keys
    * get the same salting/AQE remedies as any SMJ".
    *
    * BandJoinExec requires `ClusteredDistribution(keys)` on both children,
    * so a hot key concentrates one whole co-partition on one task exactly
    * like an equi-SMJ — and the remedy is literally the same as
    * [[saltedJoin]]'s, because a band join IS an equi-join on the keys
    * with an order-local time predicate evaluated inside the key group:
    *
    *  - left (skewed/streamed) side: deterministic whole-row-hash salt,
    *    mod n — the hot key's rows spread over n sub-groups;
    *  - right (buffered) side: explode ×n, one replica per salt value —
    *    each (key, salt) cell sees the FULL right key-group, so the
    *    in-cell merge finds exactly the matches the unsalted merge finds;
    *  - band-join on (keys :+ salt) with the unchanged time band; drop
    *    the salt.
    *
    * Every (l, r) pair with equal keys meets in exactly one salt cell, so
    * the result is row-identical (inner, left-outer — each left row
    * carries ONE salt, so unmatched rows still null-extend exactly once —
    * and matchLatest: the full right group is present in the cell, so
    * "latest ≤ t" picks the same row). The price is the standard salting
    * price: the right side shuffles ×n. Asserted in SkewJoinSpec
    * (equivalence on all three modes + hot-key dispersion + the plan
    * still containing BandJoinExec). */
  def saltedBandJoin(left: DataFrame, right: DataFrame,
                     keys: Seq[(String, String)],
                     leftTime: String, rightTime: String,
                     lowerUs: Long, upperUs: Long,
                     leftOuter: Boolean = false,
                     matchLatest: Boolean = false,
                     buckets: Int = 8): DataFrame = {
    require(buckets > 0)
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "input already carries a __salt column")
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(c => col(s"`$c`")): _*), lit(buckets))
        .cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    BandJoin.bandJoin(saltedLeft, saltedRight,
        keys :+ ("__salt" -> "__salt"), leftTime, rightTime,
        lowerUs, upperUs, leftOuter, matchLatest)
      .drop("__salt")
  }
}
