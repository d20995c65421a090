package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

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
}
