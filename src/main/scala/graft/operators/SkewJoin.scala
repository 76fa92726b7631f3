package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (reference: the batch planner's skewed
  * data handling and the classic Flink/Beam salting recipe; SURVEY.md
  * §2.12 partitioning row): when one join key carries a disproportionate
  * share of the big side's rows, a plain shuffle join sends that key's
  * entire volume to ONE reducer. Salting splits each key into
  * `saltBuckets` sub-keys — the big side deterministically (hash of a
  * row-identity column, so replays/retries route identically), the
  * small side by replicating each row once per bucket — restoring
  * parallelism at the cost of a `saltBuckets`× blowup of the SMALL side
  * only.
  *
  * This is the manual form of what AQE's skew-join optimization does at
  * runtime for sort-merge joins; it remains necessary when the skew is
  * known a priori, the join is hash-partitioned by a downstream
  * requirement, or the engine's skew threshold misses (many
  * medium-skewed keys). Result set is IDENTICAL to the plain inner
  * join — the oracle checks exactly that.
  */
object SkewJoin {

  /** Inner-join `big` with `small` on `key`, salted `saltBuckets` ways.
    * `bigIdCol` is any big-side column giving deterministic per-row
    * routing (a line number, an event id).
    */
  def saltedInner(big: DataFrame, small: DataFrame, key: String,
      bigIdCol: String, saltBuckets: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(col(bigIdCol)), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    // hint the shuffled merge join: broadcasting the replicated side
    // would silently defeat the demonstration (and at real scale the
    // small side is only RELATIVELY small)
    salted.hint("merge")
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
