package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when a handful
  * of hot keys would funnel a shuffle join into a few giant tasks (AQE's
  * skew-join split handles sort-merge joins at runtime; salting is the
  * portable form that also covers aggregations and older planners).
  *
  * Mechanics: the fact side gets a round-robin salt from its row position
  * (`monotonically_increasing_id mod saltFactor` — uniform even when the
  * hot key's rows are byte-identical, where a row-content hash would put
  * them all in one bucket); the dimension side is exploded `saltFactor`×
  * so every (key, salt) bucket finds its dimension row. Each hot key's
  * rows spread over `saltFactor` tasks. The salt VALUE never affects the
  * result set (every salt matches an exploded dim copy), so task retries
  * re-salting differently are harmless; result-set equality with the
  * plain join is asserted in SkewJoinSpec.
  */
object SkewJoin {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted `saltFactor` ways.
    * `fact` columns survive; `dim` columns are prefixed as given. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt factor derived from the fact side's MEASURED hot-key share
    * instead of a guessed constant: the largest key's row fraction times
    * the session's parallelism — just enough buckets that the hot key's
    * per-task work matches a uniform partition's — clamped to
    * [1, maxFactor]. A uniform fact collapses to 1 (the salted join
    * becomes the plain join: no dim explosion, no wasted shuffle width);
    * a 100%-hot fact asks for full parallelism.
    *
    * Cost: one map-side-combined pre-aggregation over the fact's key
    * column — the exchange carries per-partition distinct-key partials,
    * never fact rows, so at 100 TB this is a cheap extra stage next to the
    * join it tunes (the same statistic AQE's skew detector reads from
    * shuffle files, available here BEFORE the first shuffle is planned). */
  def adaptiveSaltFactor(fact: DataFrame, key: String,
                         maxFactor: Int = 64): Int = {
    val r = fact.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .agg(max(col("__c")), sum(col("__c"))).head()
    if (r.isNullAt(1) || r.getLong(1) == 0L) 1
    else {
      val share = r.getLong(0).toDouble / r.getLong(1)
      val want = math.ceil(share * fact.sparkSession.sparkContext.defaultParallelism).toInt
      math.min(math.max(want, 1), maxFactor)
    }
  }

  /** [[saltedJoin]] with the salt factor self-tuned from the fact's
    * measured hot-key share ([[adaptiveSaltFactor]]). */
  def saltedJoinAdaptive(fact: DataFrame, dim: DataFrame, key: String,
                         maxFactor: Int = 64): DataFrame =
    saltedJoin(fact, dim, key, adaptiveSaltFactor(fact, key, maxFactor))
}
