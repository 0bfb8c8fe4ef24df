package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when a handful
  * of hot keys would funnel a shuffle join into a few giant tasks (AQE's
  * skew-join split handles sort-merge joins at runtime; salting is the
  * portable form that also covers aggregations and older planners).
  *
  * Mechanics: the fact side gets a uniform random-free salt derived from a
  * row hash (deterministic — no rand(), so retries/replays see the same
  * salt); the dimension side is exploded `saltFactor`× so every
  * (key, salt) bucket finds its dimension row. Each hot key's rows spread
  * over `saltFactor` tasks. Result set identical to the plain join —
  * asserted in SkewJoinSpec.
  */
object SkewJoin {

  /** Inner equi-join `fact ⋈ dim` on `key`, salted `saltFactor` ways.
    * `fact` columns survive; `dim` columns are prefixed as given. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toSeq: _*)), lit(saltFactor)).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
