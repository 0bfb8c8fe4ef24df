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
}
