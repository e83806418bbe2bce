package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for heavy-hitter keys.
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting is the deterministic fallback when one side has a few keys
  * so hot that even split partitions overwhelm an executor (the
  * classic power-law user_id / null-key case at 100 TB).
  */
object Skew {

  /** Salted inner equi-join: the skewed (large) side gets a random
    * salt in [0, salts); the small side is replicated `salts` times.
    * Shuffle key becomes (key, salt) — hot keys spread over `salts`
    * reducers. Row multiplicity is unchanged: each skewed row matches
    * exactly the one replica with its salt.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val salted = skewed.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Frequency report of the heaviest keys — the diagnostic used to
    * decide between AQE and explicit salting.
    */
  def topKeys(df: DataFrame, key: String, n: Int = 20): DataFrame =
    df.groupBy(col(key)).count().orderBy(col("count").desc, col(key)).limit(n)
}
