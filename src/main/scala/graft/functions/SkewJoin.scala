package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't enough (e.g. one key holding >50% of a 100 TB fact
  * table, or skew in an aggregation-input join).
  *
  * The big (skewed) side gets a deterministic salt derived from a
  * high-cardinality disambiguator column; the small side is replicated
  * across all salts. The join key becomes (key, salt) so one hot key
  * spreads over `salts` reducers. Deterministic (hash salt, not rand()) so
  * results are replayable.
  */
object SkewJoin {

  /** @param big           skewed side (rows keep their single salted copy)
    * @param small         replicated side (`salts`× blowup — keep it small)
    * @param key           equi-join key column name (both sides)
    * @param disambiguator big-side column whose hash spreads the hot key
    * @param salts         number of splits per key */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      disambiguator: String, salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(disambiguator)), lit(salts)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
