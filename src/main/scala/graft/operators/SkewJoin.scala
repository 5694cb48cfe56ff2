package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual escape hatch when AQE
  * skew splitting can't help (e.g. a single hot key inside one shuffle
  * block, or a build side too large to broadcast).
  *
  * Mechanics: the probe side sprays each row into one of `salts`
  * sub-keys with a DETERMINISTIC salt (hash of the whole row's join
  * context, not rand() — reruns and retries must route identically);
  * the build side replicates every row across all `salts` sub-keys.
  * The join key becomes (key, salt), so one hot key spreads over
  * `salts` reducers at the cost of `salts`x replication of the build
  * side — the classic skew/replication trade.
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with the LEFT side salted
    * (left = the large/skewed side, right = the replicated side).
    *
    * @param salts  fan-out per key; size so the hottest key's rows
    *               divided by `salts` fit one reducer
    * @param saltBy columns identifying a left row (for the
    *               deterministic salt); defaults to the key itself plus
    *               monotonically varying columns callers pass in
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      saltBy: Seq[String]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = left.withColumn("__salt",
      pmod(hash(saltBy.map(col): _*), lit(salts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop(replicated(key))
      .drop("__salt")
  }
}
