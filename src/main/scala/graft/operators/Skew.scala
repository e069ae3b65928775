package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE cannot fix.
  *
  * AQE's skew-join split (enabled in Engine.prepare) handles skewed
  * SHUFFLE partitions, but a single hot KEY joined against a
  * non-broadcastable right side still serializes on one task's probe
  * side. Classic salting fixes that: replicate the right side
  * `saltFactor` ways, scatter the left side uniformly across the
  * replicas, join on (key, salt). Deterministic salt (hash of stable
  * columns, not rand()) keeps re-runs reproducible — same policy as the
  * dedup hashes (ARCHITECTURE.md principle 5).
  */
object Skew {

  /** Inner equi-join `left.key = right.key` with the LEFT side's hot
    * keys scattered over `saltFactor` replicas of the right side.
    * `leftScatter` must be stable non-key columns of the left row (used
    * to derive its deterministic salt).
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, leftScatter: Seq[String]): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(leftScatter.map(col): _*), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
