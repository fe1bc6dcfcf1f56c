package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives.
  *
  * AQE's skew-join handles most runtime skew; these are the explicit
  * forms for when the skew is known up front (a handful of hot keys
  * owning most of the data — the classic power-law entity).
  *
  *   - [[saltedAggregate]]: two-phase aggregation — partial aggregate
  *     on (key, salt), then merge on key. The hot key's rows spread
  *     over `salts` reducers in phase 1; phase 2 merges `salts` tiny
  *     partials. Works for any algebraic aggregate (sum/count/min/max).
  *   - [[saltedBroadcastJoin]]: replicate the SMALL side per salt and
  *     join on (key, salt) — an equi-join that distributes a hot key's
  *     probe rows across the cluster instead of one reducer.
  */
object Skew {

  /** One two-phase aggregate: `phase1` runs over the salted groups,
    * `phase2` merges the named partials (e.g. count → sum of counts). */
  final case class TwoPhaseAgg(
      name: String, phase1: Column, phase2: Column => Column)

  val count2p: TwoPhaseAgg = TwoPhaseAgg("cnt", count(lit(1)), sum)
  def sum2p(c: String): TwoPhaseAgg = TwoPhaseAgg(s"sum_$c", sum(col(c)), sum)
  def max2p(c: String): TwoPhaseAgg = TwoPhaseAgg(s"max_$c", max(col(c)), max)

  /** Two-phase aggregation over a skewed key: partial aggregate on
    * (key, salt), then merge on key. Algebraic aggregates only. */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      keyName: String,
      salts: Int,
      aggs: Seq[TwoPhaseAgg]): DataFrame = {
    val salted = df.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    val phase1 = salted
      .groupBy(key.as(keyName), col("_salt"))
      .agg(aggs.head.phase1.as(s"_p_${aggs.head.name}"),
        aggs.tail.map(a => a.phase1.as(s"_p_${a.name}")): _*)
    phase1
      .groupBy(col(keyName))
      .agg(aggs.head.phase2(col(s"_p_${aggs.head.name}")).as(aggs.head.name),
        aggs.tail.map(a => a.phase2(col(s"_p_${a.name}")).as(a.name)): _*)
  }

  /** Join a skewed LARGE side to a small dimension: the dimension is
    * replicated once per salt (broadcast anyway), the large side gets a
    * random salt — the hot key fans out over `salts` tasks. */
  def saltedBroadcastJoin(
      large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(broadcast(replicated), Seq(key, "_salt")).drop("_salt")
  }
}
