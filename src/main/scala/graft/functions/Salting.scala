package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Key-salting for skewed shuffles — the manual escape hatch when AQE's
 * skew-join splitting isn't available (e.g. aggregations keyed by a hot
 * series, the reference's high-frequency meters: one chatty device can
 * dominate a series_id partition at 100 TB).
 *
 * Pattern: explode the hot side's key into `salt` sub-keys
 * deterministically (hash-based, not random — reproducible plans), run
 * the aggregation per sub-key (partial), then merge partials per real key.
 */
object Salting {

  /** Deterministic salt in [0, salt) derived from stable row content. */
  def saltCol(salt: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(salt.toLong)).cast("int")

  /**
   * Two-phase salted aggregation: sum-like aggregates per (key, salt)
   * first (spreads a hot key over `salt` reducers), then the final
   * combine per key. `partials` maps output-column name → (partial
   * aggregate over the value, final merge over the partial).
   */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salt: Int,
      partials: Map[String, (Column => Column, Column => Column)],
      saltSource: Seq[String]): DataFrame = {
    val salted = df.withColumn("_salt", saltCol(salt, saltSource.map(col): _*))
    val phase1 = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(partials.head._2._1(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (c, (p, _)) => p(col(c)).as(c) }.toSeq: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(partials.head._2._2(col(partials.head._1)).as(partials.head._1),
        partials.tail.map { case (c, (_, f)) => f(col(c)).as(c) }.toSeq: _*)
  }

  /**
   * Salted broadcast-free join of a big skewed fact side against a
   * smaller (but not broadcastable) dim side: fact rows get a
   * deterministic salt, the dim side is replicated `salt` times, and the
   * join key becomes (key, salt) — a hot key's rows spread over `salt`
   * partitions instead of one.
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      saltCol(salt, fact.columns.map(col).toSeq: _*))
    val replicatedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    saltedFact.join(replicatedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
