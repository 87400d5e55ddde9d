package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale a driver-generated fixture directory by an integer factor
 * (default 10×: sf0.1 → "sf1") for scaling-curve benchmarks. The
 * driver's generator is not available in this environment, so sf1 is
 * synthesized by deterministic replication with per-replica key shifts —
 * chosen so each query's WORK scales linearly with the factor, the way
 * a genuinely larger corpus would:
 *
 *  - fact tables (events, orders, lineitem, customer, documents,
 *    embeddings) replicate with entity keys shifted per replica —
 *    10× rows, 10× groups/series, per-group density unchanged;
 *  - dimensions (region, nation, supplier, part) copy once, like real
 *    dimensions;
 *  - `documents` text gets per-replica VARIED filler (~half the token
 *    count) so cross-replica Jaccard lands ≈ 0.5, well under near-dup
 *    thresholds — otherwise every doc would gain 9 near-duplicate
 *    clones and pair queries would measure a 45× pair blowup instead
 *    of a 10× corpus;
 *  - `embeddings` rotate dimensions by a per-replica offset: within a
 *    replica all pairwise cosines are preserved (the workload's
 *    structure), across replicas vectors decorrelate — again keeping
 *    true-pair cardinality linear in the factor.
 *
 * Usage: runMain graft.FixtureScale <srcDir> <dstDir> [factor]
 */
object FixtureScale {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("tmp-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.builder(shufflePartitions = 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Tolerate either events-ts layout: legacy fixtures carried parquet
    // TIMESTAMP(NANOS) (readable only as int64 via nanosAsLong, copied
    // through unchanged), regenerated fixtures carry timestamp[us].
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    def replicate(t: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write(t, (0 until factor).map(r => shift(base, r)).reduce(_ unionAll _))
    }

    // dimensions: single copy
    Seq("region", "nation", "supplier", "part").foreach(t => write(t, read(t)))

    val custShift = 1000000L
    val orderShift = 10000000L
    val eventShift = 10000000L
    val userShift = 100000L
    val docShift = 1000000L
    val vecShift = 1000000L

    replicate("customer") { (df, r) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(r * custShift))
    }
    replicate("orders") { (df, r) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(r * orderShift))
        .withColumn("o_custkey", col("o_custkey") + lit(r * custShift))
    }
    replicate("lineitem") { (df, r) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(r * orderShift))
    }
    replicate("events") { (df, r) =>
      df.withColumn("event_id", col("event_id") + lit(r * eventShift))
        .withColumn("user_id", col("user_id") + lit(r * userShift))
    }
    replicate("documents") { (df, r) =>
      val out =
        if (r == 0) df
        else {
          // ~tokenCount/2 DISTINCT filler tokens per doc, unique per
          // replica: shingle overlap with the source doc ≈ n/(n + n) = 0.5
          val nFill = greatest(lit(1),
            (size(split(col("text"), "\\s+")) / 2).cast("int"))
          val filler = array_join(
            transform(sequence(lit(1), nFill),
              k => concat(lit(s"zf${r}x"), k)), " ")
          df.withColumn("text", concat(col("text"), lit(" "), filler))
        }
      out.withColumn("doc_id", col("doc_id") + lit(r * docShift))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    replicate("embeddings") { (df, r) =>
      val rotated =
        if (r == 0) col("embedding")
        else {
          val d = size(col("embedding"))
          transform(sequence(lit(0), d - 1),
            i => element_at(col("embedding"), pmod(i + lit(r * 7), d) + 1))
        }
      df.withColumn("vec_id", col("vec_id") + lit(r * vecShift))
        .withColumn("embedding", rotated)
    }
    println(s"scaled $src -> $dst x$factor")
    spark.stop()
  }
}
