package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Training-data export: sharded JSONL, the lingua franca between a
 * curation pipeline and a training data loader. Documents are assigned
 * to shards by a PORTABLE content-independent hash of their key (same
 * md5 slice as [[Sampling.portableUniform]]) so the shard layout is
 * reproducible across runs, engines, and cluster sizes — host `h` of a
 * multi-host loader reads shards ≡ h mod hosts and always sees the same
 * documents. Lines within a file are sorted by key: re-running the
 * export produces byte-identical shards, which makes corpus diffs and
 * cache keys meaningful.
 *
 * Scale shape: one map stage (shard + JSON encode; the only shuffle is
 * the repartition that co-locates each shard's rows), `partitionBy`
 * writes `shard=N/` directories that downstream Spark/DuckDB/loader
 * code can partition-prune. Shard count bounds per-file size: size it
 * at corpus_bytes / target_file_bytes (e.g. 100 TB / 1 GB = 100k
 * shards — a number HDFS/S3 listings handle comfortably).
 */
object Export {

  /** Deterministic shard id in [0, nShards): first 32 bits of
   *  md5(key), mod shards — reproducible in any engine. */
  def shardCol(key: Column, nShards: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong))

  /**
   * Write `df` as `path/shard=N/part-*.txt` JSONL. All columns except
   * the synthesized `shard` are JSON-encoded per row; within a shard,
   * lines are sorted by `keyCol`. Returns the manifest (shard, n_docs,
   * n_bytes including newlines) computed from the same plan — one extra
   * aggregation, no post-hoc listing.
   */
  def writeJsonlShards(df: DataFrame, path: String, keyCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val framed = df
      .withColumn("shard", shardCol(col(keyCol), nShards))
      .withColumn("value", to_json(struct(df.columns.map(col).toIndexedSeq: _*)))
      .select(col("shard"), col("value"), col(keyCol).cast("string").as("_k"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("_k"))
      .persist()
    framed.select("shard", "value")
      .write.partitionBy("shard").mode("overwrite").text(path)
    val manifest = framed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("value")) + 1).as("n_bytes"))
      .orderBy(col("shard"))
      .collect()
    framed.unpersist()
    val spark = df.sparkSession
    import spark.implicits._
    manifest.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.toDF("shard", "n_docs", "n_bytes")
  }

  /** Read a JSONL shard tree back into rows of `schema` (+ the `shard`
   *  partition column as long). Partition pruning applies: filtering on
   *  `shard` reads only those directories. */
  def readJsonlShards(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val raw = spark.read.text(path) // carries the shard partition column
    raw.select(from_json(col("value"), schema).as("_j"), col("shard"))
      .select(col("_j.*"), col("shard").cast("long").as("shard"))
  }
}
