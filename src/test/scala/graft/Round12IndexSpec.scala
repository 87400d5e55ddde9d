package graft

import graft.functions.Similarity
import graft.store.IdFilter
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Round-12 contracts: (1) the erase/audit id sets scale past the
 * literal IN-list bound — above [[IdFilter.InListMax]] membership is a
 * broadcast semi/anti hash join (plan guard), with results identical
 * to the literal path, and a ≥100k-id mass purge through
 * [[Similarity.eraseFromIvfIndex]] leaves exactly the complement;
 * (2) the small-set path is unchanged (still a literal predicate, no
 * join operator in the plan).
 */
class Round12IndexSpec extends SparkSpec {

  private def tmpDir(): String = java.nio.file.Files
    .createTempDirectory("graft_r12").toFile.getAbsolutePath

  private def idsFrame(n: Long): DataFrame =
    spark.range(n).select(col("id"), (col("id") % 7).as("v"))

  private val bigIds: Seq[Long] = (0L until 120000L).map(_ * 2 + 1)
  private val smallIds: Seq[Long] = Seq(1L, 3L, 5L)

  test("IdFilter: large sets go through a broadcast join (plan guard)") {
    val df = idsFrame(100)
    val semi = IdFilter.keepIn(df, "id", bigIds)
      .queryExecution.executedPlan.toString
    assert(semi.contains("BroadcastHashJoin") && semi.contains("LeftSemi"),
      s"keepIn(large) must plan a broadcast semi join:\n$semi")
    val anti = IdFilter.dropIn(df, "id", bigIds)
      .queryExecution.executedPlan.toString
    assert(anti.contains("BroadcastHashJoin") && anti.contains("LeftAnti"),
      s"dropIn(large) must plan a broadcast anti join:\n$anti")
    val mark = IdFilter.markIn(df, "id", bigIds, "_hit")
      .queryExecution.executedPlan.toString
    assert(mark.contains("BroadcastHashJoin"),
      s"markIn(large) must plan a broadcast join:\n$mark")
  }

  test("IdFilter: small sets stay a literal predicate (no join)") {
    Seq(
      IdFilter.keepIn(idsFrame(100), "id", smallIds),
      IdFilter.dropIn(idsFrame(100), "id", smallIds),
      IdFilter.markIn(idsFrame(100), "id", smallIds, "_hit")
    ).foreach { q =>
      val p = q.queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"small-set path must not plan a join:\n$p")
    }
  }

  test("IdFilter: join path ≡ literal path, row for row") {
    val df = idsFrame(50000)
    def rows(q: DataFrame): Set[(Long, Long)] =
      q.select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantIn = rows(df.filter(col("id").isin(bigIds: _*)))
    val wantOut = rows(df.filter(!col("id").isin(bigIds: _*)))
    assert(rows(IdFilter.keepIn(df, "id", bigIds)) == wantIn)
    assert(rows(IdFilter.dropIn(df, "id", bigIds)) == wantOut)
    val marked = IdFilter.markIn(df, "id", bigIds, "_hit")
    assert(rows(marked.filter(col("_hit"))) == wantIn)
    assert(rows(marked.filter(!col("_hit"))) == wantOut)
    // markIn never duplicates rows (left join against a DISTINCT set)
    assert(marked.count() == 50000L)
  }

  test("IdFilter: inListColumn refuses sets past the bound") {
    intercept[IllegalArgumentException] {
      IdFilter.inListColumn("id", bigIds)
    }
    // and stays a plain predicate below it
    assert(idsFrame(10).filter(IdFilter.inListColumn("id", smallIds))
      .count() == 3L)
  }

  test("mass purge: 120k-id erase leaves exactly the complement") {
    val root = tmpDir()
    val emb = spark.range(500).select(col("id").as("vec_id"),
      array(
        (lit(1.0f) + col("id").cast("float") / 1000f),
        (col("id") % 3).cast("float"),
        lit(0.02f), lit(0.03f)).as("embedding"))
    Similarity.buildIvfIndex(emb, s"$root/idx", nLists = 4, trainIters = 1)
    val erased = Similarity.eraseFromIvfIndex(spark, s"$root/idx", bigIds)
    assert(erased == 250L, s"expected the 250 present odd ids, got $erased")
    val survivors = emb.filter(col("vec_id") % 2 === 0)
    val queries = survivors.filter(col("vec_id") < 10)
    val want = Similarity.bruteForceTopK(survivors, queries, k = 5)
    val got = Similarity.queryIvfIndex(spark, s"$root/idx", queries, k = 5,
      nProbes = 4)
    val diff = want.select("query_id", "vec_id", "score")
      .unionAll(got.select("query_id", "vec_id", "score"))
      .groupBy("query_id", "vec_id", "score").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    assert(diff == 0L, "full probe over the purged index must equal " +
      "brute force over the complement")
    // physically purged, verified through the (join-path) audit too
    val (_, scanned, found) = graft.store.EraseAudit.scan(spark,
      s"$root/idx", "vec_id", bigIds, skipDirs = Set("centroids"))
    assert(found == 0L, s"$found erased rows physically present")
    assert(scanned == 250L, s"audit scanned $scanned rows, want 250 survivors")
  }

  test("idempotent re-run: mass purge converges (second pass erases 0)") {
    val root = tmpDir()
    val emb = spark.range(100).select(col("id").as("vec_id"),
      array((lit(1.0f) + col("id").cast("float") / 100f), lit(0.5f),
        lit(0.02f), lit(0.03f)).as("embedding"))
    Similarity.buildIvfIndex(emb, s"$root/idx", nLists = 2, trainIters = 1)
    assert(Similarity.eraseFromIvfIndex(spark, s"$root/idx", bigIds) == 50L)
    assert(Similarity.eraseFromIvfIndex(spark, s"$root/idx", bigIds) == 0L)
  }

  private def fsOf(p: String) =
    new HPath(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("SnapshotFold.plan sweeps crashed-fold orphans below the minFiles gate") {
    val root = tmpDir()
    val dir = new HPath(s"$root/t")
    val fs = fsOf(root)
    spark.range(3).write.parquet(dir.toString)
    // a fold that crashed pre-commit: version dir, no marker
    val orphan = new HPath(dir, "_v=7")
    fs.mkdirs(orphan)
    spark.range(1).write.mode("overwrite").parquet(s"$orphan/part")
    // minFiles too high to qualify — the orphan must be swept anyway
    val planned = graft.store.SnapshotFold.plan(fs, dir,
      targetFileBytes = 1L << 30, minFiles = 100)
    assert(planned.isEmpty)
    assert(!fs.exists(orphan),
      "plan() must reclaim crashed-fold version dirs even when no fold qualifies")
  }
}
