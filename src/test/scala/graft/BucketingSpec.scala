package graft

import graft.store.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def withAqeOff[A](body: => A): A = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  private def tmp(): String =
    graft.Fixtures.newDir("bucketing").toString

  test("bucketed round trip preserves data; both-bucketed join and groupBy plan zero shuffles") {
    val dir = tmp()
    val facts = (1 to 1000).map(i => (s"dev_${i % 37}", i.toLong, i * 1.5))
      .toDF("series_id", "t", "value")
    val dims = (0 until 37).map(i => (s"dev_$i", s"room_${i % 5}"))
      .toDF("series_id", "room")
    Bucketing.writeBucketed(facts, "b_facts", s"$dir/facts", 8,
      Seq("series_id"), sortCols = Seq("series_id", "t"))
    Bucketing.writeBucketed(dims, "b_dims", s"$dir/dims", 8, Seq("series_id"))
    try {
      val ft = Bucketing.table(spark, "b_facts")
      assert(ft.count() == 1000L)
      assert(ft.agg(sum("value")).as[Double].head() ==
        facts.agg(sum("value")).as[Double].head())

      withAqeOff {
        val joined = Bucketing.table(spark, "b_facts")
          .join(Bucketing.table(spark, "b_dims"), "series_id")
        assert(Bucketing.shuffleCount(joined) == 0,
          "both sides bucketed on the join key must not shuffle")
        assert(joined.count() == 1000L)

        val agg = Bucketing.table(spark, "b_facts")
          .groupBy("series_id").agg(avg("value"))
        assert(Bucketing.shuffleCount(agg) == 0,
          "groupBy on the bucket key must not shuffle")
        assert(agg.count() == 37L)

        // contrast: the same join against an UNBUCKETED side shuffles
        // only that side (one exchange, not two)
        val unbucketed = dims
        val half = Bucketing.table(spark, "b_facts")
          .join(unbucketed, "series_id")
        assert(Bucketing.shuffleCount(half) == 1)
      }
    } finally {
      Bucketing.drop(spark, "b_facts", purge = true)
      Bucketing.drop(spark, "b_dims", purge = true)
    }
  }

  test("pre-sorted buckets make the sort-merge join sort-free on the sorted key") {
    val dir = tmp()
    val a = (1 to 500).map(i => (s"k${i % 11}", i)).toDF("k", "va")
    val b = (1 to 300).map(i => (s"k${i % 11}", i * 2)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "b_sa", s"$dir/a", 4, Seq("k"), Seq("k"),
      oneFilePerBucket = true)
    Bucketing.writeBucketed(b, "b_sb", s"$dir/b", 4, Seq("k"), Seq("k"),
      oneFilePerBucket = true)
    try {
      withAqeOff {
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        val j = Bucketing.table(spark, "b_sa").join(Bucketing.table(spark, "b_sb"), "k")
        assert(Bucketing.shuffleCount(j) == 0)
        val sorts = j.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.SortExec => s
        }
        assert(sorts.isEmpty,
          s"sortBy'd buckets should satisfy the SMJ ordering, found: $sorts")
        // values correct: every a-row matches 300/11-ish b-rows per key
        assert(j.count() ==
          a.join(b, "k").count())
      }
    } finally {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      Bucketing.drop(spark, "b_sa", purge = true)
      Bucketing.drop(spark, "b_sb", purge = true)
    }
  }

  test("drop with purge removes files; register is re-runnable") {
    val dir = tmp()
    val df = Seq((1, "a"), (2, "b")).toDF("id", "s")
    Bucketing.writeBucketed(df, "b_tmp", s"$dir/t", 2, Seq("id"))
    assert(spark.catalog.tableExists("b_tmp"))
    Bucketing.drop(spark, "b_tmp", purge = true)
    assert(!spark.catalog.tableExists("b_tmp"))
    assert(!new java.io.File(s"$dir/t").exists())
    // idempotent
    Bucketing.drop(spark, "b_tmp", purge = true)
  }
}
