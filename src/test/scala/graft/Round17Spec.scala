package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Round-17 optimization pins:
 *  - the literal-centroid argmax and the large-k [[graft.functions
 *    .expressions.CentroidTopK]] matrix path are BIT-IDENTICAL — same
 *    assignments, same scores (portable rounding included), same
 *    tie-breaks (duplicate centroids, zero norms, zero vectors);
 *  - streamingIvfAppend refuses a degenerate index whose centroids
 *    parquet exists but holds zero rows (ADVICE-r16: a length-only FS
 *    check would accept it and silently drop every streamed vector).
 */
class Round17Spec extends SparkSpec {

  private def vecRows(n: Int, dims: Int, seed: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val v =
        if (i == 3) Array.fill(dims)(0.0f) // zero vector: the norm guard
        else Array.tabulate(dims)(j =>
          (((i * 31 + j * 17 + seed * 11) % 97) / 97.0f) - 0.5f)
      (i.toLong, v)
    }

  private def vecs(n: Int, dims: Int, seed: Int): DataFrame = {
    val rows = vecRows(n, dims, seed).map { case (id, v) => Row(id, v) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = false),
          nullable = false))))
  }

  private def mk(dims: Int, seed: Int): Array[Float] =
    Array.tabulate(dims)(j => (((seed * 13 + j * 7) % 89) / 89.0f) - 0.5f)

  /** centroids with a deliberate tie (id 4 duplicates id 1's vector)
   *  and a zero centroid (id 3) — the knife edges of the argmax. */
  private def tieCents(dims: Int): DataFrame = {
    def mk(seed: Int) = this.mk(dims, seed)
    val rows = Seq(
      Row(0L, mk(1)), Row(1L, mk(2)), Row(2L, mk(3)),
      Row(3L, Array.fill(dims)(0.0f)),
      Row(4L, mk(2)), // identical to id 1 — smaller id must win the tie
      Row(5L, mk(4)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("group", LongType, nullable = false),
        StructField("centroid", ArrayType(FloatType, containsNull = false),
          nullable = false))))
  }

  private def withMaxK[T](k: Int)(body: => T): T = {
    val old = sys.props.get("graft.argmax.literal.maxk")
    sys.props("graft.argmax.literal.maxk") = k.toString
    try body finally old match {
      case Some(v) => sys.props("graft.argmax.literal.maxk") = v
      case None => sys.props -= "graft.argmax.literal.maxk": Unit
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  test("assignToCentroids: CentroidTopK path ≡ literal path " +
    "(portable rounding, duplicate-centroid ties, zero norms)") {
    // 40 generic vectors plus one EXACTLY equal to the duplicated
    // centroid vector — its cosine against ids 1 and 4 is identical by
    // construction, forcing the tie-break on both paths
    val tieRow = Seq(Row(99L, mk(8, 2)))
    val v = vecs(40, 8, 0).unionAll(spark.createDataFrame(
      spark.sparkContext.parallelize(tieRow, 1), vecs(1, 8, 0).schema))
    val c = tieCents(8)
    def run() = sortedRows(graft.functions.Similarity.assignToCentroids(
      v, c, centIdCol = "group", centVecCol = "centroid"))
    val literal = withMaxK(1000)(run())
    val exprPath = withMaxK(0)(run())
    assert(literal == exprPath)
    // the tie: no assignment may land on id 4 — id 1 holds the SAME
    // vector and must win every tie on both paths; vec 99 IS that
    // vector, so the tie is provably exercised
    assert(exprPath.forall(_.split(",")(1) != "4"))
    assert(exprPath.exists(r => r.startsWith("[99,") &&
      r.split(",")(1) == "1"))
  }

  test("ivfTopKTrained: CentroidTopK path ≡ literal path " +
    "(trainCentroids + probe routing + assignment end to end)") {
    val corpus = vecs(60, 8, 2)
    val queries = vecs(5, 8, 7)
    def run() = sortedRows(graft.functions.Similarity.ivfTopKTrained(
      corpus, queries, k = 3, nLists = 5, nProbes = 2, trainIters = 2))
    val literal = withMaxK(1000)(run())
    val exprPath = withMaxK(0)(run())
    assert(literal.nonEmpty && literal == exprPath)
  }

  test("streamingIvfAppend refuses an index whose centroids parquet " +
    "holds zero rows") {
    val work = graft.Fixtures.newDir("graft_r17guard").toFile.getAbsolutePath
    val empty = vecs(10, 4, 0).filter(col("vec_id") < 0)
    graft.functions.Similarity.buildIvfIndex(empty, s"$work/idx",
      nLists = 4, trainIters = 1)
    val incoming = vecs(5, 4, 1)
    incoming.write.parquet(s"$work/in")
    val e = intercept[IllegalArgumentException] {
      graft.functions.Similarity.streamingIvfAppend(
        spark.readStream.schema(incoming.schema).parquet(s"$work/in"),
        s"$work/idx", s"$work/ckpt")
    }
    assert(e.getMessage.contains("no IVF index"))
  }
}
