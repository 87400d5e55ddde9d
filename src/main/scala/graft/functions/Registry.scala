package graft.functions

import graft.functions.expressions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/**
 * SQL registration for the engine's custom expressions, so the raw-SQL
 * entry point (S7, `cmd.tsdb.query` → `spark.sql`) reaches them too:
 *
 *   SELECT vec_dot(a, b), vec_l2norm(a),
 *          minhash_sig(shingles, 64), word_shingles(tokens, 3),
 *          simhash64(tokens) ...
 */
object Registry {

  private def intArg(exprs: Seq[Expression], i: Int, fn: String, usage: String): Int =
    exprs.lift(i) match {
      case Some(Literal(v: Int, _)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"$fn expects a literal int argument, got $other — usage: $usage")
      case None => throw new IllegalArgumentException(
        s"$fn: missing argument ${i + 1} — usage: $usage")
    }

  /** Name → expression builder for every engine function exposed to SQL.
   *  Consumed by both the temp-function path (`registerAll`) and the
   *  `SparkSessionExtensions` injection path (`graft.GraftExtensions`). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "vec_l2norm" -> (exprs => L2Norm(exprs(0))),
    "minhash_sig" -> (exprs => MinHashSignature(exprs(0),
      intArg(exprs, 1, "minhash_sig", "minhash_sig(shingles, k)"))),
    "word_shingles" -> (exprs => WordShingles(exprs(0),
      intArg(exprs, 1, "word_shingles", "word_shingles(tokens, n[, distinct])"),
      distinct = exprs.length > 2 &&
        intArg(exprs, 2, "word_shingles", "word_shingles(tokens, n[, distinct])") != 0)),
    "simhash64" -> (exprs => SimHash64(exprs(0), portable = false)),
    "simhash_portable" -> (exprs => SimHash64(exprs(0), portable = true)),
    "lsh_signature" -> (exprs => LshSignature(exprs(0),
      intArg(exprs, 1, "lsh_signature", "lsh_signature(vector, nPlanes)"))),
    "repetition_stats" -> (exprs => RepetitionStats(exprs(0))),
    "winnow" -> (exprs => Winnow(exprs(0),
      intArg(exprs, 1, "winnow", "winnow(kgrams, w)"), portable = false)),
    "token_stats" -> (exprs => TokenStats(exprs(0),
      TextFunctions.stopwords.values.flatten.toSeq.distinct)),
    "nfc_normalize" -> (exprs => NfcNormalize(exprs(0))),
    "random_projection_q6" -> (exprs => RandomProjectionQ6(exprs(0),
      intArg(exprs, 1, "random_projection_q6", "random_projection_q6(vector, k)"))),
    "vec_sum_q6" -> (exprs =>
      VectorSumQ6(exprs(0)).toAggregateExpression()))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
