package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C4-style rule filtering (Raffel et al. 2020 §2.2) — the line- and
 * document-level heuristics that turned Common Crawl into C4, still the
 * baseline scrub in front of every learned quality filter:
 *
 *  - keep only lines that end in terminal punctuation and have at least
 *    `minWordsPerLine` words;
 *  - drop any document containing a curly brace (code) or the phrase
 *    "lorem ipsum" (placeholder boilerplate);
 *  - drop documents with fewer than `minLines` surviving lines.
 *
 * A pure per-row map stage — split, filter, rejoin; no shuffle, no UDF,
 * whole-stage codegen end to end. All predicates are RE2-compatible
 * regex/string ops so external engines replicate the kept set and the
 * reassembled text bit-for-bit.
 */
object RuleFilters {

  /** Lines of `text` passing the C4 line rules, original order. */
  def c4KeptLines(text: Column, minWordsPerLine: Int = 3): Column =
    filter(split(text, "\n"), l =>
      size(split(trim(l), "\\s+")) >= minWordsPerLine &&
        trim(l).rlike("[.!?\"']$"))

  /** Document-level ban: code braces or placeholder boilerplate. */
  def c4Banned(text: Column): Column =
    instr(text, "{") > 0 || instr(lower(text), "lorem ipsum") > 0

  /**
   * Blocklist filter — drop every document containing any listed token
   * (the C4 "bad words" pass). Two shapes for two list sizes:
   * `broadcastList = false` (default) compiles the list into ONE
   * `isin` predicate over the exploded token stream — a pure map +
   * aggregate, right for the usual hundreds-of-terms list;
   * `broadcastList = true` semi-joins tokens against a broadcast list
   * frame — right when the list is itself large (e.g. ten million URLs
   * or hashes). Both return the surviving documents unchanged.
   */
  def blocklistFilter(docs: DataFrame, terms: Seq[String],
      idCol: String = "doc_id", textCol: String = "text",
      broadcastList: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "empty blocklist")
    val lower = terms.map(_.toLowerCase).distinct
    if (!broadcastList) {
      docs.filter(!exists(TextFunctions.tokens(col(textCol)),
        t => t.isin(lower.map(lit): _*).cast("boolean")))
    } else {
      val spark = docs.sparkSession
      import spark.implicits._
      val list = broadcast(lower.toDF("_blocked"))
      val hit = docs.select(col(idCol).as("_hid"),
          explode(TextFunctions.tokens(col(textCol))).as("_blocked"))
        .join(list, Seq("_blocked"), "left_semi")
        .select(col("_hid")).distinct()
      docs.join(hit, docs(idCol) === hit("_hid"), "left_anti")
    }
  }

  /**
   * Apply the full C4 rule set: surviving documents with their cleaned
   * text (kept lines rejoined with '\n') and the kept-line count.
   */
  def c4Filter(docs: DataFrame, minWordsPerLine: Int = 3, minLines: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val kept = c4KeptLines(col(textCol), minWordsPerLine)
    docs
      .filter(!c4Banned(col(textCol)))
      .withColumn("_kept", kept)
      .filter(size(col("_kept")) >= minLines)
      .select(col(idCol), array_join(col("_kept"), "\n").as("clean_text"),
        size(col("_kept")).cast("long").as("n_lines"))
  }
}
