package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.GraftPlanApi
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normalizeText
import graft.plans.{AcMatchStats, AhoCorasick}

/** Dictionary blocklist gate over a document corpus — the C4-style
  * "contains a badword" filter, the PII-term screen, the compliance
  * blocklist — executed as ONE Aho–Corasick pass per document
  * ([[graft.plans.AhoCorasick]]) instead of O(terms) substring scans.
  *
  * Scale shape: map-only. The dictionary compiles once on the driver,
  * ships once per task as an expression reference object, and scoring
  * 100 TB is a single codegen'd projection over the scan — no shuffle,
  * no join, no per-term pass. Matching is over [[normalizeText]]-ed
  * text (lowercase, whitespace collapsed), so multi-word phrases match
  * across the source's line breaks and casing.
  */
object Blocklist {

  /** struct(n_hits, n_terms) of `text` against `terms` (normalized).
    * n_hits counts every occurrence including overlapping and nested
    * matches; n_terms counts distinct dictionary entries present.
    */
  def matchStats(text: Column, terms: Seq[String]): Column = {
    val ac = AhoCorasick.compile(terms.map(_.toLowerCase.trim))
    GraftPlanApi.column(
      AcMatchStats(GraftPlanApi.expression(normalizeText(text)), ac))
  }

  /** (id, n_hits, n_terms, blocked) per document. */
  def score(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      maxTermsAllowed: Long = 0L): DataFrame = {
    val m = matchStats(col(textCol), terms)
    df.select(col(idCol).as("id"),
      m.getField("n_hits").as("n_hits"),
      m.getField("n_terms").as("n_terms"),
      (m.getField("n_terms") > maxTermsAllowed).as("blocked"))
  }

  /** Rows whose text matches NO dictionary term (the keep-side of the
    * gate). Map-only; composes with any downstream curation stage.
    */
  def filterClean(df: DataFrame, textCol: String, terms: Seq[String]): DataFrame =
    df.filter(matchStats(col(textCol), terms).getField("n_terms") === 0L)
}
