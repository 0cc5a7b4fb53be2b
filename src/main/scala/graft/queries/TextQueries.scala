package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Queries.t
import graft.functions.TextFunctions

/** Split from the monolithic Queries.scala registry (round 11);
  * registered via [[graft.Queries.all]], oracled via [[graft.Queries.oracles]].
  */
object TextQueries {

  /** Repetition quality signals: fraction of words / bigrams /
    * trigrams that repeat an earlier occurrence — the filter that
    * catches degenerate machine-generated or boilerplate text. One
    * native single-pass expression
    * ([[graft.plans.TextRepetitionStats]]) computes all four signals;
    * the HOF formulation ([[TextFunctions.dupNgramFraction]], spec-
    * pinned equivalent) re-evaluated the interpreted shingle transform
    * per reference and dominated the whole bench. DuckDB replays the
    * shingle construction and list_distinct exactly.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    graft.plans.NativeText.register(s)
    t(s, dir, "documents")
      .select(col("doc_id"),
        graft.plans.NativeText.textRepetitionStats(col("text")).as("r"))
      .select(
        col("doc_id"),
        col("r.n_words").as("n_words"),
        round(col("r.dup_word_frac"), 6).as("dup_word_frac"),
        round(col("r.dup_bigram_frac"), 6).as("dup_bigram_frac"),
        round(col("r.dup_trigram_frac"), 6).as("dup_trigram_frac"))
  }

  val textRepetitionSql: String =
    """WITH words AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |g AS (SELECT doc_id, w,
      |  list_transform(range(1, greatest(len(w), 1)),
      |    i -> w[i] || ' ' || w[i+1]) AS g2,
      |  list_transform(range(1, greatest(len(w) - 1, 1)),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g3
      |  FROM words)
      |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
      |  CASE WHEN len(w) > 0
      |    THEN round((len(w) - len(list_distinct(w))) / len(w), 6)
      |    ELSE 0.0 END AS dup_word_frac,
      |  CASE WHEN len(g2) > 0
      |    THEN round((len(g2) - len(list_distinct(g2))) / len(g2), 6)
      |    ELSE 0.0 END AS dup_bigram_frac,
      |  CASE WHEN len(g3) > 0
      |    THEN round((len(g3) - len(list_distinct(g3))) / len(g3), 6)
      |    ELSE 0.0 END AS dup_trigram_frac
      |FROM g""".stripMargin

  /** Sliding-window chunking ([[graft.operators.Chunking]]): documents
    * into 64-token windows with 16 tokens of shared context. Chunk
    * ids, boundaries and text are a pure function of the word
    * positions, so DuckDB replays every chunk byte-for-byte.
    */
  def textChunks(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.chunkDocuments(
      t(s, dir, "documents"), "doc_id", "text", maxTokens = 64, overlap = 16)

  val textChunksSql: String =
    """WITH words AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      |  FROM documents),
      |starts AS (SELECT doc_id, w, len(w) AS n,
      |    unnest(range(1, greatest(len(w), 1) + 1, 48)) AS s
      |  FROM words)
      |SELECT doc_id,
      |  CAST((s - 1) / 48 AS BIGINT) AS chunk_id,
      |  CAST(least(64, n - s + 1) AS BIGINT) AS n_tokens,
      |  array_to_string(w[s : least(s + 63, n)], ' ') AS chunk_text
      |FROM starts WHERE s = 1 OR s + 16 <= n""".stripMargin

  /** Z-order cell mapping ([[graft.operators.ZOrder.zValue]]): the
    * bit-interleaved Morton value over two bucketed dimensions of
    * `orders` — the write-side clustering key behind multi-dimensional
    * file pruning. Pure codegen'd arithmetic (shift/and/multiply), zero
    * shuffles; the oracle evaluates the IDENTICAL term expansion.
    */
  def zorderCells(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      graft.operators.ZOrder.zValue(
        Seq(col("o_custkey") % 256, col("o_orderkey") % 256), 8).as("z_cell"))

  val zorderCellsSql: String = {
    val z = graft.operators.ZOrder.zValueSql(
      Seq("(o_custkey % 256)", "(o_orderkey % 256)"), 8)
    s"SELECT o_orderkey, $z AS z_cell FROM orders"
  }

  /** Token counting, length stats, quality score, fingerprint. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val nTokens = TextFunctions.tokenCount(col("text"))
    d.select(
      col("doc_id"),
      nTokens.cast("long").as("n_tokens"),
      // BPE-ish subword proxy: letter runs, single digits, and isolated
      // punctuation each count as one token
      regexp_count(lower(col("text")), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"))
        .cast("long").as("n_bpe_tokens"),
      length(col("text")).cast("long").as("n_chars_measured"),
      round(length(col("text")).cast("double") /
        when(nTokens > 0, nTokens.cast("double")).otherwise(lit(null)), 4)
        .as("avg_word_len"),
      TextFunctions.qualityScore(col("text")).as("quality_score"),
      TextFunctions.fingerprint(col("text")).as("fingerprint"))
  }

  val textStatsSql: String =
    """WITH base AS (
      |  SELECT doc_id, text,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chr
      |  FROM documents
      |), awl AS (
      |  SELECT *,
      |    CASE WHEN n_tok > 0 THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE)
      |         ELSE 0.0 END AS avg_wl
      |  FROM base)
      |SELECT doc_id,
      |  n_tok AS n_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS BIGINT)
      |    AS n_bpe_tokens,
      |  n_chr AS n_chars_measured,
      |  round(CASE WHEN n_tok > 0 THEN CAST(n_chr AS DOUBLE) / CAST(n_tok AS DOUBLE) END, 4)
      |    AS avg_word_len,
      |  round(least(CAST(n_chr AS DOUBLE) / 200.0, 1.0) * 0.5 +
      |    (CASE WHEN avg_wl BETWEEN 3 AND 10 THEN 1.0
      |          WHEN avg_wl > 0 THEN 0.5 ELSE 0.0 END) * 0.5, 6) AS quality_score,
      |  sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
      |FROM awl""".stripMargin

  /** Marker-word language identification. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val scoreCols = TextFunctions.langMarkers.map { case (lang, _) =>
      TextFunctions.langScore(col("text"), lang).cast("long").as(s"score_$lang")
    }
    d.select(
      (col("doc_id") +: TextFunctions.langId(col("text")).as("predicted_lang") +: scoreCols): _*)
  }

  val langIdSql: String = {
    val scoreDefs = TextFunctions.langMarkers.map { case (lang, words) =>
      val sum = words
        .map(wd => s"len(regexp_extract_all(lower(text), '\\b$wd\\b'))")
        .mkString(" + ")
      s"CAST($sum AS BIGINT) AS score_$lang"
    }.mkString(",\n  ")
    val langs = TextFunctions.langMarkers.map(_._1)
    val best = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN score_$l = $best THEN '$l'").mkString("\n    ")
    s"""WITH scores AS (SELECT doc_id, text,
       |  $scoreDefs
       |FROM documents)
       |SELECT doc_id,
       |  CASE WHEN $best = 0 THEN 'und'
       |    $cases
       |  END AS predicted_lang,
       |  ${langs.map(l => s"score_$l").mkString(", ")}
       |FROM scores""".stripMargin
  }
}
