package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Verify-gate queries for the text-analysis operators over `documents`
 * (training-data-pipeline surface: token stats, quality scoring, lang-ID,
 * fingerprinting). Each DuckDB oracle recomputes the same integer-exact
 * expression in SQL.
 */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** DuckDB CTE: documents + lowered whitespace tokens. */
  private val D =
    """WITH d AS (
      |  SELECT doc_id, text,
      |         string_split_regex(trim(lower(text)), '\s+') AS toks
      |  FROM documents
      |)""".stripMargin

  private val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // corpus-level vocabulary statistics per source: exact distinct tokens
    // + token volume. Scale: explode → partial-aggregated groupBy on
    // (source, token) — map-side combine, one shuffle, no driver state
    "text_vocab" -> { (s: SparkSession, dir: String) =>
      docs(s, dir)
        .select(col("source"), explode(graft.dedup.Hashing.toks(col("text"))).as("tok"))
        .groupBy("source")
        .agg(countDistinct(col("tok")).as("n_vocab"), count(lit(1)).as("n_tokens"))
        .orderBy("source")
    },
    // corpus heavy hitters: top-20 bigrams by frequency. Scale: map-side
    // bigram explode → partially-aggregated groupBy → TakeOrdered top-k
    // (per-partition top-k + driver merge, no global sort)
    "text_top_bigrams" -> { (s: SparkSession, dir: String) =>
      val toks = graft.dedup.Hashing.toks(col("text"))
      val bigrams = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1)))
      ).otherwise(array())
      docs(s, dir)
        .select(explode(bigrams).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    },
    "text_token_stats" -> { (s: SparkSession, dir: String) =>
      docs(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        bpeTokenCount(col("text")).cast("long").as("n_bpe"),
        punctCount(col("text")).cast("long").as("n_punct"),
        length(col("text")).cast("long").as("len_chars")
      ).orderBy("doc_id")
    },
    "text_quality" -> { (s: SparkSession, dir: String) =>
      docs(s, dir).select(
        col("doc_id"),
        punctRatioX1000(col("text")).as("punct_x1000"),
        stopRatioX1000(col("text")).as("stop_x1000"),
        meanTokenLenX10(col("text")).as("mean_tok_x10"),
        qualityScoreX1000(col("text")).as("quality_x1000")
      ).orderBy("doc_id")
    },
    "text_lang_id" -> { (s: SparkSession, dir: String) =>
      docs(s, dir).select(
        col("doc_id"),
        langScore(col("text"), "en").cast("long").as("en_score"),
        langScore(col("text"), "de").cast("long").as("de_score"),
        langScore(col("text"), "fr").cast("long").as("fr_score"),
        langScore(col("text"), "es").cast("long").as("es_score"),
        langId(col("text")).as("lang_pred")
      ).orderBy("doc_id")
    },
    "text_fingerprint" -> { (s: SparkSession, dir: String) =>
      docs(s, dir).select(
        col("doc_id"),
        // codegen'd native expression (GraftExtensions), bit-identical to
        // TextFunctions.fingerprint / Fast.fingerprintFast
        call_function("graft_polyhash", col("text")).as("fp")
      ).orderBy("doc_id")
    }
  )

  private def sc(words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CAST(len(list_filter(toks, t -> list_contains($lst, t))) AS BIGINT)"
  }

  val oracles: Map[String, String] = Map(
    "text_top_bigrams" ->
      """WITH t AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents
        |), b AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        |  FROM t WHERE len(toks) >= 2
        |)
        |SELECT bigram, count(*) AS n FROM b GROUP BY bigram
        |ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin,
    "text_vocab" ->
      """WITH t AS (
        |  SELECT source,
        |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents
        |)
        |SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_vocab,
        |       count(*) AS n_tokens
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "text_token_stats" ->
      s"""$D SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe,
         |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
         |  CAST(length(text) AS BIGINT) AS len_chars
         |FROM d ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""$D SELECT doc_id,
         |  CAST(floor(1000.0 * len(regexp_extract_all(text, '[.,!?;:]')) / greatest(length(text), 1)) AS BIGINT) AS punct_x1000,
         |  CAST(floor(1000.0 * ${sc(stopwords)} / greatest(len(toks), 1)) AS BIGINT) AS stop_x1000,
         |  CAST(floor(10.0 * list_sum(list_transform(toks, t -> length(t))) / greatest(len(toks), 1)) AS BIGINT) AS mean_tok_x10,
         |  CAST(floor(1000.0 * (
         |     0.4 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
         |   + 0.3 * least(3.0 * ${sc(stopwords)} / greatest(len(toks), 1), 1.0)
         |   + 0.3 * (1.0 - least(5.0 * len(regexp_extract_all(text, '[.,!?;:]')) / greatest(length(text), 1), 1.0))
         |  )) AS BIGINT) AS quality_x1000
         |FROM d ORDER BY doc_id""".stripMargin,
    "text_lang_id" ->
      s"""$D, s AS (
         |  SELECT doc_id, text,
         |    ${sc(Seq("the", "a", "of", "and", "is"))} AS en_score,
         |    ${sc(Seq("der", "die", "das", "und", "ist"))} AS de_score,
         |    ${sc(Seq("le", "les", "et", "est", "dans"))} AS fr_score,
         |    ${sc(Seq("el", "los", "las", "y", "es"))} AS es_score
         |  FROM d
         |)
         |SELECT doc_id, en_score, de_score, fr_score, es_score,
         |  CASE
         |    WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |    WHEN greatest(en_score, de_score, fr_score, es_score) = 0 THEN 'und'
         |    WHEN en_score = greatest(en_score, de_score, fr_score, es_score) THEN 'en'
         |    WHEN de_score = greatest(en_score, de_score, fr_score, es_score) THEN 'de'
         |    WHEN fr_score = greatest(en_score, de_score, fr_score, es_score) THEN 'fr'
         |    ELSE 'es'
         |  END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""$D SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(lower(trim(text)), ''), c -> CAST(ascii(c) AS BIGINT))),
         |    (h, c) -> (h * 31 + c) % 2147483647) AS fp
         |FROM d ORDER BY doc_id""".stripMargin
  )
}
