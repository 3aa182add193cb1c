package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: token counting, quality
 * scoring, language identification, document fingerprinting. All pure
 * column expressions (codegen'd) — no UDFs, so they stay inside
 * whole-stage codegen at 100 TB scale.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: alpha runs, digit runs, and single non-alnum
   *  non-space chars each count as one token. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of alphabetic chars to total length (0 for empty). */
  def alphaRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Count of sentence punctuation chars. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", ""))

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
   *  heuristic. Public common-word lists, truncated. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ich", "nicht", "ein", "mit", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "un", "una", "por"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Stopword-hit ratio for one language. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val toks = split(Dedup.normText(text), " ")
    val sw = array(stopwords(lang).map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Language-ID: language with the highest stopword-hit count;
   *  deterministic tie-break on language code; 'und' when no hits. */
  def langId(text: Column): Column = {
    val toks = split(Dedup.normText(text), " ")
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val sw = array(words.map(lit): _*)
      struct(size(filter(toks, t => array_contains(sw, t))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /**
   * Quality score in [0,1]: weighted blend of length band, alpha ratio,
   * punctuation presence and word-length sanity — the usual cheap heuristics
   * applied before expensive model-based filtering.
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val alpha = alphaRatio(text)
    val mwl = meanWordLen(text)
    val wordScore = when(mwl.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(lenScore * 0.4 + alpha * 0.4 + wordScore * 0.2, 6)
  }

  /** Content fingerprint: md5 of the normalized text — stable under
   *  whitespace/case variation. */
  def fingerprint(text: Column): Column = md5(Dedup.normText(text))

  /**
   * Winnowing-style rolling fingerprint: minimum shingle hash per document
   * — a compact similarity-preserving sketch (the k=1 MinHash special case;
   * see [[Dedup.minHashSignatures]] for the general sketch).
   */
  def minShingleFingerprint(df: DataFrame, textCol: String, idCol: String,
                            shingleLen: Int = 3): DataFrame =
    Dedup.shingles(df, textCol, idCol, shingleLen, distinct = false) // min() is dup-safe
      .groupBy(col("id"))
      .agg(min(Hashing.oracleHash(col("shingle"))).as("min_shingle_hash"))
}
