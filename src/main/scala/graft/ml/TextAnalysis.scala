package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: token counting, quality
 * scoring, language identification, document fingerprinting. Pure column
 * expressions (codegen'd) wherever the expression evaluates once per row;
 * langId is the exception — its multi-language scoring is a single-pass
 * JIT'd Scala UDF because the column form re-tokenized every row once per
 * language (see langIdFn).
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
  def langId(text: Column): Column = langIdFn(text)

  /**
   * One-pass language scorer. The previous column form referenced the
   * tokenization expression inside 5 per-language interpreted filter()
   * lambdas, so every row was regex-normalized and split 5 times
   * (CollapseProject re-inlines any pre-binding projection — the same
   * trap documented at Dedup.shingles). A Scala UDF tokenizes ONCE in
   * JIT'd code; per the project's preference order that beats the
   * interpreted-HOF chain (native Expression > Scala UDF > interpreted
   * HOF). Semantics are unchanged: hit-count max with ascending-struct
   * tie-break == larger (hits, lang) pair wins; 'und' when no hits.
   */
  private lazy val langIdFn: org.apache.spark.sql.expressions.UserDefinedFunction = {
    val langSets: Array[(String, Set[String])] =
      stopwords.toSeq.sortBy(_._1).map { case (l, ws) => (l, ws.toSet) }.toArray
    udf { (s: String) =>
      if (s == null) null
      else {
        // mirrors Dedup.normText: lower(regexp_replace(text, '\s+', ' '))
        val toks = s.replaceAll("\\s+", " ").toLowerCase(java.util.Locale.ROOT)
          .split(" ", -1)
        var bestHits = -1
        var bestLang = ""
        langSets.foreach { case (lang, words) =>
          var hits = 0
          var i = 0
          while (i < toks.length) { if (words.contains(toks(i))) hits += 1; i += 1 }
          if (hits > bestHits || (hits == bestHits && lang > bestLang)) {
            bestHits = hits; bestLang = lang
          }
        }
        if (bestHits > 0) bestLang else "und"
      }
    }
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
