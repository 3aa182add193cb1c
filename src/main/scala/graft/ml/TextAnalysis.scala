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

  /** URL canonicalization for web-corpus dedup (the CCNet/CommonCrawl
   *  pre-step): lowercase the scheme and host (NEVER the path — paths are
   *  case-significant), drop the fragment, drop pure-tracking `utm_*`
   *  query strings, and strip one trailing slash. Every step is a plain
   *  regex both Spark (Java regex) and any SQL oracle (RE2) agree on —
   *  no lookarounds, no backrefs. Compose with [[Dedup.exact]]-style
   *  grouping for the actual dedup. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val noFragment = regexp_replace(rest, "#.*$", "")
    val noUtm = regexp_replace(noFragment, "\\?utm_[^#]*$", "")
    val noTrailing = regexp_replace(noUtm, "/$", "")
    concat(scheme, lit("://"), host, noTrailing)
  }

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

  /**
   * BM25 relevance of each document to a fixed term set — the ranking
   * function behind corpus search and query-targeted filtering. All
   * arithmetic is integer-rational so scores are bit-reproducible in any
   * engine: the log-free probabilistic idf (2N−2df+1)/(2df+1) and the
   * k1=1.2 / b=0.75 saturation term assemble into ONE BIGINT floor
   * division per (doc, term):
   *   score = (1e4·(2N−2df+1)·44·avgdl·tf) div
   *           ((2df+1)·(20·avgdl·tf + 6·avgdl + 18·dl))
   * (44/20/6/18 are k1, b cleared of denominators; avgdl = Σdl div N).
   * Output: (id, n_terms matched, bm25_q summed score quanta), one row
   * per input document (0/0 when no term matches).
   *
   * Scale shape: the posting explode is filtered to `terms` BEFORE the tf
   * groupBy, so only matching postings enter the shuffle; df and the
   * corpus stats are broadcast |terms|-row frames. The per-doc length
   * count is the only corpus-scale aggregation and partial-aggregates
   * map-side.
   *
   * Headroom: the numerator 1e4·(2N−2df+1)·44·avgdl·tf must stay below
   * 2^63 — safe while N·avgdl·tf ≲ 2·10^13 (e.g. a billion docs at
   * avgdl 500, tf 40). Beyond that, drop the 1e4 quantum or assemble the
   * final ratio in double (costing bit-exactness, not correctness).
   */
  def bm25Scores(df: DataFrame, textCol: String, idCol: String,
                 terms: Seq[String]): DataFrame = {
    // id keeps its NATIVE type end-to-end (string ids join as strings):
    // a cast to long would null out non-numeric ids and silently score
    // them 0/0 via the left-join defaults.
    val toks = df.select(col(idCol).as("id"),
      filter(split(Dedup.normText(col(textCol)), " "), x => length(x) > 0).as("ts"))
    // dl is aggregated PER ID (not per row): duplicate-id rows are one
    // merged document — sum their lengths, or the tf-side join below
    // multiplies every posting by the id's row count. For unique-id
    // corpora the groupBy is a no-op pre-aggregation (map-side partial,
    // same exchange the dl join pays anyway).
    val dl = toks.select(col("id"), size(col("ts")).cast("long").as("dl"))
      .groupBy(col("id")).agg(sum(col("dl")).as("dl"))
    val st = dl.agg(count(lit(1)).as("nd"), expr("sum(dl) div count(*)").as("avgdl"))
    val tf = toks.selectExpr("id", "explode(ts) AS tok")
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sc = tf.join(broadcast(dfc), "tok").join(dl, "id").crossJoin(broadcast(st))
      .select(col("id"),
        expr("(10000L * (2L*nd - 2L*df + 1L) * 44L * avgdl * tf) div " +
          "((2L*df + 1L) * (20L*avgdl*tf + 6L*avgdl + 18L*dl))").as("q"))
    val perDoc = sc.groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("q")).as("bm25_q"))
    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("bm25_q"), lit(0L)).as("bm25_q"))
  }

  /**
   * Unigram-LM surprise score — the log-free, cross-engine-exact
   * analogue of the perplexity filter (CCNet-style: score text by how
   * surprising its tokens are under a corpus LM; outliers on either
   * side are boilerplate or garbage). Per token the surprise is the
   * BIT LENGTH of `N_total div tf` — an exact integer
   * `floor(log2(N/tf)) + 1`, computed as `length(bin(x))` which any SQL
   * engine reproduces bit-for-bit where a libm `log()` never is. Rare
   * tokens contribute many bits, stop-words one or two; the per-doc
   * score is the mean token surprise in integer micro-units:
   * `ppl_u = (1e6 * Σ bits) div n_tokens`.
   *
   * Output: (idCol, n_toks, lm_bits, ppl_u).
   *
   * Scale shape: c12's — one token explode into a vocab-sized tf frame
   * (map-side partial agg; vocabulary is Zipf-small relative to the
   * corpus), a 1-row total broadcast into the vocab frame, a token-keyed
   * join back, and one doc-keyed agg. No window, no driver reads.
   */
  def unigramSurprise(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(org.apache.spark.sql.functions.filter(
        split(Dedup.normText(col(textCol)), " "),
        x => length(x) > 0)).as("tok"))
    val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val total = tf.agg(sum(col("tf")).as("n_total"))
    val scored = tf.crossJoin(broadcast(total))
      .select(col("tok"),
        expr("CAST(length(bin(n_total div tf)) AS BIGINT)").as("bits"))
    toks.join(scored, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("bits")).as("lm_bits"))
      .select(col(idCol), col("n_toks"), col("lm_bits"),
        expr("(1000000 * lm_bits) div n_toks").as("ppl_u"))
  }

  /**
   * Iterative BPE merge learning — the full trainer loop whose single
   * round t17 computes and whose encode half t18 applies (Sennrich et
   * al. '16). Round k counts adjacent SYMBOL pairs over the vocabulary
   * (corpus-weighted), takes the most frequent (ties broken by the pair
   * itself, so the merge table is a pure function of the corpus), and
   * rewrites the vocabulary with that merge before round k+1. Symbols
   * are multi-character after the first round — words ride the
   * `<sym><sym>…` wrapped form t18 introduced, so one left-to-right
   * `replace('<a><b>' -> '<ab>')` applies a merge with no boundary
   * sharing, byte-identical in any engine.
   *
   * Output: one row per learned merge — (round, merge, a, b, cnt).
   *
   * Scale shape: the corpus is scanned ONCE into the word-frequency
   * dictionary (map-side partial agg; Zipf makes vocab ≪ tokens); every
   * round after that runs on the vocab-sized frame — a bigram explode,
   * one keyed agg, a TakeOrdered(1), and a 1-row broadcast back — with
   * the vocab localCheckpointed per round to keep the plan linear
   * ([[Clustering.kmeans]]'s loop discipline). At 100 TB the per-round
   * cost is vocabulary-bounded, not corpus-bounded.
   */
  def bpeLearn(df: DataFrame, textCol: String, numMerges: Int = 6): DataFrame = {
    require(numMerges >= 1 && numMerges <= 64,
      s"bpeLearn: numMerges must be in [1, 64], got $numMerges")
    var vocab = df.select(explode(org.apache.spark.sql.functions.filter(
        split(Dedup.normText(col(textCol)), " "), x => length(x) > 0)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tc"))
      .select(regexp_replace(col("tok"), "(.)", "<$1>").as("ws"), col("tc"))
      .localCheckpoint(true) // vocab-sized; scanned once per round
    var out: DataFrame = null
    for (round <- 1 to numMerges) {
      val top = vocab
        .withColumn("syms", split(expr("substring(ws, 2, length(ws) - 2)"), "><"))
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> named_struct('a', element_at(syms, i), 'b', element_at(syms, i + 1)))"""
            .stripMargin)).as("p"), col("tc"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("tc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .withColumn("round", lit(round.toLong))
        .localCheckpoint(true) // 1 row; re-roots the per-round plan
      out = if (out == null) top else out.unionAll(top)
      // 1-row merge frame broadcast against the vocab — t18's reviewed
      // crossJoin shape (PlanSpec-allowlisted for the catalog query)
      vocab = vocab
        .crossJoin(broadcast(top.select(col("a").as("ma"), col("b").as("mb"))))
        .withColumn("ws",
          expr("replace(ws, '<' || ma || '><' || mb || '>', '<' || ma || mb || '>')"))
        .select(col("ws"), col("tc"))
        .localCheckpoint(true)
    }
    out.select(col("round"), concat(col("a"), col("b")).as("merge"),
      col("a"), col("b"), col("cnt"))
  }

  /**
   * BPE encode with a LEARNED merge table (t26) — the apply half of
   * [[bpeLearn]]'s train half: tokenize the corpus under the k learned
   * merges, applied in round order via one higher-order fold
   * (`aggregate(marr, ws, (acc, m) -> replace(acc, m, merged(m)))` —
   * each merge pattern `<a><b>` collapses to `<ab>` by deleting its
   * inner `><`, so the fold needs no second lookup table). Output per
   * document: (idCol, n_words, bpe_tokens).
   *
   * Scale shape: the merge table is a k-row 1-row-array broadcast; the
   * fold runs over the DISTINCT vocabulary (Zipf-small), never the
   * token stream; then one token-keyed join back and a doc-keyed agg —
   * c12's shape. Encode cost is |vocab|·k replaces however large the
   * corpus.
   */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
                merges: DataFrame): DataFrame = {
    val vocab = encodedVocab(df, textCol, merges)
    tokStream(df, textCol, col(idCol))
      .join(vocab, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("bpe_tokens"))
  }

  /** The (id-or-group, tok) occurrence stream every encode-side operator
   *  consumes: one explode of the normalized whitespace tokens. */
  private def tokStream(d: DataFrame, textCol: String, cols: Column*): DataFrame =
    d.select(cols :+
      explode(org.apache.spark.sql.functions.filter(
        split(Dedup.normText(col(textCol)), " "), t => length(t) > 0)).as("tok"): _*)

  /** DISTINCT vocabulary encoded under a learned merge table:
   *  (tok, n_syms = BPE token count of the word). The k merges fold as a
   *  1-row-array broadcast over the vocab — encode cost is |vocab|·k
   *  replaces however large the corpus ([[bpeEncode]]'s core, shared with
   *  [[tokenizerFertility]]). */
  private def encodedVocab(df: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val marr = merges.select(col("round"),
        concat(lit("<"), col("a"), lit("><"), col("b"), lit(">")).as("pat"))
      .agg(expr("transform(array_sort(collect_list(struct(round, pat))), x -> x.pat)")
        .as("marr"))
    // the fold runs once per DISTINCT word — never per occurrence
    tokStream(df, textCol).select(col("tok")).distinct()
      // 1-row merge-array frame broadcast against the vocab (t18's
      // reviewed crossJoin shape)
      .crossJoin(broadcast(marr))
      .withColumn("ws", regexp_replace(col("tok"), "(.)", "<$1>"))
      .withColumn("enc", expr(
        "aggregate(marr, ws, (acc, m) -> replace(acc, m, replace(m, '><', '')))"))
      .select(col("tok"),
        expr("CAST(length(enc) - length(replace(enc, '<', '')) AS BIGINT)").as("n_syms"))
  }

  /**
   * Tokenizer fertility per source (t30): UTF-8 bytes per BPE token
   * under a learned merge table — the tokenizer-health number that
   * catches a vocabulary mismatched to a source (low bytes-per-token =
   * the tokenizer shatters that source into near-characters, inflating
   * its training cost and effectively down-weighting it). Byte counts
   * are over the tokenized material itself (`octet_length(tok)` summed
   * per occurrence — whitespace excluded, so the ratio is a property of
   * the vocabulary, not the formatting).
   *
   * Output: (source, n_words, n_bytes, n_bpe, bytes_per_tok_u) with
   * `bytes_per_tok_u = (1e6 · n_bytes) div n_bpe` in micro-units.
   *
   * Scale shape: [[bpeEncode]]'s exactly — the merge fold runs over the
   * DISTINCT vocabulary (Zipf-small), one token-keyed join back, one
   * source-keyed agg. The 1e6 product rides DECIMAL(38,0): n_bytes
   * passes ~9.2e12 (a few TB of text) long before any corpus limit.
   */
  def tokenizerFertility(df: DataFrame, sourceCol: String, textCol: String,
                         merges: DataFrame): DataFrame = {
    val vocab = encodedVocab(df, textCol, merges)
    tokStream(df, textCol, col(sourceCol).as("source"))
      .join(vocab, "tok")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(octet_length(col("tok")).cast("long")).as("n_bytes"),
        sum(col("n_syms")).as("n_bpe"))
      .select(col("source"), col("n_words"), col("n_bytes"), col("n_bpe"),
        expr("CAST((1000000 * cast(n_bytes AS DECIMAL(38,0))) div n_bpe AS BIGINT)")
          .as("bytes_per_tok_u"))
  }

  /**
   * Out-of-vocabulary rate per source (t33): the fraction of each
   * source's tokens falling outside the corpus's top-k vocabulary —
   * the vocab-sizing / coverage report read before committing to a
   * tokenizer budget (a source with high OOV under the planned vocab
   * will shatter into fallback bytes and train poorly).
   *
   * The vocabulary is the k most frequent tokens corpus-wide, selected
   * by the `graft_topk_pairs` aggregate (≤ k pairs per task through
   * the exchange — never a global rank window), boundary ties broken
   * by the 64-bit token hash surrogate so the selected SET is
   * deterministic and any engine reproduces it. Membership joins on
   * the same hash (collision odds ~k²/2^60 — and the DuckDB oracle
   * hashes identically, so even a collision grades consistently).
   *
   * Output: (source, n_toks, n_oov, oov_u = (1e6·n_oov) div n_toks).
   *
   * Scale shape: one corpus scan into the vocab-sized tf frame, the
   * top-k aggregate, then the (source, tok)-keyed stats frame joins
   * the broadcast k-row vocab — per-source sums, no window, no
   * second corpus scan (the stream-side counts ride the tf frame).
   */
  def oovRate(df: DataFrame, sourceCol: String = "source",
              textCol: String = "text", vocabK: Int = 256): DataFrame = {
    require(vocabK >= 1 && vocabK <= 100000, s"oovRate: vocabK in [1, 100000], got $vocabK")
    val stf = sourceTf(df, sourceCol, textCol) // (source, tok, tf)
    val tf = stf.groupBy(col("tok")).agg(sum(col("tf")).as("ctf"))
    val vocab = tf.agg(graft.functions.SketchAggregates
        .topKPairs(col("ctf"), Hashing.oracleHash(col("tok")), vocabK).as("pairs"))
      .select(explode(col("pairs")).as("p")).select(col("p.id").as("h"))
      .withColumn("iv", lit(1L))
    stf.withColumn("h", Hashing.oracleHash(col("tok")))
      .join(broadcast(vocab), Seq("h"), "left")
      .groupBy(col("source"))
      .agg(sum(col("tf")).as("n_toks"),
        sum(when(col("iv").isNull, col("tf")).otherwise(lit(0L))).as("n_oov"))
      .select(col("source"), col("n_toks"), col("n_oov"),
        // the 1e6 product rides DECIMAL(38,0): plain BIGINT wraps past
        // ~9.2e12 tokens/source, where the oracle's HUGEINT would diverge
        expr("CAST((1000000 * CAST(n_oov AS DECIMAL(38,0))) div n_toks AS BIGINT)").as("oov_u"))
  }

  /**
   * Per-source document-LENGTH drift between snapshots (t34): token
   * counts bucketed by exact floor-log2 (`length(bin(n))` — the integer
   * log both engines reproduce bit-for-bit, t28's device), per-source
   * bin SHARES in exact ppm, and the old-vs-new share shift summarized
   * as L1 and max (a binned two-sample KS statistic). The scalar-feature
   * drift monitor completing the family — t28 watches the token
   * DISTRIBUTION, s14/q112 the embedding space; a chunking bug, a new
   * crawler, or a truncating extractor moves the LENGTH histogram
   * before any of those fire. Output: (sourceCol, n_new, n_old,
   * n_bins, l1_shift_ppm, max_shift_ppm).
   *
   * Scale shape: two token-count scans into (source, bin) frames
   * (≈40 log2 bins, so source-catalog-sized), a full-outer bin join
   * (a bin present in one snapshot only IS drift — coalesce to share
   * 0, never drop), and per-source arithmetic. The 1e6 products ride
   * DECIMAL(38,0).
   */
  def lengthDrift(newDf: DataFrame, oldDf: DataFrame,
                  sourceCol: String = "source",
                  textCol: String = "text"): DataFrame = {
    def shares(d: DataFrame, nName: String, pName: String) = {
      val binned = d.select(col(sourceCol).as("src"),
          wsTokenCount(col(textCol)).cast("long").as("nt"))
        .withColumn("b", expr("CAST(length(bin(greatest(nt, 1))) AS BIGINT)"))
        .groupBy(col("src"), col("b")).agg(count(lit(1)).as("c"))
      val tot = binned.groupBy(col("src")).agg(sum(col("c")).as(nName))
      binned.join(tot, "src")
        .withColumn(pName, expr(
          s"CAST((1000000 * CAST(c AS DECIMAL(38,0))) div $nName AS BIGINT)"))
        .select(col("src"), col("b"), col(nName), col(pName))
    }
    shares(newDf, "n_new", "p_new")
      .join(shares(oldDf, "n_old", "p_old"), Seq("src", "b"), "full_outer")
      .groupBy(col("src"))
      .agg(max(col("n_new")).as("n_new"), max(col("n_old")).as("n_old"),
        count(lit(1)).as("n_bins"),
        sum(abs(coalesce(col("p_new"), lit(0L)) - coalesce(col("p_old"), lit(0L))))
          .as("l1_shift_ppm"),
        max(abs(coalesce(col("p_new"), lit(0L)) - coalesce(col("p_old"), lit(0L))))
          .as("max_shift_ppm"))
      .select(col("src").as(sourceCol), col("n_new"), col("n_old"),
        col("n_bins"), col("l1_shift_ppm"), col("max_shift_ppm"))
  }

  /**
   * Quality-signal ensemble by Borda rank aggregation (t31): combine
   * three orthogonal integer signals — token length, lexical diversity
   * (`1e6·distinct div tokens`), and unigram-LM naturalness (negated
   * [[unigramSurprise]] ppl_u, lower surprise ranks better) — into one
   * corpus-wide rank sum. Rank aggregation is how production quality
   * ensembles compose heterogeneous scorers (a raw-score average is
   * meaningless across units; ranks are comparable by construction),
   * and the Borda sum is the standard positional rule.
   *
   * Exactness: every signal is exact-integer, and each global rank is
   * ordered by (value DESC, id) — fully deterministic, so a DuckDB
   * `row_number()` replay matches bit-for-bit.
   *
   * Output: (idCol, rk_len, rk_div, rk_ppl, borda) — rank 1 is best
   * per signal; smaller borda = better document.
   *
   * Scale shape: a GLOBAL rank is the classic scale trap (a
   * partitionless window is one task holding the corpus); here all
   * three ranks ride ONE [[graft.utils.DataframeHelper.perGroupSequence]]
   * over the 3-signal union — range-sorted across all tasks, ranks
   * reconstructed from per-task offsets. Plus t23's scan shape for the
   * LM leg. No window over data-sized groups anywhere.
   */
  def qualityEnsemble(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokStream(df, textCol, col(idCol))
    val base = df.select(col(idCol)).join(
        toks.groupBy(col(idCol))
          .agg(count(lit(1)).as("n_toks"), countDistinct(col("tok")).as("nd")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("nd"), lit(0L)).as("nd"))
    val ppl = unigramSurprise(df, idCol, textCol).select(col(idCol), col("ppl_u"))
    val sig = base.select(col(idCol), col("n_toks").as("v"), lit("len").as("sig"))
      .unionByName(base.select(col(idCol),
        expr("CASE WHEN n_toks = 0 THEN 0L ELSE (1000000 * nd) div n_toks END").as("v"),
        lit("div").as("sig")))
      .unionByName(ppl.select(col(idCol), (-col("ppl_u")).as("v"), lit("ppl").as("sig")))
    val ranked = graft.utils.DataframeHelper.perGroupSequence(
      sig.withColumn("__negv_", -col("v")), Seq("sig"), Seq("__negv_", idCol), "rk")
    ranked.groupBy(col(idCol))
      .agg(max(when(col("sig") === "len", col("rk"))).as("rk_len"),
        max(when(col("sig") === "div", col("rk"))).as("rk_div"),
        max(when(col("sig") === "ppl", col("rk"))).as("rk_ppl"),
        sum(col("rk")).as("borda"))
  }

  /**
   * Bigram-LM surprise (t29): score every document's tokens under a
   * bigram language model with stupid backoff — the two-gram upgrade of
   * [[unigramSurprise]]'s CCNet-style perplexity filter, and the exact
   * integer analogue of a KenLM quality gate. The LM is trained on a
   * SEPARATE snapshot (`lmDf` — typically a held-out or previous-crawl
   * subset), so unseen bigrams and unseen tokens genuinely occur and the
   * backoff path is exercised, unlike a self-scored corpus where every
   * bigram has count ≥ 1.
   *
   * Per-token bits (all exact `length(bin(x))` floor-log2s):
   *  - document's first token: smoothed unigram,
   *    `blen((N+V) div (c1+1))` (Laplace — unseen tokens cost the model
   *    its full tail mass instead of dividing by zero);
   *  - bigram (w1, w2) seen in the LM: `blen(c1(w1) div c2(w1,w2))`
   *    (≈ −log2 p(w2|w1); c2 ≤ c1 so the quotient is ≥ 1);
   *  - unseen bigram: `backoffBits + blen((N+V) div (c1(w2)+1))` —
   *    stupid backoff (Brants et al. '07), the integer analogue of the
   *    usual α = 1/2^backoffBits penalty.
   *
   * Output: (idCol, n_toks, lm_bits, ppl_u = (1e6·lm_bits) div n_toks);
   * docs with no tokens score (0, 0, 0).
   *
   * Scale shape: both corpora scan once into vocab-/bigram-vocab-sized
   * count frames (map-side partial agg); the scoring stream joins those
   * frames KEYED (tok / (w1,w2)) plus two reviewed 1-row totals
   * broadcasts, then one doc-keyed agg. Bigrams ride an in-array
   * `zip_with(slice, slice)` — no self-join, no window, no position
   * shuffle. Every product is bits (≤64) × tf — no overflow path.
   */
  def bigramSurprise(df: DataFrame, lmDf: DataFrame, idCol: String,
                     textCol: String, backoffBits: Int = 2): DataFrame = {
    require(backoffBits >= 0 && backoffBits <= 16,
      s"bigramSurprise: backoffBits in [0, 16], got $backoffBits")
    def arrs(d: DataFrame, cols: Column*) = d.select(cols :+
      org.apache.spark.sql.functions.filter(
        split(Dedup.normText(col(textCol)), " "), t => length(t) > 0).as("ts"): _*)
    def bigrams(a: DataFrame, cols: Column*) = a.select(cols :+ explode(expr(
        """zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)),
          |         slice(ts, 2, greatest(size(ts) - 1, 0)),
          |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("bg"): _*)
      .select(cols :+ col("bg.w1") :+ col("bg.w2"): _*)
    // the LM: unigram counts, bigram counts, 1-row (N, V) totals
    val lmArr = arrs(lmDf)
    val c1 = lmArr.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val c2 = bigrams(lmArr)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val tot = c1.agg(sum(col("c1")).as("nn"), count(lit(1)).as("vv"))
    // scoring stream: first tokens under the smoothed unigram...
    val scoreArr = arrs(df, col(idCol))
    val first = scoreArr.filter(size(col("ts")) >= 1)
      .select(col(idCol), expr("ts[0]").as("tok"))
      .join(c1, Seq("tok"), "left")
      // reviewed 1-row totals broadcast (t23's shape)
      .crossJoin(broadcast(tot))
      .select(col(idCol),
        expr("CAST(length(bin((nn + vv) div (coalesce(c1, 0L) + 1))) AS BIGINT)")
          .as("bits"))
    // ...every later token under p(w2 | w1), backing off when unseen
    val rest = bigrams(scoreArr, col(idCol))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1.withColumnRenamed("tok", "w1").withColumnRenamed("c1", "c1w1"),
        Seq("w1"), "left")
      .join(c1.withColumnRenamed("tok", "w2").withColumnRenamed("c1", "c1w2"),
        Seq("w2"), "left")
      .crossJoin(broadcast(tot)) // reviewed 1-row totals broadcast
      .select(col(idCol),
        expr(s"""CAST(CASE WHEN c2 IS NOT NULL THEN length(bin(c1w1 div c2))
                 ELSE $backoffBits + length(bin((nn + vv) div (coalesce(c1w2, 0L) + 1)))
                 END AS BIGINT)""").as("bits"))
    val perDoc = first.unionByName(rest)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("bits")).as("lm_bits"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("lm_bits"), lit(0L)).as("lm_bits"),
        expr("CASE WHEN coalesce(n_toks, 0L) = 0 THEN 0L " +
          "ELSE (1000000 * lm_bits) div n_toks END").as("ppl_u"))
  }

  /**
   * Integer batch-perceptron trainer (t25) — the TRAINING half of the
   * quality-classifier story whose fixed-weight inference t19 ships:
   * learn per-bucket weights for a hashed bag-of-words linear
   * classifier from a labeled view, entirely in integer arithmetic so
   * the learned weights are a pure function of the input (no float
   * accumulation order, no learning-rate reals — the classic perceptron
   * update IS integer: w += Σ y·x over the misclassified set).
   *
   * Per epoch: score every doc (s = Σ w[bucket]·cnt), take the docs
   * with y·s <= 0 (misclassified — epoch 1 starts at w = 0, so it
   * reduces to the class-difference centroid), and add their y-weighted
   * feature counts into w. Output: the final nonzero weights
   * (bucket, w) — feed them to a t19-style scorer.
   *
   * Scale shape: the corpus collapses ONCE to the (id, y, bucket, cnt)
   * hashed bag (localCheckpointed, [[Clustering.kmeans]]'s loop
   * discipline); each epoch then costs one broadcast of the ≤`buckets`
   * weight frame into a doc-keyed score agg plus one id-keyed join for
   * the gradient — two corpus-bounded shuffles per epoch, never a
   * driver read. Hashing rides [[Hashing.oracleHash]] for cross-engine
   * grading; swap [[Hashing.fastHash]] in production.
   */
  def perceptronTrain(df: DataFrame, idCol: String, textCol: String,
                      labelWhere: Column, epochs: Int = 3,
                      buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"perceptronTrain: buckets must be >= 2, got $buckets")
    val x = df.select(col(idCol).as("id"),
        when(labelWhere, lit(1L)).otherwise(lit(-1L)).as("y"),
        explode(org.apache.spark.sql.functions.filter(
          split(Dedup.normText(col(textCol)), " "), t => length(t) > 0)).as("tok"))
      .withColumn("bucket", pmod(Hashing.oracleHash(col("tok")), lit(buckets.toLong)))
      .groupBy(col("id"), col("y"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // scanned once per epoch
    perceptronEpochs(x, epochs)
  }

  /** The feature-level integer perceptron loop shared by [[perceptronTrain]]
   *  (word features) and [[langIdTrain]] (char n-gram features): `x` is the
   *  hashed bag (id, y, bucket, cnt), ALREADY materialized (the caller owns
   *  the checkpoint — it may share one bag across several label columns).
   *  Per epoch: one broadcast of the ≤buckets weight frame into a doc-keyed
   *  score agg + one id-keyed gradient join; weights localCheckpoint per
   *  epoch (the iterative-trainer plan discipline). */
  private[graft] def perceptronEpochs(x: DataFrame, epochs: Int): DataFrame = {
    require(epochs >= 1 && epochs <= 16,
      s"perceptron: epochs must be in [1, 16], got $epochs")
    // epoch 1 at w = 0: every doc misclassified -> plain aggregate
    var w = x.groupBy(col("bucket")).agg(sum(col("y") * col("cnt")).as("w"))
      .localCheckpoint(true) // <= buckets rows; re-roots the per-epoch plan
    for (_ <- 2 to epochs) {
      val mis = x.join(broadcast(w), "bucket")
        .groupBy(col("id"), col("y"))
        .agg(sum(col("w") * col("cnt")).as("s"))
        .filter(col("y") * col("s") <= 0).select(col("id"))
      val grad = x.join(mis, "id")
        .groupBy(col("bucket")).agg(sum(col("y") * col("cnt")).as("g"))
      w = w.join(grad, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          (coalesce(col("w"), lit(0L)) + coalesce(col("g"), lit(0L))).as("w"))
        .localCheckpoint(true)
    }
    w.filter(col("w") =!= 0L).select(col("bucket"), col("w"))
  }

  /** Hashed char-TRIGRAM bag of a document view — the feature space of the
   *  trained language identifier: each word padded with spaces (so prefix/
   *  suffix trigrams carry the word-boundary signal that distinguishes
   *  morphology), trigrams hashed to `buckets`. ONE typed pass per doc —
   *  the Catalyst transform(sequence(...)) HOF this replaces is
   *  interpreted and pays a Column-eval md5 per trigram row, measured
   *  ~the whole cost of t35's training epochs at bench scale; here the
   *  per-doc bucket counts fold into a local array executor-side, so at
   *  most min(#trigrams, buckets) rows per doc reach the (id, bucket)
   *  exchange. Bit-parity: [[Hashing.jvmOracleHash]] mirrors
   *  [[Hashing.oracleHash]] exactly, and the t35 oracle re-derives the
   *  same trigrams relationally in DuckDB. Emits (id, bucket, cnt). */
  private[graft] def charTrigramBag(df: DataFrame, idCol: String, textCol: String,
                                    buckets: Int): DataFrame = {
    val spark0 = df.sparkSession
    import spark0.implicits._
    val b = buckets
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), Dedup.normText(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, t) =>
          val cnts = new Array[Long](b)
          t.split(" ", -1).foreach { tok =>
            if (tok.nonEmpty) {
              val p = " " + tok + " "
              var i = 0
              while (i + 3 <= p.length) {
                val bk = (Hashing.jvmOracleHash(md, p.substring(i, i + 3)) % b).toInt
                cnts(bk) += 1
                i += 1
              }
            }
          }
          Iterator.range(0, b).filter(cnts(_) > 0).map(k => (id, k.toLong, cnts(k)))
        }
      }.toDF("id", "bucket", "cnt")
      // docs can span partitions only via input splits; the keyed agg
      // merges per-split partials (sum of counts == the explode's count)
      .groupBy(col("id"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
  }

  /**
   * TRAINED language identifier (t35) — the learned upgrade of [[langId]]'s
   * stopword heuristic: one-vs-rest integer perceptrons per language over
   * hashed char-trigram features. Char n-grams are the classic langid
   * feature (they capture morphology — suffixes, digraphs — that survives
   * when no stopword matches), and the integer perceptron keeps the whole
   * training run a pure function of the corpus (t25's discipline), so the
   * learned weights are oracle-checkable.
   *
   * `langs` is the explicit label set (training is per-language; an
   * unlisted label trains nothing). Output: (lang, bucket, w) — feed to
   * [[langIdApply]].
   *
   * Scale shape: the corpus collapses ONCE to the hashed trigram bag
   * (localCheckpointed); every epoch is then ONE pass for ALL languages
   * — weights keyed (lang, bucket), per-doc labels expanded in-flight
   * against the broadcast |langs|-row frame, misclassification and
   * gradient computed for every language in a single keyed-join + two
   * keyed aggregations. The per-language loop this replaces ran
   * |langs| × epochs sequential Spark job rounds (the scheduling cost,
   * not the data volume, dominated it at bench scale); the one-pass
   * form is `epochs` rounds total and bit-identical — every quantity
   * is an order-free integer sum, so regrouping by (lang, bucket)
   * cannot change a single weight (MlSpec pins equality against the
   * per-language composition). Nothing scales superlinearly in the
   * corpus; the in-flight ×|langs| expansion never materializes.
   */
  def langIdTrain(df: DataFrame, idCol: String, textCol: String, langCol: String,
                  langs: Seq[String], epochs: Int = 2, buckets: Int = 512): DataFrame = {
    require(langs.nonEmpty, "langIdTrain: langs must be non-empty")
    require(langs.distinct.size == langs.size,
      s"langIdTrain: langs must be distinct, got ${langs.mkString(", ")}")
    require(epochs >= 1 && epochs <= 16,
      s"langIdTrain: epochs must be in [1, 16], got $epochs")
    val spark0 = df.sparkSession
    import spark0.implicits._
    val bag = charTrigramBag(df, idCol, textCol, buckets)
      .join(df.select(col(idCol).as("id"), col(langCol).as("__lang_")), Seq("id"))
      .localCheckpoint(true) // scanned once per epoch (not per lang-epoch)
    // one-vs-rest label expansion, derived lazily from the checkpointed
    // bag each epoch: |langs| is a tiny broadcast constant, so the
    // expansion is a narrow in-flight map — never a materialized ×|langs|
    // copy of the feature bag
    val lf = broadcast(langs.toDF("lang"))
    val xl = bag.crossJoin(lf)
      .select(col("id"), col("lang"),
        when(col("__lang_") === col("lang"), lit(1L)).otherwise(lit(-1L)).as("y"),
        col("bucket"), col("cnt"))
    // epoch 1 at w = 0: every (doc, lang) misclassified -> plain aggregate
    var w = xl.groupBy(col("lang"), col("bucket"))
      .agg(sum(col("y") * col("cnt")).as("w"))
      // LAZY cut (r17): <= langs*buckets rows; re-roots per epoch, but
      // every epoch materializes inside the caller's first action as one
      // job instead of one blocking driver-synchronized job per epoch
      .localCheckpoint(false)
    for (_ <- 2 to epochs) {
      val mis = xl.join(broadcast(w), Seq("lang", "bucket"))
        .groupBy(col("id"), col("lang"), col("y"))
        .agg(sum(col("w") * col("cnt")).as("s"))
        .filter(col("y") * col("s") <= 0).select(col("id"), col("lang"))
      val grad = xl.join(mis, Seq("id", "lang"))
        .groupBy(col("lang"), col("bucket")).agg(sum(col("y") * col("cnt")).as("g"))
      w = w.join(grad, Seq("lang", "bucket"), "full_outer")
        .select(col("lang"), col("bucket"),
          (coalesce(col("w"), lit(0L)) + coalesce(col("g"), lit(0L))).as("w"))
        .localCheckpoint(false) // lazy, same rationale as the init cut
    }
    w.filter(col("w") =!= 0L).select(col("lang"), col("bucket"), col("w"))
  }

  /** Inference for [[langIdTrain]]'s weights: score every doc against every
   *  language's weight vector (the ≤langs×buckets weight frame broadcasts;
   *  missing (doc, lang) scores count 0), predict the argmax with
   *  smallest-lang tie-break. Emits (id, lang_pred, score). */
  def langIdApply(df: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, buckets: Int = 512): DataFrame = {
    val bag = charTrigramBag(df, idCol, textCol, buckets)
    val scores = bag.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("id"), col("lang"))
      .agg(sum(col("w") * col("cnt")).as("s"))
    // zero-fill so a doc sharing no bucket with some language still
    // competes at score 0 (langs frame is tiny — broadcast)
    val langs = weights.select(col("lang")).distinct()
    val all = df.select(col(idCol).cast("long").as("id")).crossJoin(broadcast(langs))
      .join(scores, Seq("id", "lang"), "left")
      .select(col("id"), col("lang"), coalesce(col("s"), lit(0L)).as("s"))
    all.groupBy(col("id"))
      .agg(min_by(struct(col("lang"), col("s")), struct(-col("s"), col("lang"))).as("b"))
      .select(col("id"), col("b.lang").as("lang_pred"), col("b.s").as("score"))
  }

  /** (source, tok) term frequencies — the shared first stage of the
   * corpus-health operators below (one explode, map-side partial agg
   * into a vocab-sized frame). */
  private def sourceTf(df: DataFrame, sourceCol: String, textCol: String): DataFrame =
    df.select(col(sourceCol).as("source"),
        explode(org.apache.spark.sql.functions.filter(
          split(Dedup.normText(col(textCol)), " "), t => length(t) > 0)).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("tf"))

  /**
   * Zipf-decay fit per source (t27): least-squares slope of
   * bit-length(frequency) against bit-length(rank) over each source's
   * top-k vocabulary — the corpus-health number that catches a source
   * whose token distribution collapsed (boilerplate floods, dedup
   * misses, generator loops all flatten/steepen the Zipf line).
   *
   * Exactness: ranks come from [[graft.functions.SketchAggregates]]'
   * `graft_topk_pairs` (≤ k pairs per group per task — never a
   * per-source window), tie-broken by a 64-bit token surrogate. The
   * FIT is tie-order independent: only the multiset of selected tf
   * values enters the sums (ties have equal tf by definition, so any
   * tie order selects the same value multiset), which is why the
   * DuckDB oracle may rank with `ORDER BY tf DESC, tok` and still
   * match bit-for-bit. Both logs ride the exact `length(bin(x))`
   * floor-log2 (t23's idiom); the slope is emitted in NEGATED
   * micro-units (`decay_u` ≥ 0 — tf is non-increasing in rank, so the
   * covariance never flips sign) to keep every `div` on nonnegative
   * operands, where Spark and DuckDB integer division agree.
   *
   * Scale shape: one corpus scan into the vocab-sized tf frame, the
   * top-k aggregate, then arithmetic over ≤ k rows per source. With
   * k=256 and bit-length domains ≤ 64, every product is ≤ ~2^32 —
   * no overflow path at any corpus size.
   */
  def zipfFit(df: DataFrame, sourceCol: String = "source",
              textCol: String = "text", topK: Int = 256): DataFrame = {
    require(topK >= 4 && topK <= 100000, s"zipfFit: topK in [4, 100000], got $topK")
    val tf = sourceTf(df, sourceCol, textCol)
    val top = tf.groupBy(col("source"))
      .agg(graft.functions.SketchAggregates
        .topKPairs(col("tf"), Hashing.oracleHash(col("tok")), topK).as("pairs"))
    val pts = top.select(col("source"), posexplode(col("pairs")))
      .select(col("source"),
        expr("CAST(length(bin(pos + 1)) AS BIGINT)").as("x"),
        expr("CAST(length(bin(col.v)) AS BIGINT)").as("y"))
    pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n").as("n_ranks"),
        expr("""CASE WHEN n * sxx - sx * sx = 0 THEN 0
                ELSE (1000000 * (sx * sy - n * sxy)) div (n * sxx - sx * sx) END""")
          .as("decay_u"))
  }

  /**
   * Corpus drift per source (t28): cross-entropy of the NEW snapshot's
   * tokens under the OLD snapshot's unigram model vs under its own —
   * the monitoring number for "this source's distribution moved
   * between snapshots" (c19 diffs the rows; this scores the
   * distributional shift). Laplace-smoothed on the old side
   * (`(N_old + V_old) div (tf_old + 1)`) so unseen tokens cost the
   * old model its full tail mass instead of dividing by zero.
   *
   * Exact integer path end-to-end: both entropies are
   * `Σ tf_new · length(bin(total div tf))` (t23's bit-length log2),
   * and the summary ratio `ppl_ratio_u` divides two POSITIVE sums —
   * `div` never sees a negative operand. `drift_bits` (cross − self)
   * may legitimately go negative with floor-logs on near-identical
   * snapshots; it is emitted as a plain BIGINT difference, never
   * divided.
   *
   * Scale shape: two corpus scans into vocab-sized tf frames, a
   * (source, tok)-keyed left join between them, per-source totals as
   * a broadcast hash join back onto the vocab frame, one final
   * per-source agg. Linear in both snapshots; no window anywhere.
   */
  def corpusDrift(newDf: DataFrame, oldDf: DataFrame,
                  sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    val tfN = sourceTf(newDf, sourceCol, textCol)
    val tfO = sourceTf(oldDf, sourceCol, textCol)
      .withColumnRenamed("tf", "tf_old")
    val totN = tfN.groupBy(col("source")).agg(sum(col("tf")).as("nn"))
    val totO = tfO.groupBy(col("source"))
      .agg(sum(col("tf_old")).as("no"), count(lit(1)).as("vo"))
    val scored = tfN.join(tfO, Seq("source", "tok"), "left")
      .join(broadcast(totN), "source")
      .join(broadcast(totO), "source")
      .select(col("source"), col("tf"),
        expr("CAST(length(bin(nn div tf)) AS BIGINT)").as("b_self"),
        expr("CAST(length(bin((no + vo) div (coalesce(tf_old, 0) + 1))) AS BIGINT)")
          .as("b_cross"))
    scored.groupBy(col("source"))
      .agg(sum(col("tf")).as("n_toks"),
        sum(col("tf") * col("b_self")).as("bits_self"),
        sum(col("tf") * col("b_cross")).as("bits_cross"))
      .select(col("source"), col("n_toks"), col("bits_self"), col("bits_cross"),
        (col("bits_cross") - col("bits_self")).as("drift_bits"),
        // the 1e6 product exceeds Long once bits_cross > ~9.2e12 (a few
        // hundred GB of tokens) — DECIMAL(38,0) intermediate, div on
        // decimals is Spark's IntegralDivide and already returns BIGINT
        // (c12's idiom; the DuckDB oracle's SUM is HUGEINT natively)
        expr("""CAST(CASE WHEN bits_self = 0 THEN 0
                ELSE (1000000 * cast(bits_cross AS DECIMAL(38,0))) div bits_self
                END AS BIGINT)""").as("ppl_ratio_u"))
  }
}
