package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.RollingHashFunctions.rollingHash

/** Text-analysis operators over a document corpus (extension X3): token
  * counting, quality scoring, language identification, fingerprinting.
  *
  * Everything here is a deterministic, per-row column program built from
  * codegen'd built-ins (plus the [[graft.functions.RollingHash]]
  * expression) — no shuffle, no UDF closures, fully pushdown/prune
  * friendly: exactly the shape that scans 100 TB of text at I/O speed.
  * All heuristics are ASCII-regex based so the DuckDB oracle (RE2) and
  * Spark (java.util.regex) agree byte-for-byte.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column = Dedup.tokens(text)

  /** BPE-ish subword segmentation regex: letter runs, digit runs, single
    * punctuation marks — an ASCII approximation of GPT-style pre-tokenizer
    * classes (identical semantics under java.util.regex and RE2). */
  val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Per-document token statistics.
    * Output: doc_id, n_chars, ws_tokens, bpe_ish_tokens, est_tokens. */
  def tokenStats(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    // spreadToCores before the regex/tokenize kernels (here and in every
    // per-row scorer below): per-row deterministic, so safe at any
    // partitioning, and the kernel cost then scales with cores
    Parallelism.spreadToCores(docs).select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      size(tokens(col(textCol))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit(BpeIshPattern), lit(0)))
        .cast("long").as("bpe_ish_tokens"),
      ceil(length(col(textCol)) / lit(4.0)).cast("long").as("est_tokens"))

  /** Token-budget truncation (context-length capping for training
    * sequences): keep the first `maxTokens` whitespace tokens of each
    * document. The rebuilt text normalizes whitespace runs to single
    * spaces (slice + join — the canonicalization both engines express
    * identically); casing is preserved (the cut never lowercases).
    * Stateless per-row kernel: no shuffle, scales with cores. */
  def truncateTokens(docs: DataFrame, maxTokens: Int,
                     textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    Parallelism.spreadToCores(docs).select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      concat_ws(" ", slice(toks, 1, maxTokens)).as("text_trunc"),
      (size(toks) > maxTokens).as("truncated"))
  }

  /** Stopwords used by the quality score (top-frequency English words). */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "that", "it", "was")

  private def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(words.toArray), t)))

  /** The integer quality inputs via the fused single-pass
    * [[graft.functions.TextQualityStats]] kernel — the HOF formulation
    * re-tokenized the text once per referencing sub-expression (five
    * times per row: codegen CSE skips lambda-bearing HOFs), which was
    * the measured map-side cost of every quality-scored operator. */
  private[graft] def qualityStats(textCol: Column): Column =
    graft.functions.TextQualityStatsFunctions
      .qualityStats(textCol, EnglishStopwords)

  /** (n_tokens double, stop_ratio, punct_ratio) from the stats struct —
    * the identical double arithmetic (same casts, same op order) as the
    * HOF formulation, so scores are bit-identical ([[qualityColumnHof]]
    * is spec-pinned against this). */
  private def qualityParts(st: Column): (Column, Column, Column) = {
    val nTokens = st.getField("n_tokens").cast("double")
    val stopRatio = when(nTokens === 0d, 0d)
      .otherwise(st.getField("stop_hits").cast("double") / nTokens)
    val punctRatio = when(st.getField("n_chars") === 0, 0d)
      .otherwise(st.getField("punct_chars").cast("double") /
                 st.getField("n_chars").cast("double"))
    (nTokens, stopRatio, punctRatio)
  }

  private def qualityFromParts(nTokens: Column, stopRatio: Column,
                               punctRatio: Column): Column = {
    val lenScore = least(lit(1.0), nTokens / lit(100.0))
    val stopScore = least(lit(1.0), stopRatio * lit(5.0))
    round(lit(0.4) * lenScore + lit(0.4) * stopScore +
          lit(0.2) * (lit(1.0) - punctRatio), 6)
  }

  /** The quality heuristic as a single appendable column (streaming- and
    * join-free): 0.4·length-score + 0.4·stopword-score + 0.2·(1 −
    * punct-ratio), rounded to 6. One fused kernel pass per row. */
  def qualityColumn(textCol: Column): Column = {
    val (nTokens, stopRatio, punctRatio) = qualityParts(qualityStats(textCol))
    qualityFromParts(nTokens, stopRatio, punctRatio)
  }

  /** The pre-kernel HOF formulation — kept as the equality anchor
    * (QualityKernelSpec pins bit-identity on the fixture and on
    * adversarial strings). */
  private[graft] def qualityColumnHof(textCol: Column): Column = {
    val toks = tokens(textCol)
    val nTokens = size(toks).cast("double")
    val stopRatio = when(nTokens === 0d, 0d)
      .otherwise(stopwordCount(toks, EnglishStopwords).cast("double") / nTokens)
    val punct = length(textCol) -
      length(regexp_replace(textCol, "[^A-Za-z0-9\\s]", ""))
    val punctRatio = when(length(textCol) === 0, 0d)
      .otherwise(punct.cast("double") / length(textCol).cast("double"))
    val lenScore = least(lit(1.0), nTokens / lit(100.0))
    val stopScore = least(lit(1.0), stopRatio * lit(5.0))
    round(lit(0.4) * lenScore + lit(0.4) * stopScore +
          lit(0.2) * (lit(1.0) - punctRatio), 6)
  }

  /** Deterministic quality heuristic in [0,1]:
    * 0.4·length-score + 0.4·stopword-score + 0.2·(1 − punct-ratio).
    * Thresholding on it reproduces the classic "well-formed prose" filter
    * (length saturates at 100 tokens; stopword ratio saturates at 20%). */
  def qualityScore(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val st = qualityStats(col(textCol))
    val (nTokens, stopRatio, punctRatio) = qualityParts(st)
    Parallelism.spreadToCores(docs).select(
      col(idCol),
      st.getField("n_tokens").as("n_tokens"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      qualityFromParts(nTokens, stopRatio, punctRatio).as("quality"))
  }

  /** Gopher-style quality-rule evaluation (Rae et al. 2021 §A1.1 shape):
    * per-document structural signals — word count, mean word length,
    * symbol ratio, alphabetic-word ratio, and a repetition signal (the
    * fraction of within-document bigrams that are duplicates) — plus a
    * `passes` verdict from fixed thresholds. Everything is a per-row
    * column program over the token array (`array_distinct` gives the
    * repetition count without any shuffle), so the operator scans 100 TB
    * at I/O speed and the verdict column pushes down as a plain filter.
    * Thresholds compare the ROUNDED signals, so both engines decide from
    * identical doubles. */
  def gopherRules(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks).cast("long")
    val meanLen = when(nWords === 0L, 0d).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        nWords.cast("double"))
    val sym = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[^A-Za-z0-9\\s]", ""))
    val symRatio = when(length(col(textCol)) === 0, 0d)
      .otherwise(sym.cast("double") / length(col(textCol)).cast("double"))
    val alphaRatio = when(nWords === 0L, 0d).otherwise(
      size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
        nWords.cast("double"))
    // bigrams of the token array; sequence(1,0) would count DOWN, so
    // short docs short-circuit to an empty array
    val bigrams = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
    val nBi = size(bigrams).cast("long")
    val dupBiFrac = when(nBi === 0L, 0d).otherwise(
      (nBi - size(array_distinct(bigrams))).cast("double") / nBi.cast("double"))

    val out = Parallelism.spreadToCores(docs).select(
      col(idCol),
      nWords.as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(symRatio, 6).as("symbol_ratio"),
      round(alphaRatio, 6).as("alpha_word_ratio"),
      round(dupBiFrac, 6).as("dup_bigram_frac"))
    out.withColumn("passes",
      col("n_words").between(50L, 100000L) &&
        col("mean_word_len").between(3d, 10d) &&
        col("symbol_ratio") < 0.1 &&
        col("alpha_word_ratio") > 0.8 &&
        col("dup_bigram_frac") < 0.3)
  }

  /** Per-language marker words for the lang-ID heuristic (common
    * function words per language). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "was"),
    "es" -> Seq("el", "los", "las", "que", "y", "en", "un", "una", "por", "como"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "dans", "pour", "du", "au"),
    "zh" -> Nil) // no-space script: marker-word scoring never fires on ASCII

  /** Language-ID: score = marker-word occurrences per language; prediction
    * = argmax, ties broken by language code ascending (the CASE chain
    * order). A real pipeline swaps in character n-gram profiles; the
    * operator shape — per-row scoring, argmax, no shuffle — is identical. */
  def langId(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val scores = LangMarkers.map { case (lang, words) =>
      lang -> (if (words.isEmpty) lit(0L)
               else stopwordCount(toks, words).cast("long"))
    }
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
    Parallelism.spreadToCores(docs)
      .select(col(idCol) +: pred.as("lang_pred") +:
              scores.map { case (l, s) => s.as(s"score_$l") }: _*)
  }

  /** PII scrubbing patterns (ASCII regex — identical under java.util.regex
    * and RE2): emails, then long digit runs (phone/account numbers). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val DigitRunPattern = "[(]?[0-9][0-9 ().-]{6,}[0-9]"

  /** Replace emails and phone-like digit runs with placeholder tokens —
    * the standard pre-training scrub pass, pure map-side regex work. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      DigitRunPattern, "<PHONE>")

  /** Content fingerprints: exact md5 plus the rolling polynomial hash. */
  def fingerprints(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame =
    Parallelism.spreadToCores(docs).select(
      col(idCol),
      md5(col(textCol)).as("md5_fp"),
      rollingHash(col(textCol)).as("rolling_fp"))

  final case class TokenFreq(token: String, n: Long)
  final case class TokenTopBuf(items: List[TokenFreq])

  /** Map-side partial top-k over (token, count) pairs ordered by
    * (n desc, token asc) — the heavy-hitter analogue of the ANN
    * [[Similarity.TopK]] aggregator: each task emits at most k entries
    * per group, so the final per-group reduction never needs the whole
    * vocabulary co-located (a window-rank formulation puts every
    * (group, token) row of a group in ONE partition — fine until a group's
    * vocabulary is web-scale). */
  // Tie-break must be UTF-8 *byte* order (Spark/DuckDB binary collation),
  // not Java's UTF-16 code-unit order — they differ for supplementary
  // (non-BMP) characters, where UTF-16 surrogates sort below U+E000..FFFF.
  private def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  final class TopTokensAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[TokenFreq, TokenTopBuf, TokenTopBuf] {
    private def better(a: TokenFreq, b: TokenFreq): Boolean =
      a.n > b.n || (a.n == b.n && utf8Lt(a.token, b.token))
    private def insert(buf: List[TokenFreq], t: TokenFreq): List[TokenFreq] = {
      val (pre, post) = buf.span(better(_, t))
      val merged = pre ::: (t :: post)
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: TokenTopBuf = TokenTopBuf(Nil)
    override def reduce(b: TokenTopBuf, a: TokenFreq): TokenTopBuf =
      if (b.items.length >= k && !better(a, b.items.last)) b
      else TokenTopBuf(insert(b.items, a))
    override def merge(b1: TokenTopBuf, b2: TokenTopBuf): TokenTopBuf =
      TokenTopBuf(b2.items.foldLeft(b1.items)(insert))
    override def finish(r: TokenTopBuf): TokenTopBuf = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[TokenTopBuf] =
      org.apache.spark.sql.Encoders.product
    override def outputEncoder: org.apache.spark.sql.Encoder[TokenTopBuf] =
      org.apache.spark.sql.Encoders.product
  }

  /** Top-k most frequent tokens per group — the corpus heavy-hitter probe
    * (stopword discovery, boilerplate vocabulary, per-source drift).
    * One shuffle on (group, token) for the partial+final count, then the
    * per-group top-k via [[TopTokensAgg]]: the second shuffle moves at
    * most k rows per (group, partition), never the group's whole
    * vocabulary to one task. Tie-break (count desc, token asc) is total,
    * so the result is deterministic and oracle-comparable. */
  def topTokens(docs: DataFrame, k: Int = 10, groupCol: String = "source",
                textCol: String = "text"): DataFrame = {
    val topk = udaf(new TopTokensAgg(k))
    Parallelism.spreadToCores(docs)
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(groupCol))
      .agg(topk(col("token"), col("n")).as("top"))
      .select(col(groupCol), posexplode(col("top.items")).as(Seq("pos", "t")))
      .select(col(groupCol), col("t.token").as("token"), col("t.n").as("n"),
              (col("pos") + 1).cast("long").as("rank"))
  }

  final case class MGSketch(items: Map[String, Long])

  /** Misra-Gries heavy-hitter sketch over a token stream: at most
    * `capacity` counters, mergeable (Agarwal et al.'s subtract-the-
    * (m+1)-th-count merge preserves the bound). Guarantees: every token
    * with true count > N/(capacity+1) is present in the final sketch
    * (N = tokens processed), and estimates undercount by at most
    * N/(capacity+1). Memory is O(capacity) per (group, partition)
    * regardless of vocabulary size — the regime where the exact
    * (group, token) count aggregation's hash table (and its shuffle of
    * per-partition vocabulary partials) no longer fits. */
  final class MisraGriesAgg(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, MGSketch, MGSketch] {
    override def zero: MGSketch = MGSketch(Map.empty)
    override def reduce(b: MGSketch, t: String): MGSketch =
      b.items.get(t) match {
        case Some(n)                         => MGSketch(b.items.updated(t, n + 1))
        case None if b.items.size < capacity => MGSketch(b.items.updated(t, 1L))
        case None =>
          // classic MG overflow: decrement every counter (the unseen
          // token's single unit cancels against them), drop zeros.
          // Amortized O(N) overall: each pass removes `capacity` units
          // and at most N units ever enter.
          MGSketch(b.items.collect { case (k, n) if n > 1 => k -> (n - 1) })
      }
    override def merge(b1: MGSketch, b2: MGSketch): MGSketch = {
      val sum = b1.items.foldLeft(b2.items) { case (acc, (k, n)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + n)
      }
      if (sum.size <= capacity) MGSketch(sum)
      else {
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        MGSketch(sum.collect { case (k, n) if n > cut => k -> (n - cut) })
      }
    }
    override def finish(r: MGSketch): MGSketch = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[MGSketch] =
      org.apache.spark.sql.Encoders.product
    override def outputEncoder: org.apache.spark.sql.Encoder[MGSketch] =
      org.apache.spark.sql.Encoders.product
  }

  /** Bounded-memory top-k tokens per group via [[MisraGriesAgg]] — the
    * vocabulary-larger-than-memory variant of [[topTokens]]. The sketch
    * pass shuffles only O(capacity) counters per (group, partition); the
    * surviving candidates (≤ capacity per group) are then recounted
    * EXACTLY in a second pass whose shuffle is candidate-bounded (the
    * corpus rows are filtered by a broadcast semi-join first), so the
    * emitted counts and ranks are exact, not estimates. `heavy_guaranteed`
    * certifies per row that its exact count clears the sketch's
    * N/(capacity+1) containment threshold — when true for the k-th row,
    * the MG guarantee makes this output identical to the exact [[topTokens]]
    * (which is therefore its oracle, TRUE literals included). */
  def topTokensSketch(docs: DataFrame, k: Int = 10, capacity: Int = 256,
                      groupCol: String = "source",
                      textCol: String = "text"): DataFrame = {
    val mg = udaf(new MisraGriesAgg(capacity))
    val topk = udaf(new TopTokensAgg(k))
    // spread is output-safe here despite the merge-order-dependent
    // sketch state: the sketch only PROPOSES candidates, counts are
    // exact, and every token above the N/(capacity+1) heaviness bound
    // survives any merge order — so whenever the true top-k are heavy
    // (the operating contract, asserted by the oracle's
    // heavy_guaranteed column) the ranked output is identical under any
    // partitioning; extra light candidates can only rank below
    val toks = Parallelism.spreadToCores(docs)
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
    val sketches = toks.groupBy(col(groupCol))
      .agg(mg(col("token")).as("sk"), count(lit(1)).as("n_total"))
    val candidates = sketches
      .select(col(groupCol), col("n_total"),
              explode(map_keys(col("sk.items"))).as("token"))
    // inner join (not semi): n_total rides along with each candidate
    // token, so the sketch subtree is referenced exactly once — a second
    // reference (the old trailing join back to `sketches`) re-ran the
    // corpus-wide tokenize + MG aggregation to fetch one column
    toks
      .join(broadcast(candidates), Seq(groupCol, "token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n"), max(col("n_total")).as("n_total"))
      .groupBy(col(groupCol))
      .agg(topk(col("token"), col("n")).as("top"),
           max(col("n_total")).as("n_total"))
      .select(col(groupCol), col("n_total"),
              posexplode(col("top.items")).as(Seq("pos", "t")))
      .select(col(groupCol), col("t.token").as("token"), col("t.n").as("n"),
              (col("pos") + 1).cast("long").as("rank"),
              (col("t.n") * (capacity + 1) > col("n_total")).as("heavy_guaranteed"))
  }

  /** The window-rank formulation — kept for the equivalence spec; the
    * aggregator path above is the scale shape. */
  def topTokensWindow(docs: DataFrame, k: Int = 10, groupCol: String = "source",
                      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n").desc, col("token").asc)
    Parallelism.spreadToCores(docs)
      .select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Corpus-level statistics per group: document count, total whitespace
    * tokens (fused [[graft.functions.TokenCount]] kernel), average char
    * length. One partial+final hash aggregate — group cardinality, not
    * corpus size, bounds the exchange. */
  def corpusStats(docs: DataFrame, groupCol: String = "source",
                  textCol: String = "text"): DataFrame = {
    import graft.functions.HashedShinglesFunctions.tokenCount
    // spread is determinism-safe: both aggregates are integer-valued
    // (long sum; avg's double buffer sums integer lengths, and integer
    // sums below 2^53 are exact in double at ANY merge order, so the
    // single final division is bit-stable under any partitioning)
    Parallelism.spreadToCores(docs).groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
           sum(tokenCount(col(textCol))).as("total_tokens"),
           round(avg(length(col(textCol))), 4).as("avg_chars"))
  }

  /** Corpus-unigram average log-probability per document — the language-
    * model-flavoured quality signal ("how typical of this corpus is this
    * text"): p(t) = count(t)/N over the whole corpus, and each document
    * scores avg over its tokens of ln p(token). Out-of-vocabulary tokens
    * cannot exist (the model IS the corpus), so no smoothing term.
    * Per-token log-probs round to 6 decimals before averaging and the
    * average rounds to 4 — the same two-stage rounding that keeps every
    * other ln/avg operator engine-agreed (an unrounded avg differs in
    * the last ulp across partition merge orders).
    *
    * Scale shape: token counts (one token-keyed shuffle, vocabulary-sized
    * result joined back token-keyed, never broadcast), the corpus total
    * as a broadcast single row, and a per-document aggregate. */
  def unigramLogProb(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val terms = Parallelism.spreadToCores(docs)
      .select(col(idCol).cast("long").as("doc_id"),
              explode(tokens(col(textCol))).as("token"))
    val cnt = terms.groupBy("token").agg(count(lit(1)).as("c"))
    val total = cnt.agg(sum("c").as("total"))
    terms.join(cnt, "token")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
              round(log(col("c") / col("total")), 6).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
           round(avg(col("lp")), 4).as("avg_logprob"))
  }

  /** TF-IDF keyword extraction: the top-`k` terms of each document by
    * `tf · ln(N / df)`, where tf is the term's in-document count, df the
    * number of documents containing it, and N the number of non-empty
    * documents. Scores are rounded to 6 decimals BEFORE ranking so the
    * (score desc, token asc) order is reproducible across engines —
    * `ln` is correctly-rounded nowhere, and an unrounded sort could flip
    * rank on a last-ulp disagreement between JVM and oracle libm.
    *
    * Scale shape: three key-partitioned shuffles — tf on (doc, token),
    * df on token (joined back token-keyed: the vocabulary can be
    * hundreds of millions of terms on web-scale text, so it is NOT
    * broadcast), and the per-document top-k window on doc_id. Only N, a
    * single row, is broadcast. Nothing is corpus-cardinality on the
    * driver. */
  def tfIdf(docs: DataFrame, k: Int = 5, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val scored = tfIdfScored(docs, textCol, idCol)
    // per-doc top-k via the partial aggregator, NOT a window rank: the
    // window shuffles every (doc, term) row to its doc partition and
    // SORTS whole partitions; the aggregator's map-side partials emit at
    // most k entries per (doc, partition) and the (score desc, token
    // asc) order is total (scores pre-rounded), so the result row set is
    // identical to the window formulation (spec-pinned)
    val topk = udaf(new TfIdfTopKAgg(k))
    scored
      .groupBy(col("doc_id"))
      .agg(topk(col("token"), col("tf"), col("df"), col("tf_idf")).as("top"))
      .select(col("doc_id"), posexplode(col("top.items")).as(Seq("pos", "t")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rank"),
              col("t.token").as("token"), col("t.tf").as("tf"),
              col("t.df").as("df"), col("t.tf_idf").as("tf_idf"))
  }

  /** Shared scoring stage: (doc_id, token, tf, df, tf_idf-rounded-6). */
  private def tfIdfScored(docs: DataFrame, textCol: String,
                          idCol: String): DataFrame = {
    val terms = Parallelism.spreadToCores(docs)
      .select(col(idCol).cast("long").as("doc_id"),
              explode(tokens(col(textCol))).as("token"))
    val tf = terms.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = tf.select("doc_id").distinct().agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tf_idf",
        round(col("tf") * log(col("n_docs") / col("df")), 6))
  }

  /** The window-rank formulation — kept as the equality anchor for the
    * aggregator path (same total order, so identical rows). */
  private[graft] def tfIdfWindow(docs: DataFrame, k: Int = 5,
                                 textCol: String = "text",
                                 idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tf_idf").desc, col("token").asc)
    tfIdfScored(docs, textCol, idCol)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"),
              col("tf"), col("df"), col("tf_idf"))
  }

  final case class TfIdfEntry(token: String, tf: Long, df: Long, tf_idf: Double)
  final case class TfIdfTopBuf(items: List[TfIdfEntry])

  /** Map-side partial per-doc top-k over scored terms, ordered by
    * (tf_idf desc, token asc) — [[TopTokensAgg]]'s shape for the TF-IDF
    * record. The order is total because scores are pre-rounded and the
    * token tie-break is byte order. */
  final class TfIdfTopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[TfIdfEntry, TfIdfTopBuf, TfIdfTopBuf] {
    private def better(a: TfIdfEntry, b: TfIdfEntry): Boolean =
      a.tf_idf > b.tf_idf || (a.tf_idf == b.tf_idf && utf8Lt(a.token, b.token))
    private def insert(buf: List[TfIdfEntry], t: TfIdfEntry): List[TfIdfEntry] = {
      val (pre, post) = buf.span(better(_, t))
      val merged = pre ::: (t :: post)
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: TfIdfTopBuf = TfIdfTopBuf(Nil)
    override def reduce(b: TfIdfTopBuf, a: TfIdfEntry): TfIdfTopBuf =
      if (b.items.length >= k && !better(a, b.items.last)) b
      else TfIdfTopBuf(insert(b.items, a))
    override def merge(b1: TfIdfTopBuf, b2: TfIdfTopBuf): TfIdfTopBuf =
      TfIdfTopBuf(b2.items.foldLeft(b1.items)(insert))
    override def finish(r: TfIdfTopBuf): TfIdfTopBuf = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[TfIdfTopBuf] =
      org.apache.spark.sql.Encoders.product
    override def outputEncoder: org.apache.spark.sql.Encoder[TfIdfTopBuf] =
      org.apache.spark.sql.Encoders.product
  }
}
