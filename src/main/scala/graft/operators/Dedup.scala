package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.ArrayJaccardFunctions.sortedJaccard
import graft.functions.SimHashFunctions.simhash64
import graft.functions.SketchFunctions.minHashSketch
import graft.functions.VectorFunctions.cosineSim

/** Deduplication operators over a document corpus — the extension surface a
  * training-data pipeline needs (X1 + near-dup variants).
  *
  * Scale design:
  *  - every variant is *blocked*: candidate pairs come from an equi-join on
  *    a deterministic key (exact hash, MinHash band bucket, SimHash chunk,
  *    source block), never from an unblocked cross product — the only shape
  *    that survives 10⁹ documents;
  *  - signature computation (shingles → MinHash sketch, SimHash bits) is
  *    pure map-side column work (codegen'd built-ins + the SimHash
  *    expression), no shuffle until the bucket join;
  *  - verification (exact Jaccard / cosine) runs only on bucket-collided
  *    candidates.
  */
object Dedup {

  // ------------------------------------------------------------ tokenizing

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** [[tokens]], null-safe: a NULL field tokenizes to the EMPTY array
    * (doc length 0, no postings) instead of null — whose `size` is -1
    * under Spark's default legacy sizeOfNull, which would contribute
    * -1 to every weighted length sum. Single-field paths were immune
    * (null text yields no posting rows and the dl>0 stats filter drops
    * it); MULTI-field scoring makes a null field a realistic input (a
    * document with a body but no title), so every fielded path
    * tokenizes through this. */
  def tokensNs(text: Column): Column =
    coalesce(tokens(text), array().cast("array<string>"))

  /** Distinct word n-gram shingles (space-joined); empty array when the
    * document has fewer than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val cnt = size(toks) - lit(n - 1)
    when(cnt <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), cnt), i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** |A ∩ B| / |A ∪ B| over distinct-element arrays, in double precision.
    * Reference formulation — exact but pays a per-pair hash-set build;
    * the hot paths use [[hashedShingles]] + the merge-based
    * `sorted_jaccard` kernel instead. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0d, 0d).otherwise(inter / union)
  }

  /** Shingle set as a sorted distinct `array<long>` of shingle hashes —
    * one fused kernel call per document ([[graft.functions.HashedShingles]])
    * so each candidate pair verifies with a linear merge over longs
    * instead of string-set operations. Jaccard is preserved up to a
    * ~2⁻⁶⁴-per-element hash-collision (immaterial). */
  def hashedShingles(text: Column, n: Int): Column =
    graft.functions.HashedShinglesFunctions.hashedShingles(text, n)

  // ------------------------------------------------------------ X1: exact

  /** Exact dedup: canonical representative = min(id) per identical key.
    * One shuffle on the group key; deterministic. */
  def exactByText(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), md5(col(textCol)).as("fingerprint"), col("n_copies"))

  // ------------------------------------------------- exact n-gram Jaccard

  /** Exact n-gram Jaccard near-dup pairs within a blocking key (e.g. the
    * `source` column): all same-block pairs with Jaccard ≥ threshold.
    *
    * Candidate generation is LOSSLESS prefix filtering (the PPJoin-family
    * bound), not all pairs in the block: J(A,B) ≥ t forces
    * |A∩B| ≥ ⌈t·|A|⌉, so the smallest shared shingle (in the global
    * numeric order [[hashedShingles]] already sorts by) cannot hide in
    * A's last ⌈t·|A|⌉−1 positions — it sits inside A's first
    * |A| − ⌈t·|A|⌉ + 1 elements, and symmetrically inside B's prefix.
    * Candidates are therefore the same-block pairs sharing ≥ 1 *prefix*
    * shingle — a shingle-keyed equi-join whose size tracks shingle
    * collisions, not (docs/block)². The sf1 probe measured the all-pairs
    * form at 117 s for 2500 docs/block (71× the sf0.1 time: quadratic);
    * this form converts that into an equi-join + candidate-sized verify
    * with BIT-IDENTICAL output (the bound is a theorem, not a heuristic;
    * equality spec-pinned against the all-pairs form). */
  def ngramJaccardPairs(docs: DataFrame, blockCol: String, threshold: Double,
                        n: Int = 3, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    // the prefix lemma needs t ∈ (0, 1]: at t = 0 the "≥1 shared shingle"
    // candidate requirement is no longer implied (zero-overlap pairs
    // qualify), and t > 1 makes the prefix length negative
    require(threshold > 0.0 && threshold <= 1.0,
            s"jaccard threshold must be in (0, 1], got $threshold")
    // respread BEFORE the shingle kernel: the exchange carries raw text
    // (cheap), and shingling — the dominant map cost — then runs on every
    // core instead of inside the corpus' single scan split; all three
    // consumers below (both join sides, the verify fetch) share the one
    // exchange (ReusedExchange)
    val withSh = Parallelism.spreadToCores(docs.select(
        col(blockCol).as("block"), col(idCol).as("id"),
        col(textCol).as("__t")))
      .select(col("block"), col("id"),
        hashedShingles(col("__t"), n).as("sh"))
    val prefixLen =
      (size(col("sh")) - ceil(size(col("sh")) * lit(threshold)) + 1).cast("int")
    val pref = withSh.select(col("block"), col("id"),
      explode(slice(col("sh"), lit(1), prefixLen)).as("p"))
    val cand = pref.as("l")
      .join(pref.as("r"),
            col("l.block") === col("r.block") && col("l.p") === col("r.p") &&
              col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val shById = withSh.select(col("id"), col("sh"))
    cand
      .join(shById.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shById.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
              sortedJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The all-pairs-in-block formulation — kept as the equality anchor for
    * the prefix-filtered default (and as the honest baseline the sf1
    * probe measured quadratic). */
  def ngramJaccardPairsAllPairs(docs: DataFrame, blockCol: String,
                                threshold: Double, n: Int = 3,
                                textCol: String = "text",
                                idCol: String = "doc_id"): DataFrame = {
    val withSh = docs.select(
      col(blockCol).as("block"), col(idCol).as("id"),
      hashedShingles(col(textCol), n).as("sh"))
    val l = withSh.as("l")
    val r = withSh.as("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              sortedJaccard(col("l.sh"), col("r.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------------- MinHash + LSH

  /** MinHash sketch over hashed shingles — fused single-pass kernel
    * ([[graft.functions.MinHashSketch]]): all hash lanes update per
    * element in one loop, map-side only. (A `transform`-per-lane HOF
    * formulation evaluates interpreted lambdas numHashes times per doc —
    * measured 18s vs ~1s at sf0.1.) */
  def minHashSignature(sh: Column, numHashes: Int): Column =
    minHashSketch(sh, numHashes)

  /** Near-dup pairs via MinHash banding: signature split into `bands`
    * bands of `rowsPerBand` hashes; docs sharing any band bucket become
    * candidates; candidates are verified with exact Jaccard ≥ threshold.
    *
    * Probability a pair with true Jaccard j collides: 1-(1-j^r)^b —
    * with 16×4 defaults, j=0.5 → 0.65, j=0.8 → 0.9996, j=0.3 → 0.12:
    * sharp threshold around ~0.5.
    *
    * Shuffle shape (the reason this is the 100 TB path): the band join
    * moves only compact `(id, band, bucket)` triples — `bands` rows of
    * three longs per document. The hashed-shingle arrays needed for
    * exact verification are recomputed ONLY for documents that appear in
    * some candidate pair (a semi-join of the corpus against the deduped
    * candidate id set — proportional to true-dup density, not corpus
    * size) and joined onto the pairs, so shingle arrays never ride the
    * band join and the full corpus is shingled exactly once (for the
    * signatures). */
  def minHashPairs(docs: DataFrame, threshold: Double,
                   numHashes: Int = 64, bands: Int = 16,
                   n: Int = 3, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // respread before the shingle + signature kernels (the dominant map
    // cost), shared by the signature and verify branches
    val base = Parallelism.spreadToCores(
      docs.select(col(idCol).as("id"), col(textCol).as("__text")))
    val sigs = base
      .select(col("id"), hashedShingles(col("__text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
      .select(col("id"),
        posexplode(array((0 until bands).map { b =>
          xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
        }: _*)).as(Seq("band", "bucket")))
    val cand = sigs.as("l").join(sigs.as("r"),
        col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val candIds = cand.select(col("id_a").as("id"))
      .union(cand.select(col("id_b").as("id")))
      .distinct()
    val candSh = base.join(candIds, "id")
      .select(col("id"), hashedShingles(col("__text"), n).as("sh"))
    cand
      .join(candSh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(candSh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
              sortedJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The pre-rejoin formulation: shingle arrays ride every exploded band
    * row through the bucket join and verify in place. Fewer joins, but
    * the shuffle payload scales with `bands × document length` — kept for
    * the equivalence spec and as the honest baseline the re-join variant
    * is measured against. */
  def minHashPairsInline(docs: DataFrame, threshold: Double,
                         numHashes: Int = 64, bands: Int = 16,
                         n: Int = 3, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = docs.select(
        col(idCol).as("id"), hashedShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
      .select(col("id"), col("sh"),
        posexplode(array((0 until bands).map { b =>
          xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
        }: _*)).as(Seq("band", "bucket")))
    val l = sigs.as("l")
    val r = sigs.as("r")
    l.join(r, col("l.band") === col("r.band") &&
              col("l.bucket") === col("r.bucket") &&
              col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              col("l.sh").as("sh_a"), col("r.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
              sortedJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------ repeated-span dedup

  /** Repeated n-token spans: every distinct n-gram appearing in at least
    * `minDocs` distinct documents, with its document frequency — the
    * substring-level counterpart of document dedup (boilerplate headers,
    * license blocks, templated paragraphs survive document-level dedup
    * and surface here).
    *
    * Precondition: one row per document (`idCol` unique) — the corpus
    * contract every operator in this file shares. Under that contract
    * count(*) below IS the distinct-document count; a frame with
    * duplicated ids (e.g. unioned shards) must be deduplicated by id
    * first or the counts overstate document frequency.
    *
    * Shape: one explode (`spans × docs` rows of one string + one id) and
    * one shuffle on the span key with map-side partial aggregation; the
    * HAVING filter drops the unique-span long tail before any further
    * processing. At 100 TB the span string would be replaced by its
    * 64-bit hash for the shuffle (same FNV kernel as the shingle path) —
    * kept as the raw string here so the output is directly actionable
    * (and the DuckDB oracle stays plain SQL). */
  def repeatedSpans(docs: DataFrame, n: Int = 10, minDocs: Int = 2,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    // spreadToCores: span construction dominates (see below) and must
    // scale with cores, not with the scan's split count
    Parallelism.spreadToCores(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__t")))
      .select(col("doc_id"),
              explode(graft.functions.HashedShinglesFunctions
                .stringShingles(col("__t"), n)).as("span"))
      // Span construction is the fused StringShingles kernel (one pass,
      // no per-shingle lambda/slice allocations — the HOF formulation was
      // the dominant cost at sf0.1). Per-doc spans are distinct by
      // construction, so count(*) IS the distinct-doc count; countDistinct
      // would plan a second aggregate + exchange (expand on
      // (span, doc_id)): one avoidable full shuffle at 100 TB.
      //
      // A two-phase variant (count xxhash64(span) first, re-join strings
      // for the repeated set) was measured 2.4× SLOWER at sf0.1: span
      // construction, not the aggregation, dominates, and phase 2 pays it
      // twice. Worth revisiting only when the shuffle is the bottleneck
      // (extreme corpus sizes) — see SCALE_NOTES.md.
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  // ------------------------------------------------------ decontamination

  /** Benchmark decontamination: drop every document sharing at least one
    * n-token span with the `benchmark` frame — the train/test-overlap
    * removal step of a pre-training pipeline (documents quoting an eval
    * set must not be trained on, however little else they share; a
    * Jaccard threshold would miss them).
    *
    * Shape: benchmark spans are distinct-collapsed (tiny versus the
    * corpus — eval sets are small by nature) so the span equi-join
    * broadcasts; contaminated ids then anti-join the corpus. Both joins
    * key on span strings here for oracle portability; at extreme scale
    * key on the 64-bit span hash (`HashedShingles`) instead. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    import graft.functions.HashedShinglesFunctions.stringShingles
    val benchSpans = benchmark
      .select(explode(stringShingles(col(textCol), n)).as("span"))
      .distinct()
    val contaminated = Parallelism.spreadToCores(docs)
      .select(col(idCol), explode(stringShingles(col(textCol), n)).as("span"))
      .join(benchSpans, "span")
      .select(col(idCol))
      .distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Edit-distance (typo-level) near-dup pairs: same-block document
    * pairs with Levenshtein distance ≤ maxDist — the character-level
    * complement of the token-level Jaccard/MinHash family (catches
    * OCR noise, near-identical boilerplate, single-field template
    * fills that re-tokenize differently).
    *
    * Blocking is lossless for the threshold: |len(a) − len(b)| ≤ d is
    * necessary for lev ≤ d, so each doc lands in length buckets
    * ⌊len/d⌋ and ⌊len/d⌋+1 and candidates come from a (block, bucket)
    * equi-join — adjacent-bucket pairs are covered by the +1 emission,
    * distance-incompatible lengths never meet. The O(len·d)-per-pair
    * verify (both engines' `levenshtein` is the standard integer DP —
    * oracle-exact) runs only on bucket collisions.
    *
    * OPERATING REGIME — tight thresholds only (d ≪ document length:
    * typos, OCR noise, single-field template fills). At loose d the
    * blocking and counting filters are still lossless but stop
    * discriminating (wide length bands, shared-vocabulary histograms),
    * and the within-block self-join degrades toward Θ(n²/blocks) —
    * measured as the dominant cost of an entire benchmark suite before
    * this guard existed. Loose near-dup belongs to [[minHashLsh]] /
    * [[simHashPairs]] / [[jaccardPairs]], whose candidate counts stay
    * bounded by construction. The guard compares d against the median
    * document length (one cheap bounded-domain histogram pass —
    * negligible next to the pair join it protects) and throws unless
    * `allowLooseThreshold = true` is passed explicitly. */
  def levenshteinPairs(docs: DataFrame, maxDist: Int,
                       blockCol: String = "source",
                       textCol: String = "text",
                       idCol: String = "doc_id",
                       allowLooseThreshold: Boolean = false): DataFrame = {
    require(maxDist > 0, "maxDist must be positive")
    // guard only non-empty corpora: the median is undefined on an empty
    // frame (percentileByHistogram throws), and the pair join it protects
    // is vacuously empty anyway
    if (!allowLooseThreshold && !docs.isEmpty) {
      val medianLen = Profiling.percentileByHistogram(
        docs.select(length(col(textCol)).as("len")), "len", 0.5)
      require(20L * maxDist <= medianLen,
        s"maxDist=$maxDist is loose for this corpus (median document length " +
        s"$medianLen chars): length-band blocking and the counting filter stop " +
        "discriminating and the within-block self-join degrades toward O(n²). " +
        "Edit-distance dedup is the tight-threshold (d ≪ len) tool — use " +
        "minHashLsh or simHashPairs for loose near-dup, or pass " +
        "allowLooseThreshold = true to force this operating point.")
    }
    // respread before the histogram kernel (see the join comment below)
    val base = Parallelism.spreadToCores(
        docs.select(col(blockCol).as("block"), col(idCol).as("id"),
                    col(textCol).as("t")))
      .select(col("block"), col("id"), col("t"),
              graft.functions.CharHistFunctions.charHist(col("t")).as("h"),
              (length(col("t")).cast("long") / maxDist)
                .cast("long").as("lb"))
      .select(col("block"), col("id"), col("t"), col("h"),
              explode(array(col("lb"), col("lb") + 1)).as("bucket"))
    // lossless counting filter (1-gram, Gravano-style): one edit moves at
    // most two histogram bins by one, so lev ≥ L1(hists)/2. The fused
    // `hist_l1` kernel matters: the aggregate(zip_with) HOF form runs
    // INTERPRETED with per-row allocation and was itself the sf1
    // bottleneck on the ~50M-candidate join
    val l1 = graft.functions.CharHistFunctions.histL1(col("l.h"), col("r.h"))
    // cheap-first conjunct order: id< / length-diff must short-circuit
    // ahead of the O(alphabet) histogram kernel (conjuncts evaluate in
    // written order — pushed-filter order put hist_l1 before id<,
    // doubling its evals across pair orderings); base is pre-spread so
    // collision checks and DP verifies use every core
    base.as("l")
      .join(base.as("r"),
        col("l.block") === col("r.block") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id") &&
        abs(length(col("l.t")) - length(col("r.t"))) <= maxDist &&
        l1 <= 2L * maxDist)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              col("l.t").as("ta"), col("r.t").as("tb"))
      .dropDuplicates("id_a", "id_b")
      // thresholded levenshtein: banded O(len·d) DP with early exit
      // (returns -1 above the threshold), only on counting-filter
      // survivors
      .select(col("id_a"), col("id_b"),
              levenshtein(col("ta"), col("tb"), maxDist).cast("long").as("distance"))
      .filter(col("distance") >= 0)
  }

  /** Incremental ingest dedup: drop arriving documents whose exact text
    * already exists in the `seen` corpus — the every-batch shape of a
    * growing 100 TB corpus (full-corpus re-dedup per batch is the thing
    * this avoids).
    *
    * Matches on md5(text), computed map-side on BOTH frames, so the
    * anti-join moves 16-byte fingerprints, never document bodies; the
    * historical side is distinct-collapsed first (at scale it IS the
    * stored fingerprint index — pass a pre-fingerprinted frame with a
    * `text` column or adapt upstream). Composes with the streaming path:
    * [[graft.streaming.DocumentStreams.dedupNormalized]] handles
    * within-stream dups, this handles against-history. */
  def dedupAgainst(docs: DataFrame, seen: DataFrame,
                   textCol: String = "text"): DataFrame = {
    val seenFp = seen.select(md5(col(textCol)).as("__fp")).distinct()
    docs.join(seenFp, md5(col(textCol)) === col("__fp"), "left_anti")
  }

  /** Near-dup incremental ingest dedup — [[dedupAgainst]]'s MinHash-LSH
    * sibling: drop arriving documents whose n-gram Jaccard similarity to
    * ANY document of the `seen` corpus reaches `threshold`. Candidates
    * come from the same banded MinHash signatures as [[minHashPairs]]
    * (recall follows the LSH OR-of-ANDs curve at the numHashes/bands
    * operating point); every candidate is verified with the exact
    * sorted-shingle Jaccard before it can drop a document, so a spurious
    * band collision never costs a document.
    *
    * This is the every-batch shape of near-dup dedup on a growing
    * corpus: exact [[dedupAgainst]] only catches byte-identical
    * re-ingests, and re-running [[minHashPairs]] over history ∪ batch
    * re-pays the whole corpus each batch. Here the history side
    * contributes its (band, bucket) signature rows — `bands` 8-byte
    * bucket hashes per stored doc, the index a 100 TB pipeline would
    * persist instead of recomputing — and shingle re-joins for the exact
    * verify touch only CANDIDATE docs on both sides, so per-batch cost
    * scales with the batch and its collision set, not with history.
    *
    * Documents shorter than n tokens have no shingles, hence no
    * signature, and are always kept — the [[minHashPairs]] contract. A
    * batch doc byte-identical to a shingled history doc IS dropped
    * (Jaccard 1), so on shingled docs this strictly subsumes
    * [[dedupAgainst]]. */
  def minHashLshAgainst(docs: DataFrame, seen: DataFrame, threshold: Double,
                        numHashes: Int = 64, bands: Int = 16, n: Int = 3,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val rowsPerBand = numHashes / bands
    def bandRows(df: DataFrame, side: String): DataFrame = df
      .select(col(idCol).as(side), hashedShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
      .select(col(side),
        posexplode(array((0 until bands).map { b =>
          xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
        }: _*)).as(Seq("band", "bucket")))
      .select(col(side), col("band"), col("bucket"))
    val cand = bandRows(docs, "id_new")
      .join(bandRows(seen, "id_seen"), Seq("band", "bucket"))
      .select(col("id_new"), col("id_seen"))
      .dropDuplicates("id_new", "id_seen")
    val newSh = docs
      .join(cand.select(col("id_new").as(idCol)).distinct(), Seq(idCol))
      .select(col(idCol).as("id_new"), hashedShingles(col(textCol), n).as("sh_a"))
    val seenSh = seen
      .join(cand.select(col("id_seen").as(idCol)).distinct(), Seq(idCol))
      .select(col(idCol).as("id_seen"), hashedShingles(col(textCol), n).as("sh_b"))
    val dropIds = cand
      .join(newSh, Seq("id_new"))
      .join(seenSh, Seq("id_seen"))
      .filter(sortedJaccard(col("sh_a"), col("sh_b")) >= threshold)
      .select(col("id_new").as(idCol)).distinct()
    docs.join(dropIds, Seq(idCol), "left_anti")
  }

  /** Contamination *scoring* — the continuous companion to
    * [[decontaminate]]'s binary drop: for every document, the fraction of
    * its distinct n-token spans that appear anywhere in the benchmark
    * corpus. A pipeline thresholds this per eval-suite (drop at ≥0.8,
    * flag at ≥0.1, …) instead of hard-dropping on a single shared span.
    *
    * Shape: span totals are map-side column work (`size` of the fused
    * shingle kernel — no explode, no shuffle); only the *matched* spans
    * flow through the equi-join (benchmark span set is distinct-collapsed
    * first, so the join side scales with the benchmark, and AQE
    * broadcasts it when small); one shuffle aggregates hit counts per
    * document. Documents shorter than n tokens score 0, not null. */
  def contaminationScore(docs: DataFrame, benchmark: DataFrame, n: Int = 8,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    import graft.functions.HashedShinglesFunctions.stringShingles
    val benchSpans = benchmark
      .select(explode(stringShingles(col(textCol), n)).as("span"))
      .distinct()
    val spreadDocs = Parallelism.spreadToCores(docs)
    val perDoc = spreadDocs.select(col(idCol),
      size(stringShingles(col(textCol), n)).cast("long").as("n_spans"))
    val hits = spreadDocs
      .select(col(idCol), explode(stringShingles(col(textCol), n)).as("span"))
      .join(benchSpans, "span")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    perDoc.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(when(col("n_spans") === 0L, 0d)
          .otherwise(coalesce(col("n_hits"), lit(0L)).cast("double") /
                     col("n_spans").cast("double")), 4).as("contamination"))
  }

  // ----------------------------------------------------------- SimHash

  /** SimHash near-dup pairs: 64-bit fingerprints, banded into four 16-bit
    * chunks (pigeonhole: any pair within Hamming distance 3 shares ≥1
    * chunk), verified with exact `bit_count(xor)` ≤ maxHamming. */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding only guarantees recall for hamming <= 3")
    // respread before the fingerprint kernel AND the chunk-collision
    // expansion (n²/2¹⁷-scale candidates): neither may run in a single
    // scan task
    val fp = Parallelism.spreadToCores(docs.select(col(idCol).as("id"),
                                       col(textCol).as("__t")))
      .select(col("id"), simhash64(col("__t")).as("fp"))
      .select(col("id"), col("fp"),
        posexplode(array((0 until 4).map { c =>
          shiftright(col("fp"), c * 16).bitwiseAND(lit(0xffffL))
        }: _*)).as(Seq("chunk", "chunk_val")))
    val l = fp.as("l")
    val r = fp.as("r")
    l.join(r, col("l.chunk") === col("r.chunk") &&
              col("l.chunk_val") === col("r.chunk_val") &&
              col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              bit_count(col("l.fp").bitwiseXOR(col("r.fp"))).cast("long").as("hamming"))
      // hamming is already on the row and codegen-cheap, so verify BEFORE
      // deduplicating: the dedup exchange then carries only true pairs,
      // not the full candidate volume (sf1-measured 28.4s -> 5.8s — the
      // 16-bit chunk layout's n²/2¹⁷ birthday term makes candidates 27M
      // at 50k docs under real-text chunk skew; the jaccard/cosine paths
      // keep dedup-first because their verify step is the expensive part)
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** Wide-fingerprint SimHash near-dup pairs: 128-bit fingerprints
    * (two decorrelated 64-bit lanes, [[graft.functions.SimHash128]])
    * banded into four 32-bit chunks — still pigeonhole-lossless for
    * Hamming ≤ 3, but the chunk-collision birthday term is n²/2³³ per
    * chunk instead of the 64-bit layout's n²/2¹⁷ (the sf1-measured
    * bottleneck: 41s of candidate verification at 50k docs). Verification
    * is the exact summed `bit_count(xor)` over both lanes. Note the
    * distance is over 128 bits, so "hamming ≤ 3" is a tighter relative
    * similarity bar than x6's 64-bit variant — a different, stricter
    * operating point, not a drop-in replacement. */
  def simHash128Pairs(docs: DataFrame, maxHamming: Int = 3,
                      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding only guarantees recall for hamming <= 3")
    import graft.functions.SimHashFunctions.simhash128
    // respread before the fingerprint kernel, as in simHashPairs
    val fp = Parallelism.spreadToCores(docs.select(col(idCol).as("id"),
                                       col(textCol).as("__t")))
      .select(col("id"), simhash128(col("__t")).as("w"))
      .select(col("id"), col("w")(0).as("fp0"), col("w")(1).as("fp1"))
      .select(col("id"), col("fp0"), col("fp1"),
        posexplode(array((0 until 4).map { c =>
          shiftright(col(s"fp${c / 2}"), (c % 2) * 32).bitwiseAND(lit(0xffffffffL))
        }: _*)).as(Seq("chunk", "chunk_val")))
    val l = fp.as("l")
    val r = fp.as("r")
    l.join(r, col("l.chunk") === col("r.chunk") &&
              col("l.chunk_val") === col("r.chunk_val") &&
              col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              (bit_count(col("l.fp0").bitwiseXOR(col("r.fp0"))) +
               bit_count(col("l.fp1").bitwiseXOR(col("r.fp1")))).cast("long").as("hamming"))
      // verify-then-dedup, same reasoning as simHashPairs
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  // -------------------------------------------------- near-dup clusters

  /** Connected components over near-dup pairs → one cluster representative
    * (the min id) per document involved in any pair. This is the dedup
    * endgame: pairs alone over-remove (a≈b, b≈c must keep ONE of {a,b,c},
    * not zero).
    *
    * Algorithm: min-label propagation with pointer-doubling — each
    * iteration every node adopts the minimum label among itself and its
    * neighbors, then shortcuts once through the label table
    * (label(label(id))), so the propagation horizon doubles per round:
    * O(log diameter) iterations, and the default cap of 20 covers any
    * component a dedup corpus can produce (diameter ≈ 2²⁰). Each
    * iteration is two joins + one aggregation; `localCheckpoint`
    * truncates the growing lineage so the loop stays plannable at any
    * scale.
    *
    * Non-convergence within the cap is LOUD: an `IllegalStateException`
    * rather than silently wrong `cluster_rep` values (the 'one
    * representative per component' contract has no graceful degradation).
    *
    * @param pairs (id_a, id_b) with id_a < id_b
    * @return (doc_id, cluster_rep) for every id appearing in a pair
    */
  def clusterPairs(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIterations) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"))
        .union(labels)
        .groupBy(col("id")).agg(min(col("label")).as("mid_label"))
      // Pointer-doubling shortcut: labels are monotone decreasing and every
      // label value is itself a node id, so one extra hop through the label
      // table (label(label(id))) is always a sound contraction — this is
      // what turns O(diameter) rounds into O(log diameter).
      val hop = labels.select(col("id").as("hid"), col("label").as("hlabel"))
      val doubled = neighborMin
        .join(hop, neighborMin("mid_label") === hop("hid"), "left")
        .select(col("id"),
                least(col("mid_label"),
                      coalesce(col("hlabel"), col("mid_label"))).as("new_label"))
      val merged = labels.join(doubled, "id").localCheckpoint()
      changed = merged.filter(col("new_label") < col("label")).count()
      labels = merged.select(col("id"), col("new_label").as("label"))
      iter += 1
    }
    if (changed > 0) throw new IllegalStateException(
      s"clusterPairs did not converge in $maxIterations iterations " +
        s"($changed labels still moving) — component diameter exceeds 2^$maxIterations?")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_rep"))
  }

  // ------------------------------------------------- embedding near-dup

  /** Embedding-cosine near-dup pairs within a blocking key, or over all
    * pairs when `blockCol` is None.
    *
    * The all-pairs path deliberately uses `crossJoin(broadcast(right))`
    * rather than an equi-join on a constant key: a constant join key
    * hash-partitions every row to ONE reducer (zero parallelism), while
    * broadcast keeps the left side partition-parallel. All-pairs is only
    * sane for corpora that fit a broadcast; at 100 TB block first (LSH
    * buckets via [[Similarity.lshTopK]], or a metadata key). */
  /** SemDeDup-style semantic near-dup pairs: cluster the embedding space
    * with the deterministic quantized Lloyd centroids
    * ([[Similarity.refineCentroids]] — the same k-means the IVF index
    * uses, so the DuckDB oracle replays the assignment bit-for-bit), then
    * score cosine only WITHIN each cell.
    *
    * This is the embedding-space analogue of the blocked text paths: the
    * cell assignment is map-side column work, candidate generation is a
    * self-equi-join on the cell id — pair volume drops from n²/2 to
    * Σ|cell|²/2 (k× less for balanced cells), and on a cluster each
    * cell's pairs co-locate in one partition. Recall < 1 by design:
    * near-dups straddling a cell boundary are missed (the SemDeDup
    * trade; raise `centroids` for selectivity, lower it for recall —
    * measured in DedupSpec against the all-pairs twin).
    *
    * `centroids ≤ 0` (the default) auto-scales the cell count with the
    * corpus: k = clamp(max(16, ⌊√n⌋), ≤ 2²⁰). √n is the balance point —
    * assignment costs n·k and within-cell pairing n²/k, so both grow as
    * n^1.5 and neither dominates; a FIXED k re-quadratizes the pair join
    * as the corpus grows (measured 14× at 10× vectors at k=16). Every
    * term (count, `sqrt` — correctly-rounded IEEE, floor) is
    * engine-exact, so the DuckDB oracle recomputes the identical k. */
  def semanticDedupPairs(embs: DataFrame, threshold: Double,
                         centroids: Int = 0, refineIters: Int = 2,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    import graft.functions.SketchFunctions.nearestCentroids
    val k =
      if (centroids > 0) centroids
      else math.min(1L << 20,
        math.max(16L, StrictMath.sqrt(embs.count().toDouble).toLong)).toInt
    val cents = Similarity.refineCentroids(
      embs, Similarity.sampleCentroids(embs, k, idCol, vecCol),
      refineIters, vecCol)
    // repartition on the cell BEFORE the self-join: the two join sides
    // then share one identical Exchange, which Spark de-duplicates
    // (ReusedExchange) — the assignment kernel runs ONCE over the corpus
    // instead of once per side (measured 2-3× on the pair stage at sf1),
    // and each cell's pairs are physically co-located, the layout the
    // scale story above promises
    // explicit partition count: a bare repartition(col) is an AQE
    // coalescing target, and the cell shuffle is tiny in BYTES while the
    // within-cell pair expansion is the actual work — coalescing it to
    // one partition single-threads the whole pair stage
    val assigned = Parallelism.spreadToCores(
        embs.select(col(idCol).as("id"), col(vecCol).as("v")))
      .withColumn("cell", nearestCentroids(col("v"), cents, 1)(0))
      .repartition(embs.sparkSession.sparkContext.defaultParallelism, col("cell"))
    assigned.as("l")
      .join(assigned.as("r"),
        col("l.cell") === col("r.cell") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              cosineSim(col("l.v"), col("r.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Exact all-pairs embedding near-dup pairs — the oracle-anchor
    * formulation ([[embeddingPairsLsh]] is the scale path). Without a
    * block column the plan broadcasts the whole vector table and scores
    * O(n²/2) pairs: correct, and the right baseline for a bounded slice,
    * but a scale-killer on a full corpus (measured 171s of a 489s sf1
    * suite before this guard; at 100× the broadcast side alone exceeds
    * executor memory).
    *
    * OPERATING REGIME — bounded inputs only. The same pattern as
    * [[levenshteinPairs]]' loose-threshold guard: unless a `blockCol`
    * bounds the self-join, the corpus must fit `maxAllPairsRows`
    * (default 10k rows ≈ 50M scored pairs); larger inputs throw with the
    * error naming the scale tools rather than silently quadratizing.
    * `maxAllPairsRows <= 0` disables the check for callers who have
    * measured their operating point. */
  def embeddingPairs(embs: DataFrame, threshold: Double,
                     blockCol: Option[Column] = None,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding",
                     maxAllPairsRows: Long = 10000L): DataFrame = {
    if (blockCol.isEmpty && maxAllPairsRows > 0) {
      val n = embs.count()
      require(n <= maxAllPairsRows,
        s"all-pairs embedding dedup over $n rows exceeds maxAllPairsRows=" +
        s"$maxAllPairsRows (≈${n * n / 2} scored pairs, one broadcast of the " +
        "whole vector table): this exact formulation is the bounded-slice " +
        "oracle baseline, not the corpus path. Use embeddingPairsLsh (banded " +
        "sign-LSH candidates, exact cosine verify) or semanticDedupPairs " +
        "(within-cell scoring) at corpus scale, pass a blockCol to bound the " +
        "self-join, or raise maxAllPairsRows after measuring.")
    }
    // Probe side re-spread ([[Spread.ensure]]) — measured 10.4s → 0.8s
    // at sf1, a single task versus the machine. The threshold rides the
    // JOIN CONDITION (cheap id< conjunct first, short-circuiting half
    // the kernel evals) so only surviving pairs materialize as output
    // rows; the tiny survivor set re-computes cosine in the projection.
    val base = embs.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val joined = blockCol match {
      case Some(bc) =>
        val e = embs.select(bc.as("block"), col(idCol).as("id"),
                            col(vecCol).as("vec"))
        Parallelism.spreadToCores(e).as("l").join(e.as("r"),
          col("l.block") === col("r.block") && col("l.id") < col("r.id") &&
            cosineSim(col("l.vec"), col("r.vec")) >= threshold)
      case None =>
        Parallelism.spreadToCores(base).as("l").join(broadcast(base.as("r")),
          col("l.id") < col("r.id") &&
            cosineSim(col("l.vec"), col("r.vec")) >= threshold)
    }
    joined
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              cosineSim(col("l.vec"), col("r.vec")).as("cosine"))
  }

  /** Banded sign-LSH embedding near-dup pairs — the scale path for
    * [[embeddingPairs]]' all-pairs formulation (measured quadratic at
    * sf1, 94s for 20k vectors): candidates are same-(band, bucket)
    * signature collisions under the deterministic Gaussian hyperplanes
    * ([[Similarity.hyperplanes]] — a pure function of (seed, plane, dim),
    * so the DuckDB oracle replays bucketing exactly); every candidate is
    * verified with the exact codegen'd cosine.
    *
    * Recall is the LSH OR-of-ANDs 1-(1-p^bits)^bands with per-plane
    * agreement p = 1-θ/π — tunable, deliberately < 1 (≈0.46 for
    * cosine 0.45 at 8×6, asserted in DedupSpec); candidate count is the
    * banded birthday bound n²·bands/2^(bits+1) instead of n²/2 — 16×
    * less verify work at 8×6, and the gap widens with `bits` when the
    * target threshold is higher.
    *
    * bands/bits left at the sentinel (-1) are MEASURED on this corpus:
    * [[Similarity.calibrateLsh]] at [[Similarity.DefaultTargetRecall]]
    * picks the cheapest point hitting the target on a deterministic
    * sample, so a corpus with different cosine geometry doesn't silently
    * lose recall to a fixture-tuned constant. Pass explicit values to
    * pin an operating point (oracle replay, measured production config). */
  def embeddingPairsLsh(embs: DataFrame, threshold: Double,
                        bands: Int = -1, bitsPerBand: Int = -1, dim: Int = 64,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    val (b, w) =
      if (bands > 0 && bitsPerBand > 0) (bands, bitsPerBand)
      else {
        val cal = Similarity.calibrateLsh(embs, Similarity.DefaultTargetRecall,
                                          idCol = idCol, vecCol = vecCol)
        (cal.bands, cal.bitsPerBand)
      }
    embeddingPairsLshAt(embs, threshold, b, w, dim, idCol, vecCol)
  }

  private def embeddingPairsLshAt(embs: DataFrame, threshold: Double,
                                  bands: Int, bitsPerBand: Int, dim: Int,
                                  idCol: String,
                                  vecCol: String): DataFrame = {
    val planes = Similarity.hyperplanes(dim, bands, bitsPerBand)
    val bucketed = Similarity.withLshBuckets(
      embs.select(col(idCol).as("id"), col(vecCol).as("v")),
      planes, bands, bitsPerBand, "v")
      .select(col("id"), col("band"), col("bucket"))
    // NO pre-verify distinct: a candidate pair colliding in k bands is
    // verified k times (map-side flops) instead of deduplicated through a
    // full-size exchange — measured at sf1, the distinct shuffled 25.4M
    // rows to remove 7% duplicates and was ~2/3 of the operator's wall
    // clock. The multiplicity is bounded by `bands`, concentrated on the
    // true near-dups, and collapsed AFTER the threshold filter where the
    // surviving set is the (tiny) answer itself.
    // probe-side respread: (id, band, bucket) triples from a few-MB scan
    // broadcast-join against themselves, so without the spread the whole
    // candidate expansion AND both downstream vector fetches run in the
    // scan's single task
    val cand = Parallelism.spreadToCores(bucketed).as("l")
      .join(bucketed.as("r"),
            col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
              col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    // Thin candidates + two broadcast-hash vector fetches, NOT vectors
    // carried through the band join: the join OUTPUT is the blown-up side
    // (n²·bands/2^(bits+1) candidate rows), so a carried dim-float
    // payload multiplies by the candidate count — measured at sf1 (20k ×
    // 64-float vectors, ~25M candidates): 27.2s inline vs 12.3s re-join,
    // identical pairs ([[embeddingPairsLshInline]]). The opposite call
    // from minHashPairs' shingle arrays only because the verify payload
    // there is per-DOC (re-join probes stay candidate-thin either way);
    // the deciding quantity is payload bytes × candidate multiplicity
    // through the widest operator, not payload size per row.
    val byId = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
    val withA = cand
      .join(byId.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
    // the verify rides the SECOND fetch's join condition: only pairs
    // passing the threshold materialize with both vectors attached, so
    // the widest operator's output is the answer set, not the candidate
    // set (the survivor projection re-computes the tiny cosine column)
    val fetchB = byId.select(col("id").as("id_b"), col("v").as("v_b"))
    withA
      .join(fetchB, withA("id_b") === fetchB("id_b") &&
              cosineSim(col("v_a"), col("v_b")) >= threshold)
      .select(withA("id_a"), withA("id_b"),
              cosineSim(col("v_a"), col("v_b")).as("cosine"))
      .dropDuplicates("id_a", "id_b")
  }

  /** The inline formulation — vectors ride the band join and the verify
    * runs on the join output directly. MEASURED SLOWER (27.2s vs 12.3s
    * at sf1, see [[embeddingPairsLshAt]]): every candidate row
    * materializes two dim-float payloads through the sort-merge join.
    * Kept for the equivalence spec and as the recorded baseline of that
    * measurement. */
  private[graft] def embeddingPairsLshInline(embs: DataFrame, threshold: Double,
                                             bands: Int, bitsPerBand: Int, dim: Int,
                                             idCol: String = "vec_id",
                                             vecCol: String = "embedding"): DataFrame = {
    val planes = Similarity.hyperplanes(dim, bands, bitsPerBand)
    val bucketed = Similarity.withLshBuckets(
      embs.select(col(idCol).as("id"), col(vecCol).as("v")),
      planes, bands, bitsPerBand, "v")
    bucketed.as("l")
      .join(bucketed.as("r"),
            col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
              col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
              cosineSim(col("l.v"), col("r.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
