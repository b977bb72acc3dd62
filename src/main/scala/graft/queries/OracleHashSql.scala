package graft.queries

import graft.functions.SketchKernels

/** DuckDB SQL fragments that reproduce the engine's deterministic hash
  * kernels bit-for-bit, so the hash-based queries (x5 MinHash, x6 SimHash,
  * x12 rolling fingerprint) get full value-level oracle checks instead of
  * rows-only counts.
  *
  * Technique: DuckDB BIGINT arithmetic raises on overflow, so all 64-bit
  * wrap-around math runs in an *unsigned HUGEINT domain* (values in
  * [0, 2^64), `% 2^64` after each wrapping op) and converts back to the
  * signed BIGINT representation Spark uses only at the end:
  *
  *  - wrap-add: `(a + b) % 2^64` — sums stay < 2^65, well inside HUGEINT;
  *  - wrap-mul by a 64-bit constant C: split the variable operand into
  *    32-bit halves — `(lo*C + ((hi*C) % 2^32)*2^32) % 2^64` keeps every
  *    intermediate < 2^97 (HUGEINT max is 2^127−1);
  *  - 64-bit XOR: DuckDB `xor` is BIGINT-only, so XOR the 32-bit halves
  *    (each < 2^32, safely castable) and recombine;
  *  - logical shift right: plain HUGEINT division by 2^n;
  *  - FNV-1a's per-byte XOR touches only the low 7 bits (corpus text is
  *    ASCII — asserted by the matching hashes), so `h ^ byte` reduces to
  *    `h - h%128 + xor(h%128, byte)` with no 64-bit XOR needed. The
  *    multiply by the 41-bit FNV prime never exceeds 2^105, so no split.
  *
  * Each splitmix64 stage is its own CTE with a no-op `GROUP BY 1,2,3`
  * barrier: DuckDB's optimizer otherwise fuses the projection chain into
  * one nested expression whose duplicated subtrees re-evaluate ~4× per
  * stage (measured 52s → 13s at sf0.01). The grouping is safe because
  * hashed-shingle inputs are distinct per document and each mix stage is
  * injective, so (doc, seed, value) triples are unique.
  */
object OracleHashSql {

  /** Tokens exactly as `Dedup.tokens`: lowercase, split on whitespace,
    * empties dropped. */
  val toksSql: String =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"""

  /** Distinct word 3-gram shingle strings over `toks` (matches
    * `Dedup.shingles(_, 3)` / the HashedShingles kernel's windows). */
  val shingles3Sql: String =
    """list_distinct(CASE WHEN len(toks) - 2 <= 0 THEN []::VARCHAR[]
      |      ELSE list_transform(range(1, len(toks) - 1),
      |             i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END)""".stripMargin

  /** FNV-1a 64-bit hash of string expression `s`, in the unsigned HUGEINT
    * domain (result in [0, 2^64)). Mirrors `SimHash64.fnv1a64` /
    * `HashedShinglesKernel.step`: offset 0xcbf29ce484222325, prime
    * 0x100000001b3, byte-at-a-time over UTF-8 (ASCII ⇒ `ord` per char). */
  def fnvUnsigned(s: String): String =
    s"""list_reduce(list_prepend(14695981039346656037::HUGEINT,
       |        list_transform(range(1, length($s)+1), i -> ord($s[i])::HUGEINT)),
       |      (h, b) -> ((h - h%128 + xor((h%128)::BIGINT, b::BIGINT)::HUGEINT)
       |                 * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)""".stripMargin

  /** 64-bit XOR of two unsigned-HUGEINT expressions via 32-bit halves. */
  def xor64u(a: String, b: String): String =
    s"""(xor(($a // 4294967296)::BIGINT, ($b // 4294967296)::BIGINT)::HUGEINT * 4294967296::HUGEINT
       | + xor(($a % 4294967296)::BIGINT, ($b % 4294967296)::BIGINT)::HUGEINT)""".stripMargin

  /** `(z * c) mod 2^64` for unsigned-HUGEINT variable `z` and 64-bit
    * unsigned constant `c`, via the 32-bit split. */
  def wmul(z: String, c: java.math.BigInteger): String =
    s"""((($z % 4294967296) * $c::HUGEINT
       | + ((($z // 4294967296) * $c::HUGEINT) % 4294967296) * 4294967296::HUGEINT)
       | % 18446744073709551616::HUGEINT)""".stripMargin

  /** Unsigned HUGEINT → Spark's signed BIGINT representation. */
  def toSigned(z: String): String =
    s"""CAST(CASE WHEN $z >= 9223372036854775808::HUGEINT
       |     THEN $z - 18446744073709551616::HUGEINT ELSE $z END AS BIGINT)""".stripMargin

  private def unsignedLit(v: Long): String =
    java.lang.Long.toUnsignedString(v)

  /** The MinHash seed table (seed index, seed as unsigned HUGEINT) —
    * the same `mix64(0x5eed0000 + i)` constants `SketchKernels
    * .minHashSeeds` bakes into the Spark kernel. */
  private def seedRows(numHashes: Int): String =
    SketchKernels.minHashSeeds(numHashes).zipWithIndex
      .map { case (s, i) => s"($i, ${unsignedLit(s)}::HUGEINT)" }
      .mkString(", ")

  private val C1 = new java.math.BigInteger("13787848793156543929") // 0xbf58476d1ce4e5b9
  private val C2 = new java.math.BigInteger("10723151780598845931") // 0x94d049bb133111eb
  private val GOLDEN = "11400714819323198485"                       // 0x9e3779b97f4a7c15

  /** Full `Dedup.minHashPairs` oracle: FNV-hashed 3-gram shingles →
    * 64-lane splitmix64 MinHash signature → 16 bands × 4 rows → candidate
    * pairs sharing an equal band slice → exact Jaccard ≥ threshold over
    * the shingle-string sets (same verify as the x4 oracle).
    *
    * The Spark side buckets each band slice through `xxhash64(band,
    * slice)`; slice equality implies bucket equality, and a spurious
    * xxhash collision would additionally need true Jaccard ≥ threshold
    * and no genuinely-equal band to change the result (probability
    * ~2^-64 per high-similarity pair — immaterial). */
  def minHashPairsSql(threshold: Double, numHashes: Int, bands: Int): String =
    s"""WITH ${minHashSigCtes(numHashes, bands, docWhere = "")},
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b
       |           ON a.b = b.b AND a.slice = b.slice AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM (
       |  SELECT id_a, id_b,
       |    len(list_intersect(x.sstr, y.sstr))::DOUBLE
       |      / len(list_distinct(list_concat(x.sstr, y.sstr))) AS jaccard
       |  FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)
       |WHERE jaccard >= $threshold""".stripMargin

  /** The shared signature chain of the MinHash oracles: tokens → distinct
    * 3-gram shingle strings → FNV-hashed shingles (`sh`) → 64-lane
    * splitmix64 MinHash signature → per-band signature slices (`bands`).
    * `docWhere` (e.g. " WHERE doc_id % 3 = 0") bounds the chain to the
    * documents a caller actually bands. */
  private def minHashSigCtes(numHashes: Int, bands: Int,
                             docWhere: String): String = {
    val rows = numHashes / bands
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents$docWhere),
       |shp AS (SELECT doc_id, $shingles3Sql AS sstr FROM t),
       |sh AS (SELECT doc_id, sstr,
       |         list_transform(sstr, s -> ${fnvUnsigned("s")}) AS shu
       |       FROM shp WHERE len(sstr) > 0),
       |s0 AS (SELECT doc_id, si, (${xor64u("v", "sv")} + $GOLDEN::HUGEINT)
       |           % 18446744073709551616::HUGEINT AS z
       |       FROM (SELECT doc_id, unnest(shu) AS v FROM sh),
       |            (SELECT * FROM (VALUES ${seedRows(numHashes)}) AS sd(si, sv))
       |       GROUP BY 1, 2, 3),
       |s1 AS (SELECT doc_id, si, ${xor64u("z", "(z // 1073741824)")} AS z
       |       FROM s0 GROUP BY 1, 2, 3),
       |s2 AS (SELECT doc_id, si, ${wmul("z", C1)} AS z FROM s1 GROUP BY 1, 2, 3),
       |s3 AS (SELECT doc_id, si, ${xor64u("z", "(z // 134217728)")} AS z
       |       FROM s2 GROUP BY 1, 2, 3),
       |s4 AS (SELECT doc_id, si, ${wmul("z", C2)} AS z FROM s3 GROUP BY 1, 2, 3),
       |s5 AS (SELECT doc_id, si, ${xor64u("z", "(z // 2147483648)")} AS z
       |       FROM s4 GROUP BY 1, 2, 3),
       |sig AS (SELECT doc_id, list(m ORDER BY si) AS sig FROM (
       |          SELECT doc_id, si, min(${toSigned("z")}) AS m
       |          FROM s5 GROUP BY doc_id, si) GROUP BY doc_id),
       |bands AS (SELECT doc_id, b, list_slice(sig, b*$rows+1, b*$rows+$rows) AS slice
       |          FROM sig, (SELECT unnest(range($bands)) AS b))""".stripMargin
  }

  /** `Dedup.minHashLshAgainst` oracle: the [[minHashSigCtes]] chain over
    * batch ∪ history (both predicates are SQL over a doc_id reference),
    * candidates CROSSING sides only — no id ordering, so a batch doc
    * byte-identical to a history doc is its own candidate — exact Jaccard
    * verify, then the batch rows with no verified near-dup survive. */
  def minHashAgainstSql(threshold: Double, numHashes: Int, bands: Int,
                        newPred: String => String,
                        seenPred: String => String): String =
    s"""WITH ${minHashSigCtes(numHashes, bands,
            s" WHERE ${newPred("doc_id")} OR ${seenPred("doc_id")}")},
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b
       |           ON a.b = b.b AND a.slice = b.slice
       |         WHERE ${newPred("a.doc_id")} AND ${seenPred("b.doc_id")}),
       |drops AS (SELECT DISTINCT id_a FROM (
       |    SELECT id_a,
       |      len(list_intersect(x.sstr, y.sstr))::DOUBLE
       |        / len(list_distinct(list_concat(x.sstr, y.sstr))) AS jaccard
       |    FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)
       |  WHERE jaccard >= $threshold)
       |SELECT doc_id, source FROM documents
       |WHERE ${newPred("doc_id")}
       |  AND doc_id NOT IN (SELECT id_a FROM drops)""".stripMargin

  /** Full `Dedup.simHashPairs` oracle. The Spark side bands the 64-bit
    * fingerprint into four 16-bit chunks for candidate generation, which
    * by pigeonhole is *lossless* for hamming ≤ 3 — so the oracle is simply
    * every pair with `bit_count(fp_a ⊕ fp_b) ≤ maxHamming`.
    *
    * Fingerprints mirror `SimHash64.computeText`: FNV-1a per token, each
    * hash votes ±1 per bit, fingerprint bit j set iff votes(j) > 0.
    * Tokenless documents fingerprint to 0 (LEFT JOIN + coalesce). */
  def simHashPairsSql(maxHamming: Int): String = {
    val pows = (0 until 64)
      .map(j => s"($j, ${java.math.BigInteger.ONE.shiftLeft(j)}::HUGEINT)")
      .mkString(", ")
    s"""WITH th AS (
       |  SELECT doc_id, unnest(list_transform($toksSql, t -> ${fnvUnsigned("t")})) AS h
       |  FROM documents),
       |votes AS (
       |  SELECT doc_id, j, p, sum(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th, (SELECT * FROM (VALUES $pows) AS pw(j, p)) GROUP BY doc_id, j, p),
       |fp0 AS (
       |  SELECT doc_id, sum(CASE WHEN v > 0 THEN p ELSE 0::HUGEINT END)::HUGEINT AS fpu
       |  FROM votes GROUP BY doc_id),
       |fp AS (
       |  SELECT d.doc_id, ${toSigned("coalesce(fpu, 0::HUGEINT)")} AS fp
       |  FROM documents d LEFT JOIN fp0 ON d.doc_id = fp0.doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $maxHamming""".stripMargin
  }

  /** Full `Dedup.simHash128Pairs` oracle: lane 0 fingerprints exactly as
    * [[simHashPairsSql]]; lane 1 votes with the splitmix64 finalizer of
    * each token hash (the same mix64 chain the sampling oracles replay,
    * barriered per (doc, token-position) so duplicate tokens keep their
    * votes). Banding into 32-bit chunks is pigeonhole-lossless for
    * hamming ≤ 3, so the oracle is every pair with summed
    * `bit_count(xor)` over both lanes ≤ maxHamming. */
  def simHash128PairsSql(maxHamming: Int): String = {
    val pows = (0 until 64)
      .map(j => s"($j, ${java.math.BigInteger.ONE.shiftLeft(j)}::HUGEINT)")
      .mkString(", ")
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |th AS (SELECT doc_id, i.i AS pos, ${fnvUnsigned("toks[i.i]")} AS h
       |       FROM t, unnest(range(1, len(toks)+1)) AS i(i)),
       |m0 AS (SELECT doc_id, pos, h, (h + $GOLDEN::HUGEINT)
       |           % 18446744073709551616::HUGEINT AS z FROM th GROUP BY 1, 2, 3, 4),
       |m1 AS (SELECT doc_id, pos, h, ${xor64u("z", "(z // 1073741824)")} AS z
       |       FROM m0 GROUP BY 1, 2, 3, 4),
       |m2 AS (SELECT doc_id, pos, h, ${wmul("z", C1)} AS z FROM m1 GROUP BY 1, 2, 3, 4),
       |m3 AS (SELECT doc_id, pos, h, ${xor64u("z", "(z // 134217728)")} AS z
       |       FROM m2 GROUP BY 1, 2, 3, 4),
       |m4 AS (SELECT doc_id, pos, h, ${wmul("z", C2)} AS z FROM m3 GROUP BY 1, 2, 3, 4),
       |m5 AS (SELECT doc_id, pos, h, ${xor64u("z", "(z // 2147483648)")} AS z
       |       FROM m4 GROUP BY 1, 2, 3, 4),
       |lanes AS (
       |  SELECT doc_id, 0 AS lane, h AS v FROM th
       |  UNION ALL SELECT doc_id, 1 AS lane, z AS v FROM m5),
       |votes AS (
       |  SELECT doc_id, lane, j, p,
       |    sum(CASE WHEN (v // p) % 2 = 1 THEN 1 ELSE -1 END) AS vt
       |  FROM lanes, (SELECT * FROM (VALUES $pows) AS pw(j, p))
       |  GROUP BY doc_id, lane, j, p),
       |fps AS (
       |  SELECT doc_id, lane,
       |    sum(CASE WHEN vt > 0 THEN p ELSE 0::HUGEINT END)::HUGEINT AS fpu
       |  FROM votes GROUP BY doc_id, lane),
       |fp AS (
       |  SELECT d.doc_id,
       |    ${toSigned("coalesce(max(CASE WHEN lane = 0 THEN fpu END), 0::HUGEINT)")} AS f0,
       |    ${toSigned("coalesce(max(CASE WHEN lane = 1 THEN fpu END), 0::HUGEINT)")} AS f1
       |  FROM documents d LEFT JOIN fps ON d.doc_id = fps.doc_id
       |  GROUP BY d.doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  (bit_count(xor(a.f0, b.f0)) + bit_count(xor(a.f1, b.f1)))::BIGINT AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.f0, b.f0)) + bit_count(xor(a.f1, b.f1)) <= $maxHamming""".stripMargin
  }

  /** CTE chain reproducing `Sampling.sampleBucket`: splitmix64 of
    * (doc_id ^ mix64(seed)) in the unsigned HUGEINT domain, then the top
    * 53 bits (`// 2048`) as `bucket` in the final CTE `pb`. `carry`
    * columns ride along every stage. One hash per row, so no GROUP BY
    * barriers needed (the minhash query hashes per (doc, seed) pair —
    * 64× more — which is where fusion blowup mattered). */
  def sampleBucketCtes(seed: Long, carry: String,
                       from: String = "documents",
                       idCol: String = "doc_id"): String = {
    val salt = s"${unsignedLit(SketchKernels.mix64(seed))}::HUGEINT"
    s"""p0 AS (SELECT $carry, (${xor64u(s"$idCol::HUGEINT", salt)} + $GOLDEN::HUGEINT)
       |         % 18446744073709551616::HUGEINT AS z FROM $from),
       |p1 AS (SELECT $carry, ${xor64u("z", "(z // 1073741824)")} AS z FROM p0),
       |p2 AS (SELECT $carry, ${wmul("z", C1)} AS z FROM p1),
       |p3 AS (SELECT $carry, ${xor64u("z", "(z // 134217728)")} AS z FROM p2),
       |p4 AS (SELECT $carry, ${wmul("z", C2)} AS z FROM p3),
       |p5 AS (SELECT $carry, ${xor64u("z", "(z // 2147483648)")} AS z FROM p4),
       |pb AS (SELECT $carry, (z // 2048) AS bucket FROM p5)""".stripMargin
  }

  /** `RollingHash64` oracle: `h = (h*131 + byte) mod (10^9+7)` never
    * exceeds ~1.3·10^11, so plain BIGINT `list_reduce` suffices. */
  def rollingFingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(list_prepend(0::BIGINT,
      |      list_transform(range(1, length(text)+1), i -> ord(text[i])::BIGINT)),
      |    (h, b) -> (h*131 + b) % 1000000007) AS rolling_fp
      |FROM documents""".stripMargin
}
