import duckdb, re, time
M64 = 1 << 64
FNV_OFF, FNV_PRIME = 0xcbf29ce484222325, 0x100000001b3
def fnv1a64(s):
    h = FNV_OFF
    for b in s.encode(): h = ((h ^ b) * FNV_PRIME) % M64
    return h
def to_signed(u): return u - M64 if u >= (1 << 63) else u
def tokens(text): return [t for t in re.split(r'\s+', text.lower()) if t != '']
def simhash(text):
    counts = [0]*64
    for t in tokens(text):
        h = fnv1a64(t)
        for j in range(64): counts[j] += 1 if (h >> j) & 1 else -1
    return to_signed(sum(1 << j for j in range(64) if counts[j] > 0))

FNV_U = ("list_reduce(list_prepend(14695981039346656037::HUGEINT, "
         "list_transform(range(1, length({s})+1), i -> ord({s}[i])::HUGEINT)), "
         "(h, b) -> ((h - h%128 + xor((h%128)::BIGINT, b::BIGINT)::HUGEINT) "
         "* 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)")
TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
pows = ', '.join(f'({j}, {1<<j}::HUGEINT)' for j in range(64))

q = f"""
WITH th AS (
  SELECT doc_id, unnest(list_transform({TOKS}, t -> {FNV_U.format(s='t')})) AS h
  FROM documents),
votes AS (
  SELECT doc_id, j, p, sum(CASE WHEN (h // p) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, (SELECT * FROM (VALUES {pows}) AS pw(j, p)) GROUP BY doc_id, j, p),
fp0 AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN p ELSE 0::HUGEINT END)::HUGEINT AS fpu
  FROM votes GROUP BY doc_id),
fp AS (
  SELECT d.doc_id,
    CAST(CASE WHEN coalesce(fpu, 0::HUGEINT) >= 9223372036854775808::HUGEINT
         THEN fpu - 18446744073709551616::HUGEINT
         ELSE coalesce(fpu, 0::HUGEINT) END AS BIGINT) AS fp
  FROM documents d LEFT JOIN fp0 ON d.doc_id = fp0.doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 3"""
con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
t0 = time.time()
got = sorted(con.sql(q).fetchall())
print('x6 pairs:', len(got), 'secs', round(time.time()-t0, 1))
texts = con.sql("SELECT doc_id, text FROM documents").fetchall()
fps = {d: simhash(t) for d, t in texts}
ids = sorted(fps)
exp = sorted((a, b, bin((fps[a] ^ fps[b]) & (M64-1)).count('1'))
             for i, a in enumerate(ids) for b in ids[i+1:]
             if bin((fps[a] ^ fps[b]) & (M64-1)).count('1') <= 3)
print('replica pairs:', len(exp), 'match:', got == exp)
