import duckdb, re, time, sys
sys.path.insert(0, '/root/repo/tools')
from proto_oracle import (fnv1a64, to_signed, tokens, shingles, mix64, SEEDS,
                          minhash_sig, FNV_U, TOKS, SHSTR)

SF = '/root/testdata/sf0.01'
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

seeds_rows = ', '.join(f'({i}, {s}::HUGEINT)' for i, s in enumerate(SEEDS))

def XOR64U(a, b):
    return (f"(xor(({a} // 4294967296)::BIGINT, ({b} // 4294967296)::BIGINT)::HUGEINT * 4294967296::HUGEINT"
            f" + xor(({a} % 4294967296)::BIGINT, ({b} % 4294967296)::BIGINT)::HUGEINT)")
def WMUL(z, c):
    return (f"((({z} % 4294967296) * {c}::HUGEINT"
            f" + ((({z} // 4294967296) * {c}::HUGEINT) % 4294967296) * 4294967296::HUGEINT)"
            f" % 18446744073709551616::HUGEINT)")

# full x5: signature -> 16 bands of 4 -> candidates on equal (band, slice) -> jaccard >= 0.5
q = f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
shs AS (SELECT doc_id, {SHSTR} AS sstr FROM t WHERE len({SHSTR}) > 0),
sh AS (SELECT doc_id, sstr, list_transform(sstr, s -> {FNV_U.format(s='s')}) AS shu FROM shs),
seeds(si, sv) AS (VALUES {seeds_rows}),
elems AS (SELECT doc_id, unnest(shu) AS v FROM sh),
crossed AS (SELECT doc_id, si, ({XOR64U('v', 'sv')} + 11400714819323198485::HUGEINT)
                 % 18446744073709551616::HUGEINT AS z FROM elems, seeds),
s1 AS (SELECT doc_id, si, {XOR64U('z', '(z // 1073741824)')} AS z FROM crossed),
s2 AS (SELECT doc_id, si, {WMUL('z', 13787848793156543929)} AS z FROM s1),
s3 AS (SELECT doc_id, si, {XOR64U('z', '(z // 134217728)')} AS z FROM s2),
s4 AS (SELECT doc_id, si, {WMUL('z', 10723151780598845931)} AS z FROM s3),
s5 AS (SELECT doc_id, si, {XOR64U('z', '(z // 2147483648)')} AS z FROM s4),
mins AS (SELECT doc_id, si,
    min(CAST(CASE WHEN z >= 9223372036854775808::HUGEINT
        THEN z - 18446744073709551616::HUGEINT ELSE z END AS BIGINT)) AS m
  FROM s5 GROUP BY doc_id, si),
sig AS (SELECT doc_id, list(m ORDER BY si) AS sig FROM mins GROUP BY doc_id),
bands AS (SELECT doc_id, b, list_slice(sig, b*4+1, b*4+4) AS slice
          FROM sig, (SELECT unnest(range(16)) AS b)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b ON a.b = b.b AND a.slice = b.slice
                                   AND a.doc_id < b.doc_id),
verified AS (
  SELECT id_a, id_b,
    len(list_intersect(x.sstr, y.sstr))::DOUBLE
      / len(list_distinct(list_concat(x.sstr, y.sstr))) AS jaccard
  FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)
SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM verified
WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""
t0 = time.time()
got = con.sql(q).fetchall()
print('x5 pairs:', len(got), 'secs', round(time.time() - t0, 1))

# python replica of full minHashPairs
texts = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
sigs, shstr = {}, {}
for d, t in texts.items():
    ss = shingles(t)
    if not ss: continue
    shstr[d] = set(ss)
    sigs[d] = minhash_sig([fnv1a64(s) for s in ss])
cands = set()
ids = sorted(sigs)
buckets = {}
for d in ids:
    for b in range(16):
        key = (b, tuple(sigs[d][b*4:(b+1)*4]))
        buckets.setdefault(key, []).append(d)
for key, ds in buckets.items():
    for i in range(len(ds)):
        for j in range(i+1, len(ds)):
            cands.add((min(ds[i], ds[j]), max(ds[i], ds[j])))
exp = []
for (a, b) in sorted(cands):
    inter = len(shstr[a] & shstr[b]); uni = len(shstr[a] | shstr[b])
    jac = inter / uni if uni else 0.0
    if jac >= 0.5: exp.append((a, b, round(jac, 4)))
print('python replica pairs:', len(exp))
print('match:', sorted(got) == sorted(exp))
if sorted(got) != sorted(exp):
    print('only sql:', set(got) - set(exp)); print('only py:', set(exp) - set(got))
