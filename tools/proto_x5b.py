import duckdb, time
M64 = 1 << 64
def mix64(z):
    z = (z + 0x9e3779b97f4a7c15) % M64
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) % M64
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) % M64
    return z ^ (z >> 31)
SEEDS = [mix64(0x5eed0000 + i) for i in range(64)]
seeds_rows = ', '.join(f'({i}, {s}::HUGEINT)' for i, s in enumerate(SEEDS))
FNV_U = ("list_reduce(list_prepend(14695981039346656037::HUGEINT, "
         "list_transform(range(1, length({s})+1), i -> ord({s}[i])::HUGEINT)), "
         "(h, b) -> ((h - h%128 + xor((h%128)::BIGINT, b::BIGINT)::HUGEINT) "
         "* 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)")
TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
SHSTR = ("list_distinct(CASE WHEN len(toks) - 2 <= 0 THEN []::VARCHAR[] "
         "ELSE list_transform(range(1, len(toks) - 1), "
         "i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END)")
def XOR64U(a, b):
    return (f"(xor(({a} // 4294967296)::BIGINT, ({b} // 4294967296)::BIGINT)::HUGEINT * 4294967296::HUGEINT"
            f" + xor(({a} % 4294967296)::BIGINT, ({b} % 4294967296)::BIGINT)::HUGEINT)")
def WMUL(z, c):
    return (f"((({z} % 4294967296) * {c}::HUGEINT"
            f" + ((({z} // 4294967296) * {c}::HUGEINT) % 4294967296) * 4294967296::HUGEINT)"
            f" % 18446744073709551616::HUGEINT)")
q = f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, sstr, list_transform(sstr, s -> {FNV_U.format(s='s')}) AS shu
  FROM (SELECT doc_id, {SHSTR} AS sstr
        FROM (SELECT doc_id, {TOKS} AS toks FROM documents))
  WHERE len(sstr) > 0),
s0 AS (SELECT doc_id, si, ({XOR64U('v', 'sv')} + 11400714819323198485::HUGEINT)
           % 18446744073709551616::HUGEINT AS z
       FROM (SELECT doc_id, unnest(shu) AS v FROM sh),
            (SELECT * FROM (VALUES {seeds_rows}) AS sd(si, sv))),
s1 AS (SELECT doc_id, si, {XOR64U('z', '(z // 1073741824)')} AS z FROM s0),
s2 AS (SELECT doc_id, si, {WMUL('z', 13787848793156543929)} AS z FROM s1),
s3 AS (SELECT doc_id, si, {XOR64U('z', '(z // 134217728)')} AS z FROM s2),
s4 AS (SELECT doc_id, si, {WMUL('z', 10723151780598845931)} AS z FROM s3),
s5 AS (SELECT doc_id, si, {XOR64U('z', '(z // 2147483648)')} AS z FROM s4),
sig AS (SELECT doc_id, list(m ORDER BY si) AS sig FROM (
          SELECT doc_id, si, min(CAST(CASE WHEN z >= 9223372036854775808::HUGEINT
              THEN z - 18446744073709551616::HUGEINT ELSE z END AS BIGINT)) AS m
          FROM s5 GROUP BY doc_id, si) GROUP BY doc_id),
bands AS MATERIALIZED (
  SELECT doc_id, b, list_slice(sig, b*4+1, b*4+4) AS slice
  FROM sig, (SELECT unnest(range(16)) AS b)),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b ON a.b = b.b AND a.slice = b.slice
                                   AND a.doc_id < b.doc_id)
SELECT id_a, id_b, round(jaccard, 4) AS jaccard FROM (
  SELECT id_a, id_b,
    len(list_intersect(x.sstr, y.sstr))::DOUBLE
      / len(list_distinct(list_concat(x.sstr, y.sstr))) AS jaccard
  FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)
WHERE jaccard >= 0.5"""
con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
t0 = time.time()
got = con.sql(q).fetchall()
print('x5 pairs:', len(got), 'secs', round(time.time()-t0, 1))
print(sorted(got)[:3])
