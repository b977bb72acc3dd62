"""Prototype DuckDB oracle SQL for x12 (rolling hash), x6 (simhash), x5 (minhash).
Validates against pure-Python replicas of the Scala kernels."""
import duckdb, re, sys

SF = '/root/testdata/sf0.01'
M64 = 1 << 64

# ---------- python replicas of scala kernels ----------
FNV_OFF = 0xcbf29ce484222325
FNV_PRIME = 0x100000001b3

def fnv1a64(s: str) -> int:
    h = FNV_OFF
    for b in s.encode('utf-8'):
        h = ((h ^ b) * FNV_PRIME) % M64
    return h  # unsigned

def to_signed(u): return u - M64 if u >= (1 << 63) else u

def rolling(s: str) -> int:
    h = 0
    for b in s.encode('utf-8'):
        h = (h * 131 + b) % 1000000007
    return h

def tokens(text): return [t for t in re.split(r'\s+', text.lower()) if t != '']

def simhash(text) -> int:
    counts = [0]*64
    for t in tokens(text):
        h = fnv1a64(t)
        for j in range(64):
            counts[j] += 1 if (h >> j) & 1 else -1
    res = 0
    for j in range(64):
        if counts[j] > 0: res |= 1 << j
    return to_signed(res)

def mix64(z):
    z = (z + 0x9e3779b97f4a7c15) % M64
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) % M64
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) % M64
    return z ^ (z >> 31)

SEEDS = [mix64(0x5eed0000 + i) for i in range(64)]

def shingles(text, n=3):
    toks = tokens(text)
    out, seen = [], set()
    for i in range(len(toks)-n+1):
        s = ' '.join(toks[i:i+n])
        if s not in seen: seen.add(s); out.append(s)
    return out

def minhash_sig(sh_hashes):  # sh unsigned fnv hashes; returns signed mins per seed
    sig = []
    for s in SEEDS:
        m = (1 << 63) - 1
        for v in sh_hashes:
            h = to_signed(mix64(v ^ s))
            if h < m: m = h
        sig.append(m)
    return sig

# ---------- SQL builders ----------
BYTES = "list_transform(range(1, length({s})+1), i -> ord({s}[i]))"

ROLL_SQL = ("list_reduce(list_prepend(0::BIGINT, " + BYTES.format(s='{s}') + "), "
            "(h, b) -> (h*131 + b) % 1000000007)")

# fnv in unsigned HUGEINT domain; bytes are ASCII (<128) so xor only touches low 7 bits
FNV_U = ("list_reduce(list_prepend(14695981039346656037::HUGEINT, "
         "list_transform(range(1, length({s})+1), i -> ord({s}[i])::HUGEINT)), "
         "(h, b) -> ((h - h%128 + xor((h%128)::BIGINT, b::BIGINT)::HUGEINT) "
         "* 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)")

POW2 = '[' + ','.join(f'{1<<j}::HUGEINT' for j in range(64)) + ']'
TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

# ---------- x12 rolling ----------
q12 = f"SELECT doc_id, {ROLL_SQL.format(s='text')} AS rolling_fp FROM documents ORDER BY doc_id"
got = con.sql(q12).fetchall()
exp = con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
bad = [(d, g, rolling(t)) for (d, g), (_, t) in zip(got, exp) if g != rolling(t)]
print('x12 rolling: rows', len(got), 'mismatches', len(bad), bad[:3])

# ---------- x6 simhash ----------
# per-doc fp, then all pairs hamming<=3
fp_sql = f"""
WITH hs AS (
  SELECT doc_id, list_transform({TOKS}, t -> {FNV_U.format(s='t')}) AS th FROM documents
), fp AS (
  SELECT doc_id, CAST(CASE WHEN fpu >= 9223372036854775808::HUGEINT
      THEN fpu - 18446744073709551616::HUGEINT ELSE fpu END AS BIGINT) AS fp
  FROM (SELECT doc_id,
     list_sum(list_transform(range(0, 64), j ->
       CASE WHEN list_sum(list_transform(th, h ->
          CASE WHEN (h // ({POW2})[j+1]) % 2 = 1 THEN 1 ELSE -1 END)) > 0
       THEN ({POW2})[j+1] ELSE 0::HUGEINT END))::HUGEINT AS fpu
   FROM hs))
SELECT doc_id, fp FROM fp ORDER BY doc_id"""
got = con.sql(fp_sql).fetchall()
bad = [(d, g, simhash(t)) for (d, g), (_, t) in zip(got, exp) if g != simhash(t)]
print('x6 simhash fp: rows', len(got), 'mismatches', len(bad), bad[:3])

# ---------- x5 minhash ----------
# staged mix64 in unsigned HUGEINT domain via chained list_transform.
# xor64u(a,b) = xor on 32-bit halves (BIGINT-safe)
def XOR64U(a, b):
    return (f"(xor(({a} // 4294967296)::BIGINT, ({b} // 4294967296)::BIGINT)::HUGEINT * 4294967296::HUGEINT"
            f" + xor(({a} % 4294967296)::BIGINT, ({b} % 4294967296)::BIGINT)::HUGEINT)")
def WMUL(z, c):  # (z * c) mod 2^64, z unsigned HUGEINT expr (a variable), c 64-bit unsigned const
    return (f"((({z} % 4294967296) * {c}::HUGEINT"
            f" + ((({z} // 4294967296) * {c}::HUGEINT) % 4294967296) * 4294967296::HUGEINT)"
            f" % 18446744073709551616::HUGEINT)")

ST0 = "(x + 11400714819323198485::HUGEINT) % 18446744073709551616::HUGEINT"
ST1 = WMUL(XOR64U('z', '(z // 1073741824)'), 13787848793156543929)       # >>30, *C1
ST2 = WMUL(XOR64U('z', '(z // 134217728)'), 10723151780598845931)        # >>27, *C2
ST3 = XOR64U('z', '(z // 2147483648)')                                    # >>31
ST4 = ("CAST(CASE WHEN z >= 9223372036854775808::HUGEINT "
       "THEN z - 18446744073709551616::HUGEINT ELSE z END AS BIGINT)")

seeds_lit = '[' + ','.join(f'{s}::HUGEINT' for s in SEEDS) + ']'

def MIX_MIN(sh_expr, seed_var):
    inner = f"list_transform({sh_expr}, v -> {XOR64U('v', seed_var)})"
    for st in (ST0.replace('x', 'x'),):
        inner = f"list_transform({inner}, x -> {st})"
    for st in (ST1, ST2, ST3):
        inner = f"list_transform({inner}, z -> {st})"
    inner = f"list_transform({inner}, z -> {ST4})"
    return f"list_min({inner})"

SHSTR = ("list_distinct(CASE WHEN len(toks) - 2 <= 0 THEN []::VARCHAR[] "
         "ELSE list_transform(range(1, len(toks) - 1), "
         "i -> array_to_string(list_slice(toks, i, i + 2), ' ')) END)")

sig_sql = f"""
WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, list_transform({SHSTR}, s -> {FNV_U.format(s='s')}) AS shu FROM t
       WHERE len({SHSTR}) > 0),
sig AS (SELECT doc_id, list_transform({seeds_lit}, s -> {MIX_MIN('shu', 's')}) AS sig FROM sh)
SELECT doc_id, sig FROM sig ORDER BY doc_id"""
import time
t0 = time.time()
got = con.sql(sig_sql).fetchall()
print('x5 sig: rows', len(got), 'secs', round(time.time()-t0, 1))
texts = dict(exp)
nbad = 0
for d, sig in got:
    shh = [fnv1a64(s) for s in shingles(texts[d])]
    want = minhash_sig(shh)
    if list(sig) != want:
        nbad += 1
        if nbad <= 2: print('MISMATCH doc', d, sig[:4], want[:4])
print('x5 sig mismatches:', nbad)
