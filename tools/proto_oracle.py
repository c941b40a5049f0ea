"""Prototype DuckDB oracle SQL for the dedup/text family; validate against
pure-Python replicas of the Scala kernels (Long wraparound = mod 2^64,
signed compare)."""
import duckdb, re

M = 1 << 64
SIGN = 1 << 63
def s64(x):
    x &= M - 1
    return x - M if x >= SIGN else x

def fnv1a(s):
    h = 0xcbf29ce484222325
    for ch in s:
        h ^= ord(ch)
        h = (h * 0x100000001b3) % M
    return h  # unsigned form

def mix64(z0):
    z = (z0 + 0x9e3779b97f4a7c15) % M
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) % M
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) % M
    return z ^ (z >> 31)

def perms(k, seed=42):
    return [ (mix64((seed + 2*i) % M) | 1, mix64((seed + 2*i + 1) % M)) for i in range(k) ]

def shingle_hashes(t, k=5):
    t = t.lower().strip()
    return set(fnv1a(t[i:i+k]) for i in range(len(t)-k+1)) if len(t) >= k else set()

def minhash_sig(hs, k=64, seed=42):
    ps = perms(k, seed)
    sig = [SIGN - 1] * k  # Long.MaxValue signed
    for h in hs:
        for i,(a,b) in enumerate(ps):
            v = s64(a*h + b)
            if v < sig[i]: sig[i] = v
    return sig

def simhash(t):
    t2 = t.lower().strip()
    if not t2: return 0
    acc = [0]*64
    for tok in re.split(r'\s+', t2):
        h = fnv1a(tok)
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if acc[b] > 0: out |= (1 << b)
    return s64(out)

con = duckdb.connect()
con.execute("create view documents as select * from read_parquet('/root/testdata/sf0.01/documents.parquet')")
docs = con.execute("select doc_id, text from documents order by doc_id").fetchall()
# near-dup union
union_docs = list(docs) + [(i + 1000000, t[:max(len(t)-20, 1)]) for i, t in docs if i < 50]

# ---------- python expected ----------
fp_expected = { i: s64(fnv1a(t.lower().strip())) for i, t in docs }
sh_expected = { i: simhash(t) for i, t in docs }
sigs = { i: minhash_sig(shingle_hashes(t)) for i, t in union_docs }
# bands: 16 bands of 4 rows
from collections import defaultdict
buckets = defaultdict(list)
for i, sg in sigs.items():
    for b in range(16):
        buckets[(b, tuple(sg[4*b:4*b+4]))].append(i)
cand = set()
for ids in buckets.values():
    ids = sorted(ids)
    for x in range(len(ids)):
        for y in range(x+1, len(ids)):
            cand.add((ids[x], ids[y]))
mh_pairs = {}
for a, b in cand:
    est = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) / 64.0
    if est >= 0.5: mh_pairs[(a, b)] = est
print("py: minhash pairs est>=0.5:", len(mh_pairs))

# simhash pairs over union, hamming <= 7
shu = { i: simhash(t) for i, t in union_docs }
sp = {}
ids = sorted(shu)
for xi in range(len(ids)):
    for yi in range(xi+1, len(ids)):
        a, b = ids[xi], ids[yi]
        hd = bin((shu[a] ^ shu[b]) & (M-1)).count('1')
        if hd <= 7: sp[(a,b)] = hd
print("py: simhash pairs:", len(sp))

# ngram jaccard over candidates (ALL minhash candidates), exact jaccard >= 0.3
sh_sets = { i: shingle_hashes(t) for i, t in union_docs }
nj = {}
for a, b in cand:
    A, B = sh_sets[a], sh_sets[b]
    j = 1.0 if not A and not B else len(A & B) / len(A | B)
    if j >= 0.3: nj[(a,b)] = j
print("py: ngram jaccard pairs:", len(nj))
import json, pickle
pickle.dump(dict(fp=fp_expected, sh=sh_expected, mh=mh_pairs, sp=sp, nj=nj, ncand=len(cand)),
            open('/tmp/proto_expected.pkl','wb'))
