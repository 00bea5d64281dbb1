"""Measure planted-pair candidate recall of minhash_lsh_candidates across
(n_hashes, n_bands) at shingle-Jaccard ~0.7/0.8/0.9; prints the COVERAGE.md
table plus the banding-formula theory at the realized Jaccard."""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from nreadspark.ops.dedup import minhash_lsh_candidates

P = 60          # pairs per similarity level
W = 60          # words per doc
LEVELS = {0.7: 48, 0.8: 52, 0.9: 55}  # shared 3-shingles -> J = m/(116-m)

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

rows, truth = [], {}
doc_id = 0
for s, shared in LEVELS.items():
    m = shared + 2  # shared prefix words
    for p in range(P):
        tag = f"s{int(s*10)}p{p}"
        base = [f"{tag}w{i}" for i in range(W)]
        alt = base[:m] + [f"{tag}x{i}" for i in range(m, W)]
        a, b = doc_id, doc_id + 1
        rows.append((a, " ".join(base)))
        rows.append((b, " ".join(alt)))
        sh = lambda ws: {" ".join(ws[i:i+3]) for i in range(len(ws)-2)}
        inter = len(sh(base) & sh(alt)); union = len(sh(base) | sh(alt))
        truth.setdefault(s, []).append((a, b, inter/union))
        doc_id += 2
df = spark.createDataFrame(rows, "doc_id bigint, text string").cache()
df.count()

def theory(j, r, b):
    return 1 - (1 - j**r) ** b

print(f"{'cfg':>10} {'r':>2} | " + " | ".join(f"s={s} (J={sum(x[2] for x in truth[s])/P:.3f}) meas/theory" for s in LEVELS))
for h, b in [(16, 4), (16, 8), (32, 4), (32, 8), (64, 16)]:
    r = h // b
    cand = minhash_lsh_candidates(df, n_hashes=h, n_bands=b, max_bucket_size=None)
    got = {(x["doc_id_a"], x["doc_id_b"]) for x in cand.collect()}
    cells = []
    for s in LEVELS:
        hits = sum(1 for a, bb, j in truth[s] if (a, bb) in got)
        th = sum(theory(j, r, b) for _, _, j in truth[s]) / P
        cells.append(f"{hits/P:.2f} / {th:.2f}")
    print(f"{h}/{b:>2} {r:>2} | " + " | ".join(f"{c:>12}" for c in cells))
spark.stop()
