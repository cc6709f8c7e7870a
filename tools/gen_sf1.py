#!/usr/bin/env python3
"""Synthesize the sf1.0 soak dataset (10x sf0.1) at /tmp/sf1.

/root/testdata is read-only, so the soak input is generated here:
  - relational star + events: 10 key-shifted replicas of sf0.1 (keys
    shift by copy*(max_key+1), so join fan-out, per-key volumes and
    skew are preserved EXACTLY; region/nation stay single-copy dims);
  - documents/embeddings: FRESH draws from the sf0.1 distributions
    (31-word vocab, 10-100 words/doc — the measured sf0.1 range, same
    lang/source mix; 10 label centers |c|~0.07 + N(0,0.125) noise,
    dim 64) so duplicate structure SCALES with n instead of
    replicating 10 identical copies of every doc. (The round-4 soak
    recorded in BENCH/BASELINE.md ran an earlier draw with 8-105-word
    tails — slightly wider than sf0.1's; immaterial to the candidate-
    growth analysis, noted for reproducibility.)

Deterministic (seed below). Usage: python3 tools/gen_sf1.py
Then: SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench"
"""
import duckdb, numpy as np, pyarrow as pa, pyarrow.parquet as pq
import os

con = duckdb.connect()
src = "/root/testdata/sf0.1"
out = "/tmp/sf1"
K = 10
os.makedirs(out, exist_ok=True)

def base(t, c):
    return con.sql(f"SELECT max({c})+1 FROM read_parquet('{src}/{t}.parquet')").fetchone()[0]

B_cust, B_supp, B_part = base("customer", "c_custkey"), base("supplier", "s_suppkey"), base("part", "p_partkey")
B_ord, B_ev, B_user = base("orders", "o_orderkey"), base("events", "event_id"), base("events", "user_id")

ks = "(SELECT unnest(generate_series(0,%d)) AS i) k" % (K - 1)

def copy(t, sel):
    con.sql(f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet') CROSS JOIN {ks}) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)")
    print(t, con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0])

for t in ["region", "nation"]:
    con.sql(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO '{out}/{t}.parquet' (FORMAT parquet)")

copy("customer", f"c_custkey + k.i*{B_cust} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
copy("supplier", f"s_suppkey + k.i*{B_supp} AS s_suppkey, s_name, s_nationkey, s_acctbal")
copy("part", f"p_partkey + k.i*{B_part} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
copy("orders", f"o_orderkey + k.i*{B_ord} AS o_orderkey, o_custkey + k.i*{B_cust} AS o_custkey, "
               f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
copy("lineitem", f"l_orderkey + k.i*{B_ord} AS l_orderkey, l_partkey + k.i*{B_part} AS l_partkey, "
                 f"l_suppkey + k.i*{B_supp} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                 f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
copy("events", f"event_id + k.i*{B_ev} AS event_id, ts, user_id + k.i*{B_user} AS user_id, "
               f"event_type, value, props")

rng = np.random.default_rng(20260817)
vocab = np.array(sorted(con.sql(
    f"""WITH w AS (SELECT unnest(string_split(text,' ')) AS word
        FROM read_parquet('{src}/documents.parquet')) SELECT DISTINCT word FROM w""").df().word.tolist()))
langs = np.array(["en", "zh", "es", "fr", "de"])
langp = np.array([0.41, 0.15, 0.15, 0.15, 0.14]); langp = langp / langp.sum()
N = 50000
nwords = rng.integers(10, 101, N)
texts = [" ".join(rng.choice(vocab, n)) for n in nwords]
pq.write_table(pa.table({
    "doc_id": pa.array(np.arange(N), pa.int64()),
    "text": pa.array(texts),
    "lang": pa.array(rng.choice(langs, N, p=langp)),
    "source": pa.array([f"src{i}" for i in rng.integers(0, 20, N)]),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}), f"{out}/documents.parquet")
print("documents", N)

M = 20000
centers = rng.normal(0, 1, (10, 64))
centers = centers / np.linalg.norm(centers, axis=1, keepdims=True) * 0.07
lab = rng.integers(0, 10, M)
vecs = (centers[lab] + rng.normal(0, 0.125, (M, 64))).astype(np.float32)
pq.write_table(pa.table({
    "vec_id": pa.array(np.arange(M), pa.int64()),
    "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    "label": pa.array(lab, pa.int32()),
}), f"{out}/embeddings.parquet")
print("embeddings", M)
