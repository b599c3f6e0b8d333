"""Build a 10x replica of sf0.1 at /tmp/graft_sf1 for the larger-scale
bench point (driver testdata is read-only; correctness still runs on the
driver's own parquet). Key columns offset per replica so joins keep
referential integrity; tiny dims (region, nation) stay single-copy."""
import duckdb, os, sys

SRC, DST, REPS = '/root/testdata/sf0.1', '/tmp/graft_sf1', 10
# table -> {column: offset_base} (offset = rep * base, base > max key)
OFFSETS = {
    'customer': {'c_custkey': 100000},
    'orders':   {'o_orderkey': 1000000, 'o_custkey': 100000},
    'lineitem': {'l_orderkey': 1000000, 'l_partkey': 100000,
                 'l_suppkey': 10000},
    'part':     {'p_partkey': 100000},
    'supplier': {'s_suppkey': 10000},
    'events':   {'event_id': 1000000, 'user_id': 100000},
    'documents': {'doc_id': 10000},
    'embeddings': {'vec_id': 10000},
}
SINGLE = ['region', 'nation']
# Content perturbation per replica: an UNPERTURBED 10x copy gives every
# doc/embedding 10 exact duplicates, so pair-emitting operators (LSH
# near-dups, embedding near-dups) measure a forced-quadratic pathology
# instead of scaling. Replica k>0 gets a per-copy marker token appended
# to text (breaks exact shingle-set equality while keeping realistic
# near-dup structure) and a deterministic per-copy offset added to the
# first embedding dimension (breaks exact-vector duplication; cosine
# neighborhoods survive).
PERTURB = {
    'documents': {
        'text': ("CASE WHEN r.rep = 0 THEN text "
                 "ELSE text || ' c' || CAST(r.rep AS VARCHAR) END AS text")},
    'embeddings': {
        'embedding': ("CASE WHEN r.rep = 0 THEN embedding ELSE "
                      "list_transform(embedding, (x, i) -> CASE WHEN i = 1 "
                      "THEN CAST(x + r.rep * 0.003 AS FLOAT) ELSE x END) "
                      "END AS embedding")},
}
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
for t in SINGLE:
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, 'copied')
for t, offs in OFFSETS.items():
    cols = [n for n in con.execute(f"SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0").df().columns]
    pert = PERTURB.get(t, {})
    sel = ', '.join(
        f"({c} + r.rep * {offs[c]}) AS {c}" if c in offs
        else pert.get(c, c) for c in cols)
    con.execute(f"""
      COPY (SELECT {sel}
            FROM '{SRC}/{t}.parquet'
            CROSS JOIN (SELECT unnest(range({REPS})) AS rep) r)
      TO '{DST}/{t}.parquet' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(t, n)
