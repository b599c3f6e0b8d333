"""Build the 100x probe tables at /tmp/graft_sf100: documents (500k rows)
and embeddings (200k) as perturbed replicas of sf0.1 — the same
perturbation discipline as scaleup.py (per-copy marker token / first-dim
offset) so pair-emitting operators measure realistic near-dup structure,
not a forced-quadratic exact-duplicate pathology. Only the two
training-data tables: the 100x probe targets the dedup/ANN/curation
families, which read nothing else."""
import duckdb, os

SRC, DST, REPS = '/root/testdata/sf0.1', '/tmp/graft_sf100', 100
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"""
  COPY (SELECT doc_id + r.rep * 10000 AS doc_id,
               CASE WHEN r.rep = 0 THEN text
                    ELSE text || ' c' || CAST(r.rep AS VARCHAR) END AS text,
               * EXCLUDE (doc_id, text)
        FROM '{SRC}/documents.parquet'
        CROSS JOIN (SELECT unnest(range({REPS})) AS rep) r)
  TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
print('documents', con.execute(
    f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0])
con.execute(f"""
  COPY (SELECT vec_id + r.rep * 10000 AS vec_id,
               CASE WHEN r.rep = 0 THEN embedding ELSE
                 list_transform(embedding, (x, i) -> CASE WHEN i = 1
                   THEN CAST(x + r.rep * 0.003 AS FLOAT) ELSE x END)
               END AS embedding,
               * EXCLUDE (vec_id, embedding)
        FROM '{SRC}/embeddings.parquet'
        CROSS JOIN (SELECT unnest(range({REPS})) AS rep) r)
  TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")
print('embeddings', con.execute(
    f"SELECT count(*) FROM '{DST}/embeddings.parquet'").fetchone()[0])

# events (10M rows): new users per rep over the SAME time span — the
# realistic 100x shape for the windowed/sessionized arms (more users,
# same window count), not a time-stretch that would multiply windows.
con.execute(f"""
  COPY (SELECT event_id + r.rep * 1000000 AS event_id, ts,
               user_id + r.rep * 100000 AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet'
        CROSS JOIN (SELECT unnest(range({REPS})) AS rep) r)
  TO '{DST}/events.parquet' (FORMAT PARQUET)""")
print('events', con.execute(
    f"SELECT count(*) FROM '{DST}/events.parquet'").fetchone()[0])
