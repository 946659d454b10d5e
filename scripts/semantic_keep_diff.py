#!/usr/bin/env python3
"""Split differential for q_dedup_semantic_keep (the one oracled key
whose DuckDB twin cannot finish at x10: a recursive min-label closure
over a ~20k-node giant component materializes O(|V| x |component|)
reach pairs by construction — AS MATERIALIZED on the pair-derivation
CTEs does not change that asymptotic, measured again in round 12).

The differential splits the twin at its one engine-agnostic seam:
  1. DuckDB derives the VERIFIED EDGE SET (band-LSH candidates + exact
     dot >= 0.4) with the exact SQL the full twin uses — seconds.
  2. A driver-side union-find replays the connected-components closure
     (the part DuckDB's recursion cannot scale) deterministically.
  3. The resulting keep-list (component representative, label,
     n_members) is compared ROW-FOR-ROW with the engine's parquet.

Usage: semantic_keep_diff.py <sfDir> <engineParquetDir>
Exit 0 on exact match; prints the diff otherwise.
"""
import sys

import duckdb

EDGES_SQL = """
WITH sig AS MATERIALIZED (
  SELECT vec_id, k,
    list_sum(list_transform(range(1, 5),
      i -> CASE WHEN embedding[k * 4 + i] > 0
           THEN (cast(1 as bigint) << (4 - i)) ELSE 0 END)) AS s
  FROM embeddings, range(0, 16) t(k)),
cand AS MATERIALIZED (
  SELECT DISTINCT sa.vec_id AS vec_a, sb.vec_id AS vec_b
  FROM sig sa JOIN sig sb
    ON sa.k = sb.k AND sa.s = sb.s AND sa.vec_id < sb.vec_id)
SELECT c.vec_a, c.vec_b
FROM cand c
JOIN embeddings a ON a.vec_id = c.vec_a
JOIN embeddings q ON q.vec_id = c.vec_b
WHERE round(list_dot_product(
    a.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) >= 0.4
"""


def main(sf_dir, engine_dir):
    con = duckdb.connect()
    import os
    # spill next to the parent gate's dir when run in-gate, but do NOT
    # inherit PRECHECK_MEMORY_LIMIT: the parent's cap protects the host
    # while the Spark dump is resident, whereas this child runs after
    # it — and the 128.76M-pair DISTINCT in the edge derivation was
    # measured to thrash a 24 GB cap into a 28 GB spill crawl (~20 min)
    # vs ~30 s at DuckDB's default allowance
    tmp = os.path.join(engine_dir, "..", "_duck_spill")
    if os.path.isdir(tmp):
        con.execute(f"SET temp_directory='{tmp}'")
    emb = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(emb):  # Spark-written dir of parts (ScaleGen)
        emb = f"{emb}/*.parquet"
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{emb}')")
    nodes = [r[0] for r in con.execute(
        "SELECT vec_id FROM embeddings ORDER BY vec_id").fetchall()]
    labels = dict(con.execute(
        "SELECT vec_id, label FROM embeddings").fetchall())
    edges = con.execute(EDGES_SQL).fetchall()
    print(f"# duckdb edge derivation: {len(edges)} verified edges, "
          f"{len(nodes)} nodes")

    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-label union keeps the representative = min id,
            # matching the twin's min(r) closure semantics
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    comp = {}
    for v in nodes:
        comp.setdefault(find(v), []).append(v)
    expected = sorted(
        (rep, labels[rep], len(members)) for rep, members in comp.items())

    got = con.execute(
        f"SELECT vec_id, label, n_members "
        f"FROM read_parquet('{engine_dir}/*.parquet') "
        f"ORDER BY vec_id").fetchall()
    got = [(int(a), b, int(c)) for a, b, c in got]
    if got == expected:
        sizes = sorted((len(m) for m in comp.values()), reverse=True)[:3]
        print(f"# MATCH: {len(expected)} components, engine rows identical"
              f" (largest components: {sizes})")
        return 0
    print(f"# MISMATCH: expected {len(expected)} rows, engine {len(got)}")
    # walk the FULL zip (ADVICE r12 #4: truncating at 20 printed no
    # sample at all when the sides share a long common prefix or differ
    # only in length); zip_longest surfaces a pure length diff too
    import itertools
    for i, (e, g) in enumerate(
            itertools.zip_longest(expected, got, fillvalue="<absent>")):
        if e != g:
            print(f"  first diff at row {i}: expected {e} got {g}")
            break
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
