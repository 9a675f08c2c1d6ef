"""Generate a PERF-ONLY scale point by replicating + re-keying an
existing testdata directory (default: sf0.1 × 8 → .scale/sf0.8).

Why: SCALING.md's two driver-provided points (sf0.01 → sf0.1) leave
28 of 33 queries floor-bound — most never clear the ~0.13 s
scheduling floor at sf0.1, so the measured exponents are lower
bounds, not asymptotes (VERDICT r7 missing-item 3). The driver
forbids touching /root/testdata, so this builds a bigger point
locally for tools/scaling_report.py to time. NO oracle runs against
it — correctness at this size is carried by the sf0.01/sf0.1 parity
suite; this data exists solely to pull the exponents out of the
floor.

Replication must not manufacture super-linearity: a naive 8× copy
would make every pair-producing operator (shingle dedup, cosine
near-dup) see each duplicate group grow 8×, so its OUTPUT grows 64×
by data construction, poisoning the measured exponent. Each replica
is therefore shifted into its own disjoint universe:

- every entity key (custkey, orderkey, doc_id, vec_id, ...) offsets
  by replica · 10^7, preserving referential integrity within the
  replica;
- document text is Caesar-rotated by the replica index (both cases;
  length, token structure, and within-replica duplicate pairs are
  preserved exactly, while cross-replica shingle overlap drops to
  zero);
- embeddings cyclically rotate their dimension order by the replica
  index (norms and within-replica neighbor structure preserved,
  cross-replica cosine decorrelated);
- customer balances offset by replica · 20000 (far beyond the entity
  linker's ±0.5 matching band, so the profile rule cannot link the
  8 same-named copies of one customer across universes — phones are
  already disjoint via the custkey-derived digits; within-replica
  match structure is untouched because the shift is constant);
- region/nation stay constant-size dims, as in TPC-H itself.

Output is ONE parquet file per table (DuckDB COPY), matching the
driver layout so load_table and duckdb row counts work unchanged.

Usage: python tools/make_scale_point.py [src_dir] [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()
OFF = 10_000_000

# per-table: list of int64/int32 key columns to shift per replica
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ("region", "nation")


def _columns(src: str) -> list[str]:
    return [r[0] for r in duckdb.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]


def replicate_sql(table: str, src: str, replicas: int) -> str:
    cols = []
    for c in _columns(src):
        if c in KEY_COLS.get(table, []):
            cols.append(f"{c} + i * {OFF} AS {c}")
        elif table == "customer" and c == "c_acctbal":
            cols.append(f"{c} + i * 20000 AS {c}")
        elif table == "documents" and c == "text":
            cols.append(
                f"translate(text, '{LOWER}{UPPER}', "
                f"substr('{LOWER}{LOWER}', i + 1, 26) || "
                f"substr('{UPPER}{UPPER}', i + 1, 26)) AS text"
            )
        elif table == "embeddings" and c == "embedding":
            cols.append(
                "list_concat(embedding[i + 1:], embedding[1:i]) AS embedding"
            )
        else:
            cols.append(c)
    return (
        f"SELECT {', '.join(cols)} FROM '{src}', "
        f"range(0, {replicas}) AS r(i)"
    )


def main() -> int:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale",
            "sf0.8",
        )
    )
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for table in DIM_TABLES:
        src, dst = f"{src_dir}/{table}.parquet", f"{out_dir}/{table}.parquet"
        con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        print(f"  {table}: copied (constant-size dim)", file=sys.stderr)
    for table in KEY_COLS:
        src, dst = f"{src_dir}/{table}.parquet", f"{out_dir}/{table}.parquet"
        # preserve the embedding element type: DuckDB reads list<float>
        # and writes it back as list<float> (checked by the row probe)
        con.sql(
            f"COPY ({replicate_sql(table, src, replicas)}) TO '{dst}' "
            "(FORMAT PARQUET)"
        )
        n_src = con.sql(f"SELECT count(*) FROM '{src}'").fetchone()[0]
        n_dst = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        assert n_dst == n_src * replicas, (table, n_src, n_dst)
        print(f"  {table}: {n_src} -> {n_dst} rows", file=sys.stderr)
    print(f"wrote {out_dir} ({replicas}x {src_dir})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
