"""Synthesize a K×-scale copy of a testdata sf directory for scale-up
measurements (default: sf0.1 × 10 ≈ sf1).

Each replica i gets consistent key offsets (foreign keys stay joinable:
orders.o_custkey moves with customer.c_custkey, lineitem's three keys move
with their dimensions).  Document text gets a per-replica suffix token so
replicas are NEAR-duplicates (Jaccard ≈ 0.95+), not byte-identical — the
realistic stress shape for the near-dup family.  Events keep whatever
physical timestamp type the source testdata has (pyarrow preserves it:
timestamp[ns] in round-1..3 generations, timestamp[us] since round 4), so
``session.load_table``'s dtype-branching path is exercised unchanged.

Usage:
    python tools/make_scale_data.py [K] [src_dir] [out_dir]
    # defaults: 10 /root/testdata/sf0.1 /tmp/sfscale
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key columns to offset per table: {table: {column: base_table_for_stride}}
# stride for a key = max(key in its home table) + 1, so offsets never collide
_KEYS: dict[str, dict[str, tuple[str, str]]] = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
_COPY_ONLY = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfscale"

    import os

    os.makedirs(out, exist_ok=True)

    strides: dict[tuple[str, str], int] = {}
    for table, cols in _KEYS.items():
        for _, home in cols.items():
            if home not in strides:
                t = pq.read_table(f"{src}/{home[0]}.parquet", columns=[home[1]])
                strides[home] = pc.max(t.column(0)).as_py() + 1

    for name in _COPY_ONLY:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{out}/{name}.parquet")
        print(f"{name}: copied")

    for name, cols in _KEYS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        replicas = []
        for i in range(k):
            r = t
            for col, home in cols.items():
                idx = r.schema.get_field_index(col)
                shifted = pc.add(r.column(idx), i * strides[home])
                r = r.set_column(idx, r.schema.field(idx), shifted.cast(r.schema.field(idx).type))
            if name == "documents" and i > 0:
                idx = r.schema.get_field_index("text")
                suffixed = pc.binary_join_element_wise(
                    r.column(idx).cast(pa.string()), f" r{i}", ""
                )
                r = r.set_column(idx, r.schema.field(idx), suffixed)
            replicas.append(r)
        big = pa.concat_tables(replicas)
        # small row groups: a single-row-group file serializes Spark's scan
        # onto one task (splits beyond the row-group start read nothing) —
        # the K-fold replica of a one-group source would sabotage every
        # parallelism measurement downstream
        pq.write_table(big, f"{out}/{name}.parquet", row_group_size=16384)
        print(f"{name}: {t.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main()
