"""Generate an sf1-equivalent fixture by deterministic 10x upsampling of
the driver's sf0.1 tables — the 10x scale probe the round-7 verdict asked
for (convert SCALE.md's 100x-design arguments from argument to
measurement).

Scaling rules (mirror TPC-H semantics: fixed dims stay fixed, entity
tables scale with SF):

- region/nation: copied unchanged (fixed-size dimensions).
- customer/supplier/part/orders/lineitem/events: 10 key-shifted replicas
  — every key column (and FK) is shifted by ``replica * stride`` with a
  per-table stride > max(key), so join relationships, fan-outs, and
  selectivity-by-key-arithmetic (the registry's `key % k` predicates are
  stride-aligned: strides are multiples of 840 = lcm(1..8)*...) are
  preserved exactly; timestamps keep their range (same calendar window,
  10x density — how a real warehouse grows).
- documents: 10 replicas; replica 0 verbatim, replicas 1-9 get
  WORD-SHUFFLED text (seeded per doc) — length/vocab distributions are
  preserved but shingle sets are scrambled, so near-dup density stays
  corpus-like instead of every doc having 9 exact clones (which would
  turn every LSH bucket into a clique and measure cap behavior, not
  scaling).
- embeddings: 10 replicas; replicas 1-9 perturbed with seeded Gaussian
  noise (sigma 0.05) and re-normalized — geometry statistics preserved,
  no degenerate exact-duplicate neighbor structure.

DuckDB does the relational upsampling (vectorized, seconds); numpy does
text/embeddings. Output: --out dir (default /root/repo/.scale/sf1,
gitignored). Deterministic: same input -> same bytes.
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
REPLICAS = 10   # overridden by --replicas (100 = sf10 for the 100x probe)
# strides: > row-count-derived max key, AND a multiple of 840
# (lcm(1..8)=840) so `key % k` predicates select the same fraction in
# every replica for every k the registry uses (2,3,4,5,7,8,11,...840)
_LCM = 27720  # lcm(1..12): covers % 11 and % 12 predicates too


def _stride(max_key: int) -> int:
    return ((max_key // _LCM) + 1) * _LCM


def upsample_relational(con, name: str, out: str, key_shifts: dict[str, int],
                        plain_cols: list[str],
                        derived_cols: dict[str, str] | None = None) -> None:
    """``derived_cols`` maps column -> SQL template with a
    ``{<key>_shift}`` placeholder PER key in ``key_shifts`` (e.g.
    ``{c_custkey_shift}``): columns that TPC-H derives from an entity
    key (c_name = 'Customer#' || 9-digit key, s_name likewise) must be
    REGENERATED from the shifted key, not copied verbatim — verbatim
    replication gives every entity 10 exact name-clones sharing all
    attributes, which turns any correct ER/fuzzy blocking into 10x10
    clone cliques and measures fixture duplication instead of
    algorithmic scaling (caught by the round-9 er_best_match
    candidate-growth pin). Named-per-key placeholders (not a single
    positional ``{shift}``) so a multi-key table's derived column is
    always formatted with the stride of the key it actually derives
    from; a template naming an unknown key fails loudly (KeyError)."""
    reps = []
    for r in range(REPLICAS):
        shifted = [f"{c} + {r * s} AS {c}" for c, s in key_shifts.items()]
        per_key = {f"{k}_shift": r * s for k, s in key_shifts.items()}
        derived = [t.format(**per_key) + f" AS {c}"
                   for c, t in (derived_cols or {}).items()]
        reps.append(f"SELECT {', '.join(shifted + derived + plain_cols)} "
                    f"FROM src")
    con.execute(f"CREATE OR REPLACE TEMP VIEW src AS "
                f"SELECT * FROM '{SRC}/{name}.parquet'")
    con.execute(f"COPY ({' UNION ALL '.join(reps)}) TO "
                f"'{out}/{name}.parquet' (FORMAT PARQUET)")


def upsample_documents(out: str) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    n = len(src)
    stride = _stride(int(src["doc_id"].max()))
    parts = [src]
    for r in range(1, REPLICAS):
        rep = src.copy()
        rep["doc_id"] = rep["doc_id"] + r * stride
        texts = []
        for did, t in zip(src["doc_id"], src["text"]):
            rng = np.random.default_rng(42_000_000 + r * 1_000_003 + int(did))
            words = t.split(" ")
            rng.shuffle(words)
            texts.append(" ".join(words))
        rep["text"] = texts
        rep["n_chars"] = [len(t) for t in texts]
        parts.append(rep)
    full = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(full, preserve_index=False),
                   f"{out}/documents.parquet")
    print(f"documents: {n} -> {len(full)}")


def upsample_embeddings(out: str) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    src = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
    stride = _stride(int(src["vec_id"].max()))
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in src["embedding"]])
    parts = [src]
    for r in range(1, REPLICAS):
        rng = np.random.default_rng(7_000_000 + r)
        noisy = mat + rng.normal(0.0, 0.05, size=mat.shape)
        noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
        rep = pd.DataFrame({
            "vec_id": src["vec_id"] + r * stride,
            "embedding": [row.astype(np.float32).tolist() for row in noisy],
            "label": src["label"],
        })
        parts.append(rep)
    full = pd.concat(parts, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(full, preserve_index=False),
                   f"{out}/embeddings.parquet")
    print(f"embeddings: {len(src)} -> {len(full)}")


def main() -> None:
    global REPLICAS
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    ap.add_argument("--replicas", type=int, default=10,
                    help="upsampling factor (10 = sf1-equivalent, "
                         "100 = sf10-equivalent for the 100x probe)")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset (the 100x probe needs "
                         "only lineitem,documents,embeddings)")
    args = ap.parse_args()
    REPLICAS = args.replicas
    only = set(args.tables.split(",")) if args.tables else None

    def want(name: str) -> bool:
        return only is None or name in only

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    for name in ("region", "nation"):
        if not want(name):
            continue
        con.execute(f"COPY (SELECT * FROM '{SRC}/{name}.parquet') TO "
                    f"'{args.out}/{name}.parquet' (FORMAT PARQUET)")
        print(f"{name}: copied (fixed dim)")

    def mx(name, col):
        return con.execute(
            f"SELECT max({col}) FROM '{SRC}/{name}.parquet'").fetchone()[0]

    cust_s = _stride(mx("customer", "c_custkey"))
    supp_s = _stride(mx("supplier", "s_suppkey"))
    part_s = _stride(mx("part", "p_partkey"))
    ord_s = _stride(mx("orders", "o_orderkey"))
    ev_s = _stride(mx("events", "event_id"))
    usr_s = _stride(mx("events", "user_id"))

    if want("customer"):
        upsample_relational(con, "customer", args.out,
                            {"c_custkey": cust_s},
                            ["c_nationkey", "c_acctbal", "c_mktsegment"],
                            {"c_name": "'Customer#' || lpad(CAST(c_custkey "
                                       "+ {c_custkey_shift} AS VARCHAR), "
                                       "9, '0')"})
    if want("supplier"):
        upsample_relational(con, "supplier", args.out,
                            {"s_suppkey": supp_s},
                            ["s_nationkey", "s_acctbal"],
                            {"s_name": "'Supplier#' || lpad(CAST(s_suppkey "
                                       "+ {s_suppkey_shift} AS VARCHAR), "
                                       "9, '0')"})
    if want("part"):
        upsample_relational(con, "part", args.out,
                            {"p_partkey": part_s},
                            ["p_name", "p_brand", "p_type", "p_size",
                             "p_retailprice"])
    if want("orders"):
        upsample_relational(con, "orders", args.out,
                            {"o_orderkey": ord_s, "o_custkey": cust_s},
                            ["o_orderstatus", "o_totalprice", "o_orderdate",
                             "o_orderpriority"])
    if want("lineitem"):
        upsample_relational(con, "lineitem", args.out,
                            {"l_orderkey": ord_s, "l_partkey": part_s,
                             "l_suppkey": supp_s},
                            ["l_linenumber", "l_quantity", "l_extendedprice",
                             "l_discount", "l_tax", "l_returnflag",
                             "l_linestatus", "l_shipdate"])
    if want("events"):
        upsample_relational(con, "events", args.out,
                            {"event_id": ev_s, "user_id": usr_s},
                            ["ts", "event_type", "value", "props"])
    for name in ("customer", "supplier", "part", "orders", "lineitem",
                 "events"):
        if not want(name):
            continue
        n = con.execute(f"SELECT count(*) FROM "
                        f"'{args.out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n}")

    if want("documents"):
        upsample_documents(args.out)
    if want("embeddings"):
        upsample_embeddings(args.out)
    print(f"fixture at {args.out}")


if __name__ == "__main__":
    main()
