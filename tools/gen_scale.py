#!/usr/bin/env python3
"""Dev-only sf1 generator (NOT part of the Spark library): replicates
an sf0.1 testdata dir K times (default 10) with key-consistent offsets,
mirroring TPC-H scaling semantics — region/nation stay fixed, every
fact/dim table's keys shift by copy*stride so joins stay 1:1.

Content is de-correlated across copies so the dedup/ANN family sees
10x genuine data, not 10 artificial near-dup clusters:
  - documents.text tokens are salted per copy (cross-copy jaccard = 0)
  - embeddings are dim-rotated per copy (cross-copy cosine ~ random)

Usage: python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys, os
import duckdb

def main(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    def gen(table: str, body: str) -> None:
        sql = " UNION ALL ".join(
            f"SELECT {body.format(k=i)} FROM '{src}/{table}.parquet'"
            for i in range(k))
        con.sql(f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # fixed dimensions: copy through once
    for t in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: unchanged")

    def stride(table: str, key: str) -> int:
        return con.sql(
            f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

    c, s, p = stride("customer", "c_custkey"), stride("supplier", "s_suppkey"), \
        stride("part", "p_partkey")
    o, ev, u = stride("orders", "o_orderkey"), stride("events", "event_id"), \
        stride("events", "user_id")
    d, v = stride("documents", "doc_id"), stride("embeddings", "vec_id")

    gen("customer", f"c_custkey + {{k}}*{c} AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment")
    gen("supplier", f"s_suppkey + {{k}}*{s} AS s_suppkey, s_name, "
        "s_nationkey, s_acctbal")
    gen("part", f"p_partkey + {{k}}*{p} AS p_partkey, p_name, p_brand, "
        "p_type, p_size, p_retailprice")
    gen("orders", f"o_orderkey + {{k}}*{o} AS o_orderkey, "
        f"o_custkey + {{k}}*{c} AS o_custkey, o_orderstatus, o_totalprice, "
        "o_orderdate, o_orderpriority")
    gen("lineitem", f"l_orderkey + {{k}}*{o} AS l_orderkey, "
        f"l_partkey + {{k}}*{p} AS l_partkey, "
        f"l_suppkey + {{k}}*{s} AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "l_shipdate")
    gen("events", f"event_id + {{k}}*{ev} AS event_id, ts, "
        f"user_id + {{k}}*{u} AS user_id, event_type, value, props")
    # copy 0 keeps the original text; later copies salt every token
    gen("documents", f"doc_id + {{k}}*{d} AS doc_id, "
        "CASE WHEN {k} = 0 THEN text ELSE array_to_string("
        "list_transform(string_split(text, ' '), t -> 'c{k}' || t), ' ') "
        "END AS text, lang, source, "
        "CASE WHEN {k} = 0 THEN n_chars ELSE CAST(length(array_to_string("
        "list_transform(string_split(text, ' '), t -> 'c{k}' || t), ' ')) "
        "AS BIGINT) END AS n_chars")
    gen("embeddings", f"vec_id + {{k}}*{v} AS vec_id, "
        "CASE WHEN {k} = 0 THEN embedding ELSE "
        "list_concat(embedding[{k}+1:], embedding[:{k}]) END AS embedding, "
        "label")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
