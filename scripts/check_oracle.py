#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tooling only — the
shipped library is pure Scala/Spark; duckdb is used here exactly the way
the driver uses it).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Expects `graft.Verify` to have already written <verifyOutDir>/<query>/ parquet
dirs plus <verifyOutDir>/oracle_sql.json. Registers each test table as a
DuckDB view over the same parquet, runs each oracle, and compares with the
Spark result: schema (sorted column names), row count, and cell values in
row order.
"""
import json
import struct
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_type(t: pa.DataType) -> str:
    """Canonical type string matching the DRIVER's equivalence (calibrated
    against CORRECTNESS_r06: every class listed here as folded passes the
    driver's hash with mismatched raw arrow types; decimal-vs-int does
    NOT — the q170/q196 failures).

    Folded (driver canonicalizes, pandas-style):
      - integer widths  (int32 == int64: q22 rnk, q51 bucket)
      - timestamp UNIT  (Spark INT96 parquet reads as ns, DuckDB emits us;
        every windowing query) — tz-awareness is NOT folded
      - float32 == float64, large_string/binary == string/binary,
        date32 == date64
    Kept distinct (driver hash-fails on value-equal data):
      - decimal (any precision/scale) vs integer/float — DECIMAL must be
        cast away before the final select
      - string vs anything, tz-aware vs naive timestamps
    Inner field NAMES are ignored (Spark 'element' vs DuckDB 'l')."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return f"timestamp[tz={t.tz}]"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)},{canon_type(t.item_type)}>"
    return str(t)


def norm(v):
    """Bit-exact normalization: floats compare by raw IEEE-754 bytes
    (±0.0 and NaN-payload sensitive, matching the driver's
    representation hash); Decimals compare exactly, NOT via float.
    Recurses through list/tuple/dict cells so floats nested inside
    array/struct/map columns get the same treatment as top-level ones
    (a NaN inside an array would otherwise compare NaN != NaN)."""
    if isinstance(v, float):
        return struct.pack("<d", v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    n_pass = n_fail = n_noracle = 0
    # A query that THROWS inside graft.Verify writes no output dir at
    # all — without this check it would silently vanish from the report
    # (bitten once: an artifact-rename collision killed 3 queries and
    # the gate still said "0 fail").
    have = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    for name in sorted(set(oracles) - have):
        print(f"FAIL {name}: query produced no output (Verify error?)")
        n_fail += 1
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        files = sorted(qdir.glob("*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        # Read EVERY part file (in part-number order, which preserves the
        # global sort) — not just files[0]; a multi-part output would
        # otherwise silently drop rows.
        spark_tbl = pa.concat_tables([pq.read_table(f) for f in files])
        if name not in oracles:
            print(f"....... {name}: no oracle (rows-only), rows={spark_tbl.num_rows}")
            n_noracle += 1
            continue
        try:
            duck = con.execute(oracles[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue

        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        s_types = {c: canon_type(spark_tbl.schema.field(c).type) for c in s_cols}
        d_types = {c: canon_type(duck.schema.field(c).type) for c in d_cols}
        type_bad = [c for c in s_cols if s_types[c] != d_types[c]]
        if type_bad:
            diffs = ", ".join(f"{c}: spark={s_types[c]} duck={d_types[c]}"
                              for c in type_bad)
            print(f"FAIL {name}: arrow types differ — {diffs}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck.num_rows}")
            n_fail += 1
            continue
        s_rows = [[norm(spark_tbl.column(c)[i].as_py()) for c in s_cols]
                  for i in range(spark_tbl.num_rows)]
        d_rows = [[norm(duck.column(c)[i].as_py()) for c in d_cols]
                  for i in range(duck.num_rows)]
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if bad:
            def show(row):
                return [struct.unpack("<d", v)[0] if isinstance(v, bytes)
                        and len(v) == 8 else v for v in row]
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first @{i}:")
            print(f"  cols : {s_cols}")
            print(f"  spark: {show(a)}")
            print(f"  duck : {show(b)}")
            n_fail += 1
        else:
            print(f"PASS    {name}: rows={spark_tbl.num_rows}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
