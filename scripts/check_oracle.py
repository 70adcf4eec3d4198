"""Local mirror of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value digest (rows sorted, columns sorted by name,
floats rounded).  Prints one line per query: MATCH / MISMATCH / ERROR.

Usage: python scripts/check_oracle.py [--hostile] [sf_dir] [query ...]

--hostile runs the Spark side under driver-like adversarial confs
(non-UTC session timezone, 200 shuffle partitions) - queries must pin
everything they depend on, so results may not change.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")


def canon(rows, cols, strict=True):
    """strict=True: exact values (floats compared bitwise - queries are
    required to produce identical doubles in both engines, e.g. via
    round(x,4) on double-typed math).  strict=False re-rounds to 4
    decimals, used only to diagnose whether a mismatch is float-noise."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                v = int(v)
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif not strict:
                    v = round(v, 4)
                    v = 0.0 if v == 0 else v
                elif v == 0:
                    v = 0.0
            if v is None:
                v = "\x00NULL"
            vals.append(repr(v) if isinstance(v, float) else str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def norm_type(t: str) -> str:
    """Normalize a Spark dtype / DuckDB type string into a cross-engine
    family so typed-value hashing divergence is caught locally.

    Int widths (tinyint..bigint) collapse to 'int' (both engines hash
    them as Python ints), but HUGEINT and DECIMAL stay distinct: DuckDB
    sum(INTEGER) returns HUGEINT which pandas converts to float64, so the
    driver's value hash diverges even when the Python values look equal
    (round-1 root cause for 6 hash_match:false rows).  FLOAT also stays
    distinct from DOUBLE (float32 rounding diverges bitwise)."""
    t = t.strip().lower()
    if t.endswith("[]"):                       # duckdb list type
        return f"array<{norm_type(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{norm_type(t[6:-1])}>"
    if t.startswith("decimal"):
        return "decimal"
    return {
        "tinyint": "int", "smallint": "int", "int": "int",
        "integer": "int", "bigint": "int", "ubigint": "int",
        "uinteger": "int", "usmallint": "int", "utinyint": "int",
        "hugeint": "hugeint", "uhugeint": "hugeint",
        "float": "float", "real": "float", "double": "double",
        "varchar": "string", "string": "string", "text": "string",
        "blob": "binary", "binary": "binary",
        "boolean": "boolean", "bool": "boolean",
        "date": "date", "timestamp": "timestamp",
        "timestamp with time zone": "timestamp",
    }.get(t, t)


def type_mismatches(scols, stypes, dcols, dtypes):
    """Per-column (sorted by name) normalized-type diffs: [(col, s, d)]."""
    smap = {c: norm_type(t) for c, t in zip(scols, stypes)}
    dmap = {c: norm_type(str(t)) for c, t in zip(dcols, dtypes)}
    return [(c, smap[c], dmap[c]) for c in sorted(smap)
            if c in dmap and smap[c] != dmap[c]]


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from ccspark.session import get_spark

    args = sys.argv[1:]
    hostile = "--hostile" in args
    if hostile:
        args.remove("--hostile")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("check-oracle", cores=8)
    if hostile:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"{name}: ERROR spark: {str(e)[:300]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(srows)} (rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            dtypes = rel.types
            drows = rel.fetchall()
        except Exception as e:
            print(f"{name}: ERROR duckdb: {str(e)[:300]}")
            n_bad += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"{name}: MISMATCH schema spark={sorted(scols)} "
                  f"duck={sorted(dcols)}")
            n_bad += 1
            continue
        tdiff = type_mismatches(scols, stypes, dcols, dtypes)
        if tdiff:
            print(f"{name}: MISMATCH types {tdiff} "
                  f"(driver hashes typed values - HUGEINT/DECIMAL/FLOAT "
                  f"on the DuckDB side diverge even when values agree)")
            n_bad += 1
            continue
        if len(srows) != len(drows):
            print(f"{name}: MISMATCH rowcount spark={len(srows)} "
                  f"duck={len(drows)}")
            n_bad += 1
            continue
        cs, cd = canon(srows, scols), canon(drows, dcols)
        if cs != cd:
            if canon(srows, scols, strict=False) == \
                    canon(drows, dcols, strict=False):
                print(f"{name}: FLOAT-ULP MISMATCH (values equal after "
                      f"re-rounding - fix the query to produce identical "
                      f"doubles)")
                n_bad += 1
                continue
            diff = next(
                (i for i, (a, b) in enumerate(zip(cs, cd)) if a != b), -1)
            print(f"{name}: MISMATCH values rows={len(srows)} "
                  f"first_diff@{diff}:")
            if diff >= 0:
                print(f"   spark: {cs[diff][:220]}")
                print(f"   duck : {cd[diff][:220]}")
            n_bad += 1
            continue
        print(f"{name}: MATCH rows={len(srows)}")
        n_ok += 1
    print(f"== {n_ok} match, {n_bad} mismatch/error ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
