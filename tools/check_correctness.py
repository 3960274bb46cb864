"""Local mimic of the driver's correctness gate (SURVEY.md §5.2).

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, sorted column names,
and order-insensitive values (columns sorted by name, rows sorted). Exact
equality is required — the engine's exact-decimal discipline makes even
double aggregates bit-identical. Floats that differ are reported with max
abs diff so near-misses are diagnosable.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _sortable(row):
    return tuple(str(v) for v in row)


def _type_family(t) -> str:
    """Coarse type family for cross-engine compatibility checks.

    The driver's value-hash is computed on *unnormalized* values, so a
    DuckDB HUGEINT/DECIMAL result hashes differently from a Spark BIGINT
    even when numerically identical (the round-1 hash-fail root cause).
    Comparing families (int vs decimal vs float ...) catches that class
    locally without false-flagging benign width differences (int32/int64).
    """
    s = str(t).lower()
    if "decimal" in s:
        return "decimal"
    if any(k in s for k in ("int8", "int16", "int32", "int64", "uint", "long", "integer", "short", "byte")):
        return "int"
    if any(k in s for k in ("float", "double")):
        return "float"
    if "bool" in s:
        return "bool"
    if "timestamp" in s:
        return "timestamp"
    if s.startswith("date") and "datetime" not in s:
        return "date"
    if any(k in s for k in ("string", "varchar", "utf8")):
        return "string"
    if any(k in s for k in ("binary", "blob")):
        return "binary"
    if any(k in s for k in ("list", "array")):
        return "list"
    if "struct" in s:
        return "struct"
    if "map" in s:
        return "map"
    return s


def compare_type_families(spark_schema, arrow_schema) -> list[str]:
    spark_fams = {f.name: _type_family(f.dataType) for f in spark_schema.fields}
    duck_fams = {f.name: _type_family(f.type) for f in arrow_schema}
    issues = []
    for name in sorted(set(spark_fams) & set(duck_fams)):
        if spark_fams[name] != duck_fams[name]:
            issues.append(
                f"typefam {name}: spark={spark_fams[name]} oracle={duck_fams[name]}"
            )
    return issues


def driver_shape_issues(sdf, spark_rows, spark_cols) -> list[str]:
    """Simulate the DRIVER's pandas canonicalizer on the Spark result.

    The driver canonicalizes with pandas sort_values -> factorize over raw
    collected values; columns whose cells are unhashable (numpy arrays
    from array<...> output, Row structs, dicts from maps) crash it with
    "unhashable type" — the exact round-2 minhash_signatures ERR. The
    oracle compare above tolerates those shapes (it stringifies), so this
    probe is the only local signal. Keep every query's output columns
    scalar."""
    import numpy as np
    import pandas as pd

    def _driver_cell(v):
        # Mimic the shapes the DRIVER sees (its pandas frame comes from
        # Arrow): Spark Row structs arrive as dicts (unhashable) and
        # array columns as numpy arrays (unhashable) — but collect() here
        # hands us hashable Row/tuple/list objects that would mask the
        # crash. Convert before probing.
        if hasattr(v, "asDict"):
            return v.asDict()
        if isinstance(v, (list, tuple)):
            return np.array(v, dtype=object)
        return v

    try:
        pdf = pd.DataFrame(
            [[_driver_cell(v) for v in r] for r in spark_rows], columns=spark_cols
        )
        if len(pdf):
            pdf.sort_values(by=list(spark_cols), inplace=False)
            for c in spark_cols:
                pd.factorize(pdf[c])
    except (TypeError, ValueError) as exc:
        return [f"driver-shape: pandas canonicalizer would crash: {exc}"]
    return []


def compare(spark_rows, spark_cols, duck_rows, duck_cols):
    issues = []
    if len(spark_rows) != len(duck_rows):
        issues.append(f"rowcount spark={len(spark_rows)} oracle={len(duck_rows)}")
    s_cols = sorted(spark_cols)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        issues.append(f"schema spark={s_cols} oracle={d_cols}")
        return issues, None
    s_idx = [spark_cols.index(c) for c in s_cols]
    d_idx = [duck_cols.index(c) for c in d_cols]
    s_sorted = sorted(
        ([_norm(r[i]) for i in s_idx] for r in spark_rows), key=_sortable
    )
    d_sorted = sorted(
        ([_norm(r[i]) for i in d_idx] for r in duck_rows), key=_sortable
    )
    if s_sorted == d_sorted:
        return issues, 0.0
    # Diagnose: max float diff across aligned rows, first differing cell.
    max_diff = 0.0
    n_bad = 0
    first = None
    for rs, rd in zip(s_sorted, d_sorted):
        for c, (a, b) in zip(s_cols, zip(rs, rd)):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                max_diff = max(max_diff, abs(a - b))
            n_bad += 1
            if first is None:
                first = f"col={c} spark={a!r} oracle={b!r}"
    issues.append(f"values: {n_bad} differing cells, max_float_diff={max_diff:.3e}, first: {first}")
    return issues, max_diff


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from dataflowjavasdk_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(spark_rows)} rows, {time.time()-t0:.2f}s)")
            if not spark_rows:
                print(f"WARN {name}: zero rows")
            continue
        try:
            cur = con.execute(sql)
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
            arrow_tb = con.execute(sql).fetch_arrow_table()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failed.append(name)
            continue
        issues, _ = compare(spark_rows, spark_cols, duck_rows, duck_cols)
        issues.extend(compare_type_families(sdf.schema, arrow_tb.schema))
        issues.extend(driver_shape_issues(sdf, spark_rows, spark_cols))
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues))
            failed.append(name)
        else:
            print(f"PASS {name} ({len(spark_rows)} rows, {time.time()-t0:.2f}s)")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
