"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, compare
row count, schema (column names) and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# heap is sized at JVM-launch time by the entry point
from spark_on_hbase_spark.session import size_driver_heap_for_launch  # noqa: E402

size_driver_heap_for_launch()

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip repr keeps full precision; exact match is the goal
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("\x01".join(normalize(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, lines


def column_checksums(columns, rows):
    """Per-column canonical checksum (sorted rendered values) so a frame
    hash mismatch names the diverging column(s) instead of a bare boolean.

    Heuristic caveat (ADVICE r10): sorting each column INDEPENDENTLY makes
    the checksum blind to correlated divergence — two columns whose values
    are swapped between rows on the two engines checksum equal per column.
    row_paired_column_checksums below closes that: it pairs rows by the
    full sorted row tuple first, so a correlated divergence still names
    the first column at which the paired rows differ."""
    out = {}
    for i, c in enumerate(columns):
        vals = sorted(normalize(r[i]) for r in rows)
        out[c] = hashlib.md5("\n".join(vals).encode()).hexdigest()[:12]
    return out


def row_paired_column_checksums(columns, rows):
    """Per-column checksum over rows sorted by the FULL row tuple (columns
    in sorted-name order), so values stay attached to their rows: catches
    correlated divergence that per-column sorting hides."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    ranked = sorted(tuple(normalize(r[i]) for i in order) for r in rows)
    out = {}
    for pos, i in enumerate(order):
        vals = "\n".join(t[pos] for t in ranked)
        out[columns[i]] = hashlib.md5(vals.encode()).hexdigest()[:12]
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from spark_on_hbase_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    # Engine fingerprint: a driver/local divergence (r9's four hash-reds)
    # should be diagnosable from the log, not forensics.
    print(f"ENVINFO duckdb={duckdb.__version__} spark={spark.version} "
          f"python={sys.version.split()[0]} sf_dir={sf_dir}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = [c.lower() for c in df.columns]
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only check, {len(spark_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [c.lower() for c in [d[0] for d in res.description]]
            duck_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = []
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        # Physical-type divergence (e.g. DuckDB HUGEINT vs Spark BIGINT) can
        # fail the driver's hasher even when Python values match — surface it.
        duck_types = {c.lower(): str(t) for c, t in
                      zip([d[0] for d in res.description],
                          [d[1] for d in res.description])}
        spark_types = {f.name.lower(): f.dataType.simpleString() for f in df.schema.fields}
        _EQUIV = {
            "HUGEINT": {"hugeint"},  # never equivalent to anything Spark has
            "BIGINT": {"bigint"}, "INTEGER": {"int"}, "DOUBLE": {"double"},
            "VARCHAR": {"string"}, "BOOLEAN": {"boolean"},
        }
        for c in duck_types:
            dt, st = duck_types[c], spark_types.get(c, "?")
            if dt in _EQUIV and st not in _EQUIV[dt]:
                # The driver's hasher is type-sensitive: a HUGEINT oracle
                # column hash-mismatches a BIGINT Spark column even when the
                # Python values are equal (r9 shipped four such regressions).
                # Treat the divergence as a failure so local == driver.
                problems.append(
                    f"physical type: column {c} duck={dt} spark={st}"
                )
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            sh, slines = frame_fingerprint(spark_cols, spark_rows)
            dh, dlines = frame_fingerprint(duck_cols, duck_rows)
            if sh != dh:
                diffs = [(a, b) for a, b in zip(slines, dlines) if a != b][:3]
                problems.append(f"valuehash: first diffs {diffs}")
                scs = column_checksums(spark_cols, spark_rows)
                dcs = column_checksums(duck_cols, duck_rows)
                bad = [c for c in scs if scs[c] != dcs.get(c)]
                if bad:
                    problems.append(f"diverging columns: {bad}")
                else:
                    # Independent per-column sort is blind to correlated
                    # divergence; re-checksum with rows paired by the full
                    # row tuple so a swap still names its columns.
                    sps = row_paired_column_checksums(spark_cols, spark_rows)
                    dps = row_paired_column_checksums(duck_cols, duck_rows)
                    badp = [c for c in sps if sps[c] != dps.get(c)]
                    problems.append(
                        f"diverging columns (row-paired): {badp or 'none — identical multisets, differing row pairing'}"
                    )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"PASS  {name}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{n_run - len(failures)}/{n_run} ok")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
