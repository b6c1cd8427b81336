"""Dev harness: run every registered query on Spark AND DuckDB at sf0.01 and
compare row count, column names, and order-insensitive values — a local twin
of the driver's CORRECTNESS gate. Usage:

    python tools/check_oracle.py [name ...]

Set SPARK_GRAFT_ORACLE_SF to another testdata dir (e.g.
/root/testdata/sf0.1) to re-run the whole gate at a different scale —
correctness at a 10× input catches scale-dependent divergence (sampling
thresholds, LIMIT ties, overflow) that the driver's fixed sf0.01 cannot.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, ".")

from dataset_crawler_spark.plans import queries as QL  # noqa: E402
from dataset_crawler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return round(v, 4)
    if isinstance(v, bool):
        return int(v)
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm(r[i]) for i in order) for r in rows)


def main(names):
    # SPARK_GRAFT_ORACLE_CORES: gate at a different parallelism — a pass at
    # two widths proves every query's VALUES are width-independent (the
    # north-rule determinism-under-parallelism requirement, checked against
    # an engine that has no notion of Spark partitioning at all)
    cores = int(os.environ.get("SPARK_GRAFT_ORACLE_CORES", "8"))
    spark = get_spark("oracle_check", cores=cores, shuffle_partitions=cores)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oq = QL.queries(), QL.oracle_sql()
    targets = names or sorted(qs)
    failed = []
    for name in targets:
        try:
            sdf = qs[name](spark, SF_DIR)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
            if name not in oq:
                print(f"  {name:32s} rows-only: {len(s_rows)} rows")
                continue
            d = con.sql(oq[name])
            d_cols = d.columns
            d_rows = d.fetchall()
            ok = True
            if sorted(s_cols) != sorted(d_cols):
                print(f"✗ {name}: columns {sorted(s_cols)} vs {sorted(d_cols)}")
                ok = False
            elif len(s_rows) != len(d_rows):
                print(f"✗ {name}: rowcount {len(s_rows)} vs {len(d_rows)}")
                ok = False
            else:
                ms, md = rows_to_multiset(s_cols, s_rows), rows_to_multiset(d_cols, d_rows)
                if ms != md:
                    diff = list((ms - md).items())[:3] + list((md - ms).items())[:3]
                    print(f"✗ {name}: value mismatch, e.g. {diff[:4]}")
                    ok = False
            if ok:
                print(f"✓ {name:32s} {len(s_rows)} rows")
            else:
                failed.append(name)
        except Exception as e:
            print(f"✗ {name}: EXCEPTION {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
    print(f"\n{len(targets) - len(failed)}/{len(targets)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
