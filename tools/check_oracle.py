"""Dev harness: run every registered query on Spark AND DuckDB at sf0.01 and
compare row count, column names, and order-insensitive values — a local twin
of the driver's CORRECTNESS gate. Usage:

    python tools/check_oracle.py [--floats-only] [--sweep] [name ...]

Driver-parity contract (VERDICT r4 #4 — why this gate is strict):

* FULL-precision value compare: floats are normalized with ``repr(v)`` —
  no re-rounding, and **signed zero is distinct** (``repr(-0.0)`` is
  ``'-0.0'``).  The round-4 driver red row ``graph_doc_modularity`` was a
  pure -0.0/+0.0 divergence that the old ``round(v, 4)`` + Python ``==``
  normalization (where ``-0.0 == 0.0``) was structurally blind to.  A query
  passes this gate only if every cell's repr matches the twin's bit-for-bit.
* ``--floats-only`` restricts the run to queries whose Spark schema contains
  a float/double column — the population exposed to FP-order flake.
* ``--sweep`` re-runs the gate in subprocesses at 2 widths × 2
  shuffle-partition counts — (8, 8), (8, 200), (32, 32), (32, 200) — so an
  accumulation-order dependence that happens to agree with DuckDB at one
  partitioning is still caught at another.  Combine: ``--sweep
  --floats-only`` is the determinism audit for every float-emitting query.

Set SPARK_GRAFT_ORACLE_SF to another testdata dir (e.g.
/root/testdata/sf0.1) to re-run the whole gate at a different scale —
correctness at a 10× input catches scale-dependent divergence (sampling
thresholds, LIMIT ties, overflow) that the driver's fixed sf0.01 cannot.
SPARK_GRAFT_ORACLE_CORES / SPARK_GRAFT_ORACLE_SHUFFLE pick the width (the
--sweep subprocesses set both).
"""

from __future__ import annotations

import decimal
import os
import subprocess
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

#: --sweep grid: (cores, shuffle partitions). Two widths × two shuffle
#: counts — the exact matrix VERDICT r4 #3 asks for.
SWEEP = [(8, 8), (8, 200), (32, 32), (32, 200)]

_FLOATY = ("float", "double", "decimal")


def norm(v):
    # Driver-faithful: full precision, signed zero distinct, NaN == NaN
    # (repr equality), Decimal folded to the double it would hash as.
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm(r[i]) for i in order) for r in rows)


def _has_float(sdf) -> bool:
    return any(any(t in dt for t in _FLOATY) for _, dt in sdf.dtypes)


def run_gate(names, floats_only=False):
    cores = int(os.environ.get("SPARK_GRAFT_ORACLE_CORES", "8"))
    shuffle = int(os.environ.get("SPARK_GRAFT_ORACLE_SHUFFLE", str(cores)))
    spark = get_spark("oracle_check", cores=cores, shuffle_partitions=shuffle)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oq = QL.queries(), QL.oracle_sql()
    targets = names or sorted(qs)
    failed, checked = [], 0
    for name in targets:
        try:
            sdf = qs[name](spark, SF_DIR)
            if floats_only and not _has_float(sdf):
                continue
            checked += 1
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
    print(f"\n[{cores}c/{shuffle}sp] {checked - len(failed)}/{checked} ok; failed: {failed}")
    return 1 if failed else 0


def run_sweep(names, floats_only):
    rc = 0
    for cores, shuffle in SWEEP:
        print(f"=== sweep: cores={cores} shuffle_partitions={shuffle} ===")
        env = dict(os.environ, SPARK_GRAFT_ORACLE_CORES=str(cores),
                   SPARK_GRAFT_ORACLE_SHUFFLE=str(shuffle))
        argv = [sys.executable, os.path.abspath(__file__)]
        if floats_only:
            argv.append("--floats-only")
        argv += names
        rc |= subprocess.call(argv, env=env)
    return rc


def main(argv):
    floats_only = "--floats-only" in argv
    sweep = "--sweep" in argv
    names = [a for a in argv if not a.startswith("--")]
    if sweep:
        return run_sweep(names, floats_only)
    return run_gate(names, floats_only)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
