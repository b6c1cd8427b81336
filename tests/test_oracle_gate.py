"""The local correctness gate (tools/check_oracle.py) must be
driver-faithful: full-precision value compare, signed zero distinct.

Round-4 lesson (VERDICT r4 #4): the old gate normalized floats with
``round(v, 4)`` and compared under Python ``==``, where ``-0.0 == 0.0`` —
so a Spark/DuckDB signed-zero divergence (graph_doc_modularity, 34/52 rows
red at the driver every run) passed the local gate.  These tests pin the
normalization contract so the gate can never regress into that blind spot.
"""

from collections import Counter

from tools.check_oracle import norm, rows_to_multiset


def test_norm_signed_zero_distinct():
    assert norm(-0.0) != norm(0.0)
    assert norm(-0.0) == "-0.0"
    assert norm(0.0) == "0.0"


def test_norm_full_precision_no_reround():
    # values 1e-6 apart used to collapse under round(v, 4)
    a, b = 0.12345, 0.1234500001
    assert round(a, 4) == round(b, 4)  # the old gate's blind spot
    assert norm(a) != norm(b)          # the new gate sees it


def test_norm_last_ulp_distinct():
    import math
    a = 1.0
    b = math.nextafter(a, 2.0)
    assert norm(a) != norm(b)


def test_norm_nan_equals_nan():
    # driver hashing treats NaN cells as equal; repr-normalization does too
    assert norm(float("nan")) == norm(float("nan"))


def test_norm_decimal_folds_to_double():
    import decimal
    assert norm(decimal.Decimal("1.5")) == norm(1.5)


def test_norm_nested_arrays_hashable_and_signed_zero():
    ms = rows_to_multiset(["a"], [([0.0, 1.0],)])
    md = rows_to_multiset(["a"], [([-0.0, 1.0],)])
    assert isinstance(ms, Counter) and ms != md


def test_multiset_column_order_insensitive():
    # the driver sorts columns by name before hashing; the gate must too
    ms = rows_to_multiset(["b", "a"], [(2.0, 1.0)])
    md = rows_to_multiset(["a", "b"], [(1.0, 2.0)])
    assert ms == md
