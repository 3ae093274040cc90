"""The local correctness-gate replica must be driver-faithful: its pass
set must be a SUBSET of the real driver's pass set.

Round 9 shipped a red gate row precisely because it wasn't: the driver
canonicalizes results with a pandas DataFrame `sort_values` over all
output columns (list cells → `TypeError: unhashable type: 'list'` inside
pandas' factorize), while `tools/verify_local.py` canonicalized
list→tuple and happily sorted. The fixture below is the committed r9
break: a `bin_docs` array<string>-shaped column.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from verify_local import driver_canon_check, table_hash  # noqa: E402


R9_BREAK_ROWS = [  # pack_sequences output shape, bin_docs as a raw list
    (101, 7, ["0:101:7", "7:102:3"]),
    (102, 3, ["0:101:7", "7:102:3"]),
]
R9_COLS = ["doc_id", "n_tokens", "bin_docs"]


def test_replica_fails_array_columns_the_way_the_driver_does():
    with pytest.raises(TypeError, match="unhashable"):
        driver_canon_check(R9_BREAK_ROWS, R9_COLS)
    with pytest.raises(TypeError, match="unhashable"):
        table_hash(R9_BREAK_ROWS, R9_COLS)


def test_replica_still_hashes_serialized_rows():
    rows = [(101, 7, "0:101:7|7:102:3"), (102, 3, "0:101:7|7:102:3")]
    h1 = table_hash(rows, R9_COLS)
    h2 = table_hash(list(reversed(rows)), R9_COLS)  # order-insensitive
    assert h1 == h2


def test_replica_accepts_none_and_floats():
    rows = [(None, 1.5, "a"), (2, float("nan"), "b")]
    assert table_hash(rows, ["x", "y", "z"])
