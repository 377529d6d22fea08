"""Property-based tests (hypothesis): the Catalyst re-expressions must
equal straightforward in-Python derivations of the reference semantics on
arbitrary small inputs — catches edge cases fixed fixtures miss."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ids = st.text(alphabet="abc", min_size=0, max_size=3)
_vals = st.integers(min_value=-5, max_value=5)


@st.composite
def dedup_frames(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = [
        (
            draw(_vals),            # c0: sort column (numeric)
            draw(_ids),             # c1: key column
            draw(_ids),             # c2: payload / tiebreak
        )
        for _ in range(n)
    ]
    return rows


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=dedup_frames(), asc=st.booleans())
def test_dedup_criterion_matches_reference_order(spark, rows, asc):
    # keep-first per key under (sort col asc/desc, remaining cols asc)
    # total order — the min_by fast path must equal the explicit sort
    from pheknowlator_spark.operators.edge_list import compile_criterion

    df = spark.createDataFrame(rows, "c0 int, c1 string, c2 string")
    crit = f"0-1;dedup;{'asc' if asc else 'desc'}"
    got = {tuple(r) for r in compile_criterion(df, crit).collect()}

    ordered = sorted(
        rows, key=lambda r: ((r[0] if asc else -r[0]), r[2])
    )
    expected = {}
    for r in ordered:
        expected.setdefault(r[1], r)
    assert got == set(expected.values())


@st.composite
def packed_frames(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    cell = st.lists(
        st.text(alphabet="xyz", min_size=0, max_size=2), min_size=0, max_size=3
    ).map("|".join)
    return [
        (str(i), draw(cell), draw(cell)) for i in range(n)
    ]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=packed_frames())
def test_explodes_data_matches_reference(spark, rows):
    # reference semantics (data_utils.py:293-330): per column, split on the
    # delimiter, drop empty fragments, keep empty-list rows as fill_value;
    # columns explode independently (recursion = cross product per row)
    from pheknowlator_spark.operators.edge_list import explodes_data

    df = spark.createDataFrame(rows, "id string, a string, b string")
    got = sorted(
        (r.id, r.a, r.b)
        for r in explodes_data(df, ["a", "b"], "|").collect()
    )

    def frags(cell):
        parts = [x for x in cell.split("|") if x != ""]
        return parts or ["None"]

    expected = sorted(
        (i, fa, fb)
        for i, a, b in rows
        for fa in frags(a)
        for fb in frags(b)
    )
    assert got == expected
