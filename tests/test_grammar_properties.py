"""Property tests for the round-13 statement grammar: ANY declarable
table must survive parse -> render -> parse unchanged (the SHOW CREATE
TABLE round-trip at the grammar level, without a SparkSession), and the
IN-list blanking that powers the MV residual prover must never let a
non-literal list through.
"""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from tf_aws_lakeformation_governed_datalake_demo_spark.statements import (
    CreateTableStatement,
    parse_statement,
    predicate_columns,
)

_IDENT = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.lower()
    not in {
        "comment", "location", "stored", "partitioned", "by", "as",
        "table", "external", "create", "if", "not", "exists",
        # predicate keywords are excluded from identifier scans by
        # design, so they are not valid test column names either
        "and", "or", "in", "between", "like", "is", "null", "true",
        "false", "select",
    }
)
_TYPE = st.sampled_from(
    [
        "string", "int", "bigint", "double", "float", "boolean",
        "date", "timestamp", "decimal(10,2)", "array<float>",
        "map<string,int>", "struct<a:int,b:string>",
    ]
)
# comments may hold anything except the escapes the grammar defines;
# doubled quotes are the escape under test
_COMMENT = st.text(
    alphabet=st.characters(blacklist_characters="\\"), max_size=20
)


def _render(s: CreateTableStatement) -> str:
    def q(c):
        return c.replace("'", "''")

    cols = ", ".join(
        f"{n} {t}" + (f" COMMENT '{q(c)}'" if c is not None else "")
        for n, t, c in s.columns
    )
    pby = (
        " PARTITIONED BY ("
        + ", ".join(
            f"{n} {t}" + (f" COMMENT '{q(c)}'" if c is not None else "")
            for n, t, c in s.partitioned_by
        )
        + ")"
        if s.partitioned_by
        else ""
    )
    ine = "IF NOT EXISTS " if s.if_not_exists else ""
    return (
        f"CREATE EXTERNAL TABLE {ine}{s.target} ({cols}){pby} "
        f"STORED AS PARQUET LOCATION '{s.location}'"
    )


@given(
    cols=st.lists(
        st.tuples(_IDENT, _TYPE, st.none() | _COMMENT), min_size=1, max_size=5
    ),
    pby=st.lists(
        st.tuples(_IDENT, st.sampled_from(["string", "int"]), st.none() | _COMMENT),
        max_size=2,
    ),
    ine=st.booleans(),
)
def test_create_table_parse_render_roundtrip(cols, pby, ine):
    names = [c[0].lower() for c in cols] + [p[0].lower() for p in pby]
    if len(set(names)) != len(names):
        return  # duplicate columns refuse by design; not a round-trip case
    stmt = CreateTableStatement(
        "db.t",
        tuple((n, t, c) for n, t, c in cols),
        "/lake/t",
        tuple(pby),
        ine,
    )
    reparsed = parse_statement(_render(stmt))
    assert reparsed == stmt


@given(
    col=_IDENT,
    lits=st.lists(
        st.text(alphabet=st.characters(blacklist_characters="\\"), max_size=10),
        min_size=1,
        max_size=4,
    ),
)
def test_literal_in_list_always_yields_only_the_column(col, lits):
    """predicate_columns on ``col IN ('lit', ...)`` must see exactly
    {col} for ANY literal content — including literals containing
    'and', parens, or keywords — and must fail closed the moment a
    bare identifier appears in the list."""
    quoted = ", ".join("'" + s.replace("'", "''") + "'" for s in lits)
    got = predicate_columns(f"{col} IN ({quoted})")
    assert got == {col}
    # a bare identifier in the list is not a literal list: fail closed
    assert predicate_columns(f"{col} IN ({quoted}, other_col)") is None


# ---- round-14 ALTER forms ------------------------------------------------

from tf_aws_lakeformation_governed_datalake_demo_spark.statements import (  # noqa: E402
    AddConstraintStatement,
    AddFilesStatement,
    MsckRepairStatement,
    TruncateTableStatement,
    UnsupportedStatementError,
    WidenColumnStatement,
)


@given(db=_IDENT, tbl=_IDENT, col=_IDENT, typ=_TYPE)
def test_widen_both_spellings_parse_identically(db, tbl, col, typ):
    a = parse_statement(
        f"ALTER TABLE {db}.{tbl} ALTER COLUMN {col} TYPE {typ}"
    )
    b = parse_statement(
        f"ALTER TABLE {db}.{tbl} ALTER COLUMN {col} SET DATA TYPE {typ}"
    )
    assert isinstance(a, WidenColumnStatement)
    assert (a.target, a.column, a.ddl_type) == (b.target, b.column, b.ddl_type)
    assert a.ddl_type == typ


@given(db=_IDENT, tbl=_IDENT, name=_IDENT, depth=st.integers(0, 4))
def test_add_constraint_expr_survives_nested_parens(db, tbl, name, depth):
    expr = "v < 100"
    for _ in range(depth):
        expr = f"({expr} AND (1 = 1))"
    s = parse_statement(
        f"ALTER TABLE {db}.{tbl} ADD CONSTRAINT {name} CHECK ({expr})"
    )
    assert isinstance(s, AddConstraintStatement)
    assert s.expr == expr  # the balanced-paren span is exact
    # trailing junk after the balanced span refuses
    import pytest

    with pytest.raises(UnsupportedStatementError):
        parse_statement(
            f"ALTER TABLE {db}.{tbl} ADD CONSTRAINT {name} "
            f"CHECK ({expr}) EXTRA"
        )


@given(db=_IDENT, tbl=_IDENT)
def test_round14_verbs_parse_and_malformed_refuse(db, tbl):
    import pytest

    assert isinstance(
        parse_statement(f"ALTER TABLE {db}.{tbl} ADD FILES '/x/y'"),
        AddFilesStatement,
    )
    assert isinstance(
        parse_statement(f"TRUNCATE TABLE {db}.{tbl}"),
        TruncateTableStatement,
    )
    assert isinstance(
        parse_statement(f"MSCK REPAIR TABLE {db}.{tbl}"),
        MsckRepairStatement,
    )
    for bad in (
        f"ALTER TABLE {db}.{tbl} ADD FILES /x/y",  # unquoted path
        f"TRUNCATE {db}.{tbl}",  # missing TABLE
        f"MSCK REPAIR {db}.{tbl}",
        f"ALTER TABLE {db}.{tbl} ALTER COLUMN TYPE bigint",  # no column
    ):
        with pytest.raises(UnsupportedStatementError):
            parse_statement(bad)
