"""Drop-in API-surface parity with the reference SDK.

The reference's entire public contract is its top-level exports and
the abstract API classes (pypaimon/__init__.py:20-56,
pypaimon/api/__init__.py:19-45, and the signatures in
pypaimon/api/*.py). A user switching from the reference imports these
names and calls these methods — this test pins every one of them
against this package so a rename or signature drift fails CI, not the
user's pipeline. The expectations below are hardcoded FROM the
reference files (cited per class), not imported from it, so the test
runs without /root/reference mounted."""

import inspect

import paimon_python_spark as pkg

# pypaimon/__init__.py __all__ (minus nothing — all 16 names)
REFERENCE_TOP_LEVEL = [
    "Schema",
    "Catalog",
    "CommitMessage",
    "Predicate",
    "PredicateBuilder",
    "ReadBuilder",
    "RowType",
    "Split",
    "Table",
    "BatchTableCommit",
    "TableRead",
    "TableScan",
    "Plan",
    "BatchTableWrite",
    "BatchWriteBuilder",
]

# class → required methods, from the abstract defs in pypaimon/api/*.py
REFERENCE_METHODS = {
    # catalog.py:32-45
    "Catalog": ["create", "get_table", "create_database", "create_table"],
    # table.py:29-35
    "Table": ["new_read_builder", "new_batch_write_builder"],
    # read_builder.py:30-58
    "ReadBuilder": [
        "with_filter",
        "with_projection",
        "with_limit",
        "new_scan",
        "new_read",
        "new_predicate_builder",
        "read_type",
    ],
    # table_scan.py:28-37
    "TableScan": ["plan"],
    "Plan": ["splits"],
    # split.py:27-35
    "Split": ["row_count", "file_size", "file_paths"],
    # table_read.py:35-56
    "TableRead": [
        "to_arrow",
        "to_arrow_batch_reader",
        "to_pandas",
        "to_duckdb",
        "to_ray",
    ],
    # write_builder.py:28-40
    "BatchWriteBuilder": ["overwrite", "new_write", "new_commit"],
    # table_write.py:31-48
    "BatchTableWrite": [
        "write_arrow",
        "write_arrow_batch",
        "write_pandas",
        "prepare_commit",
        "close",
    ],
    # table_commit.py:28-36
    "BatchTableCommit": ["commit", "close"],
    # row_type.py:28
    "RowType": ["as_arrow"],
    # predicate.py:33-95 — the 16 leaf builders + the two combinators
    "PredicateBuilder": [
        "equal",
        "not_equal",
        "less_than",
        "less_or_equal",
        "greater_than",
        "greater_or_equal",
        "is_null",
        "is_not_null",
        "startswith",
        "endswith",
        "contains",
        "is_in",
        "is_not_in",
        "between",
        "and_predicates",
        "or_predicates",
    ],
}


def test_top_level_exports_match_reference():
    missing = [n for n in REFERENCE_TOP_LEVEL if not hasattr(pkg, n)]
    assert not missing, f"reference top-level names absent: {missing}"
    in_all = [n for n in REFERENCE_TOP_LEVEL if n not in pkg.__all__]
    assert not in_all, f"present but not re-exported via __all__: {in_all}"


def test_every_reference_method_exists():
    gaps = []
    for cls_name, methods in REFERENCE_METHODS.items():
        cls = getattr(pkg, cls_name)
        for m in methods:
            if not hasattr(cls, m):
                gaps.append(f"{cls_name}.{m}")
    assert not gaps, f"reference methods absent: {gaps}"


def _params(fn):
    return [
        p.name
        for p in inspect.signature(fn).parameters.values()
        if p.name not in ("self", "cls")
    ]


def test_signature_parameter_names_match_reference():
    """Positional/keyword parameter NAMES must match the reference's
    abstract defs — callers use keywords (e.g.
    ``create_database("d", ignore_if_exists=True)``)."""
    sig_expect = {
        # catalog.py:40: (name, ignore_if_exists, properties=None)
        ("Catalog", "create_database"): ["name", "ignore_if_exists", "properties"],
        # catalog.py:44: (identifier, schema, ignore_if_exists)
        ("Catalog", "create_table"): ["identifier", "schema", "ignore_if_exists"],
        # catalog.py:36
        ("Catalog", "get_table"): ["identifier"],
        # write_builder.py:28: overwrite(static_partition=None)
        ("BatchWriteBuilder", "overwrite"): ["static_partition"],
        # predicate.py:85
        ("PredicateBuilder", "between"): [
            "field",
            "included_lower_bound",
            "included_upper_bound",
        ],
    }
    drift = {}
    for (cls_name, meth), expect in sig_expect.items():
        got = _params(getattr(getattr(pkg, cls_name), meth))
        # extra trailing OPTIONAL params are fine (extension surface);
        # the reference's prefix must match exactly
        if got[: len(expect)] != expect:
            drift[f"{cls_name}.{meth}"] = (expect, got)
    assert not drift, f"parameter-name drift vs reference: {drift}"


def test_schema_constructor_matches_reference():
    # table.py:39-49: Schema(pa_schema, partition_keys, primary_keys,
    # options, comment)
    got = _params(pkg.Schema.__init__)
    assert got[:5] == [
        "pa_schema",
        "partition_keys",
        "primary_keys",
        "options",
        "comment",
    ]


def test_catalog_create_is_reference_shaped():
    # catalog.py:31-33: a no-instance factory taking catalog_options
    assert _params(pkg.Catalog.create)[:1] == ["catalog_options"]
    import pytest

    with pytest.raises(ValueError, match="warehouse"):
        pkg.Catalog.create({})
