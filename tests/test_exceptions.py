"""Error-taxonomy tests, ported from the reference's deterministic
error-handling semantics (tests/unit/test_error_handling.py: base
creation, inheritance, context preservation, chaining, missing/invalid
stage files, CLI error pipeline) onto the engine's failure sites."""

import pytest

from pdf_plumber_util_spark.exceptions import (
    EngineError,
    PageRangeError,
    SchemaMismatchError,
    SourceError,
    SourceNotFoundError,
)


def test_base_exception_creation():
    e = EngineError("boom", suggestion="try harder", context={"k": 1})
    assert str(e) == "boom"
    assert e.message == "boom" and e.suggestion == "try harder"
    assert e.context == {"k": 1} and e.original_error is None
    r = e.render()
    assert "ERROR: boom" in r and "Suggestion: try harder" in r and "k=1" in r


def test_exception_inheritance():
    e = SourceNotFoundError("/x/y")
    assert isinstance(e, SourceError) and isinstance(e, EngineError)
    assert isinstance(e, Exception)
    assert isinstance(SchemaMismatchError("/p", ["a"], ["b"]), SourceError)
    assert isinstance(PageRangeError("x"), EngineError)


def test_context_preservation_and_chaining():
    orig = ValueError("bad int")
    e = SourceNotFoundError("/data/t.parquet", fmt="parquet",
                            original_error=orig, context={"stage": "lines"})
    assert e.context["path"] == "/data/t.parquet"
    assert e.context["format"] == "parquet"
    assert e.context["stage"] == "lines"
    assert e.original_error is orig
    assert e.suggestion  # default suggestion generated


def test_missing_lines_stage(spark, tmp_path):
    from pdf_plumber_util_spark.plans.io import read_lines_stage

    missing = str(tmp_path / "nope_lines")
    with pytest.raises(SourceNotFoundError) as ei:
        read_lines_stage(spark, missing)
    assert ei.value.context["path"] == missing
    assert ei.value.original_error is not None


def test_invalid_lines_stage_schema(spark, tmp_path):
    from pdf_plumber_util_spark.plans.io import read_lines_stage

    p = str(tmp_path / "not_lines")
    spark.createDataFrame([(1, "x")], "a int, b string").write.parquet(p)
    with pytest.raises(SchemaMismatchError) as ei:
        read_lines_stage(spark, p)
    assert set(ei.value.context["missing_columns"]) == {
        "url", "page", "line_number", "text"
    }
    assert "a" in ei.value.context["present_columns"]


def test_page_range_errors_and_valid_forms():
    from pdf_plumber_util_spark.plans.io import parse_page_range

    with pytest.raises(PageRangeError) as ei:
        parse_page_range("abc", 10)
    assert ei.value.context["spec"] == "abc"
    assert isinstance(ei.value.original_error, ValueError)
    with pytest.raises(PageRangeError):
        parse_page_range("1-3,x", 10)
    # the valid forms keep their exact pre-taxonomy semantics
    assert parse_page_range("1-3,5", 10) == [1, 2, 3, 5]
    assert parse_page_range("-4", 10) == [1, 2, 3, 4]
    assert parse_page_range("8-", 10) == [8, 9, 10]
    assert parse_page_range("", 10) == []
    assert parse_page_range("7,99", 10) == [7]


def test_cli_error_pipeline(tmp_path, capsys):
    """The CLI renders message+suggestion and exits 2 instead of a
    traceback (reference cli.py handle_* behavior)."""
    from pdf_plumber_util_spark.cli import main

    rc = main([
        "analyze",
        "--lines", str(tmp_path / "does_not_exist"),
        "--output", str(tmp_path / "out"),
        "--cores", "2",
    ])
    assert rc == 2
    err = capsys.readouterr().err
    assert "ERROR: Input not found" in err
    assert "Suggestion:" in err
