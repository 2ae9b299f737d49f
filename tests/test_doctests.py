"""Doctest runner for pure functions (the reference embeds doctests in
its pure helpers — uri_to_gdal, _clean_name; SURVEY.md §5 tier 1)."""

import doctest

import eugl_spark.constants
import eugl_spark.oracle


def test_doctests():
    for mod in (eugl_spark.constants, eugl_spark.oracle):
        res = doctest.testmod(mod, verbose=False)
        assert res.failed == 0, (mod.__name__, res)
        assert res.attempted > 0, mod.__name__
