"""Driver-contract smoke: entry()/queries()/oracle_sql() shape."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_entry_returns_rows(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    import ray.data

    assert isinstance(res, ray.data.Dataset)
    assert res.count() > 0
    names = res.schema().names
    assert "extracted_text" in names and "conv_id" in names


def test_queries_oracle_keys_align(ray_session):
    import __ray_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o).issubset(set(q)), "oracle entries without a query"
    assert len(q) >= 25


def test_module_does_not_own_ray(ray_session):
    """No ray.init/ray.shutdown CALLS anywhere in the entry module
    (docstrings may mention them)."""
    import ast
    import inspect

    import __ray_entry__ as e

    tree = ast.parse(inspect.getsource(e))
    calls = [
        node.func.attr
        for node in ast.walk(tree)
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
    ]
    assert "init" not in calls and "shutdown" not in calls
