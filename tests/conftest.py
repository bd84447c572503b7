"""Shared fixtures: a session-scoped local SparkSession and reference loaders."""

from __future__ import annotations

import ast
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE = Path("/root/reference")


def load_reference_function(rel_path: str, func_name: str, extra_globals: dict | None = None):
    """Extract a single pure function from the reference tree and exec it.

    Used ONLY by parity tests: the reference modules themselves import
    unavailable services (pymssql, azure, flask), so we lift individual pure
    functions from their source at test time instead of importing. Nothing is
    copied into the repo.
    """
    source = (REFERENCE / rel_path).read_text()
    tree = ast.parse(source)
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.name == func_name:
            func_src = ast.get_source_segment(source, node)
            namespace: dict = dict(extra_globals or {})
            exec(textwrap.dedent(func_src), namespace)  # noqa: S102 - test-only parity harness
            return namespace[func_name]
    raise LookupError(f"{func_name} not found in {rel_path}")


@pytest.fixture(scope="session")
def spark():
    from crawler_spark.session import build_session

    session = build_session(app_name="crawler_spark_tests", cores=4, shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
