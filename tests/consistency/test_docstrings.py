"""Docstring coverage enforcement (≈ reference tests/consistency/test_docstrings.py).

Every module, public top-level class/function, and public method in
``avex_tpu`` must carry a docstring — the reference enforces the same
invariant as a test so provenance citations and behavior notes stay with the
code.
"""

import ast
from pathlib import Path

PACKAGE = Path(__file__).resolve().parents[2] / "avex_tpu"


def _missing() -> list:
    missing = []
    for path in sorted(PACKAGE.rglob("*.py")):
        tree = ast.parse(path.read_text())
        rel = path.relative_to(PACKAGE.parent)
        if not ast.get_docstring(tree):
            missing.append(f"{rel}: module")

        def check(body, prefix=""):
            for node in body:
                if isinstance(node, ast.ClassDef):
                    if not node.name.startswith("_") and not ast.get_docstring(node):
                        missing.append(f"{rel}:{node.lineno}: class {node.name}")
                    check(node.body, prefix=node.name + ".")
                elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if not node.name.startswith("_") and not ast.get_docstring(node):
                        missing.append(f"{rel}:{node.lineno}: {prefix}{node.name}")

        check(tree.body)
    return missing


def test_public_api_has_docstrings():
    missing = _missing()
    assert not missing, "missing docstrings:\n" + "\n".join(missing)
