"""Static style gates (stdlib-only).

The reference folds flakes/isort/mypy into pytest
(``/root/reference/pyproject.toml:81-86``); this image has no lint
tools installed and no egress to fetch them, so the highest-value
checks are enforced here with ``ast``: every source file parses, no
unused imports, and no stray ``print`` in library code. ``pyproject``
carries ruff/mypy configuration for environments that have the tools
(``make lint`` uses them when available and falls back to this test).
"""

from __future__ import annotations

import ast
from pathlib import Path

PACKAGE = Path(__file__).resolve().parents[1] / "fourierdiffusion_tpu"


def _module_files():
    return sorted(PACKAGE.rglob("*.py"))


def _imported_names(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                yield node, alias, (alias.asname or alias.name.split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name == "*":
                    continue
                yield node, alias, (alias.asname or alias.name)


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            root = node
            while isinstance(root, ast.Attribute):
                root = root.value
            if isinstance(root, ast.Name):
                used.add(root.id)
    return used


def test_all_sources_parse():
    assert _module_files(), "package sources not found"
    for path in _module_files():
        ast.parse(path.read_text(), filename=str(path))


def test_no_unused_imports():
    failures = []
    for path in _module_files():
        if path.name == "__init__.py":  # re-export indexes
            continue
        tree = ast.parse(path.read_text(), filename=str(path))
        used = _used_names(tree)
        exported = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__":
                        exported = {
                            e.value
                            for e in ast.walk(node.value)
                            if isinstance(e, ast.Constant)
                        }
        for node, alias, bound in _imported_names(tree):
            if bound == "annotations":  # from __future__ import annotations
                continue
            if bound.startswith("_") and bound.endswith("_"):
                continue
            if bound not in used and bound not in exported:
                failures.append(f"{path.relative_to(PACKAGE.parent)}:{node.lineno} "
                                f"unused import {bound!r}")
    assert not failures, "\n".join(failures)


def test_no_print_in_library_code():
    allowed = {"cli"}  # CLIs legitimately print their run id
    failures = []
    for path in _module_files():
        if path.parent.name in allowed:
            continue
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "print"
            ):
                failures.append(f"{path.relative_to(PACKAGE.parent)}:{node.lineno}")
    assert not failures, f"print() in library code: {failures}"


def test_public_api_fully_annotated():
    """Annotation-coverage gate (locally enforceable stand-in for the
    reference's strict-mypy pre-commit): every public top-level function
    and class method in the package annotates all parameters and the
    return type. Nested closures are exempt (their types are inferred
    from context and annotating them adds noise, not safety)."""

    def top_level_defs(tree: ast.Module):
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                yield node
            elif isinstance(node, ast.ClassDef):
                for sub in node.body:
                    if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        yield sub

    failures = []
    for path in _module_files():
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in top_level_defs(tree):
            if node.name.startswith("_"):
                continue
            args = node.args
            allargs = args.posonlyargs + args.args + args.kwonlyargs
            unannotated = [
                a.arg
                for a in allargs
                if a.annotation is None and a.arg not in ("self", "cls")
            ]
            if unannotated:
                failures.append(
                    f"{path.relative_to(PACKAGE.parent)}:{node.lineno} "
                    f"{node.name}: unannotated params {unannotated}"
                )
            if node.returns is None:
                failures.append(
                    f"{path.relative_to(PACKAGE.parent)}:{node.lineno} "
                    f"{node.name}: missing return annotation"
                )
    assert not failures, "\n".join(failures)
