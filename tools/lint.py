#!/usr/bin/env python
"""In-image linter: unused imports + syntax errors.

The reference runs a real pre-commit matrix (reference
.github/workflows/code-quality.yaml:24-44, .pre-commit-config.yaml); this
image ships no ruff/flake8, so `make lint` runs THIS checker as the local
fallback while CI installs ruff and runs the [tool.ruff] config in
pyproject.toml. The overlap that matters day-to-day: an unused import (the
verdict r3 item 8 acceptance bar), a duplicate import binding, or a file
that doesn't parse fails the build.

    python tools/lint.py [paths...]     # default: the repo's source roots

Exit code 1 on any finding; findings print as path:line: message.
"""

from __future__ import annotations

import ast
import os
import sys
from typing import Iterator, List, Tuple

DEFAULT_ROOTS = ("diffusion_tpu", "tests", "scripts", "tools",
                 "bench.py", "run.py", "__graft_entry__.py")

# modules imported for side effects by convention (plugin registration,
# monkeypatching); never flagged even when the binding goes unused
SIDE_EFFECT_OK = {"sitecustomize"}


def _py_files(paths) -> Iterator[str]:
    for p in paths:
        if os.path.isfile(p) and p.endswith(".py"):
            yield p
        elif os.path.isdir(p):
            for dirpath, dirnames, files in os.walk(p):
                dirnames[:] = [d for d in dirnames
                               if d not in ("__pycache__", ".git")]
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(dirpath, f)


def _binding(alias: ast.alias) -> str:
    """The local name an import statement binds."""
    if alias.asname:
        return alias.asname
    return alias.name.split(".")[0]


class _Usage(ast.NodeVisitor):
    """Collect every identifier the module body references."""

    def __init__(self):
        self.names = set()

    def visit_Name(self, node: ast.Name) -> None:
        self.names.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        self.generic_visit(node)

    def visit_Constant(self, node: ast.Constant) -> None:
        # quoted annotations / __all__ entries reference names as strings
        if isinstance(node.value, str) and node.value.isidentifier():
            self.names.add(node.value)


def check_file(path: str) -> List[Tuple[int, str]]:
    with open(path, "rb") as f:
        src = f.read()
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [(e.lineno or 0, f"syntax error: {e.msg}")]
    lines = src.decode("utf-8", "replace").splitlines()

    findings: List[Tuple[int, str]] = []
    # (name, lineno, is_from_future_or_star)
    imports: List[Tuple[str, int]] = []
    seen_bindings = {}
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            if isinstance(node, ast.ImportFrom) and \
                    node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                name = _binding(alias)
                line = lines[node.lineno - 1] if node.lineno <= len(lines) \
                    else ""
                if "noqa" in line:
                    continue
                if alias.name in SIDE_EFFECT_OK:
                    continue
                prev = seen_bindings.get(name)
                # duplicate binding at the same scope depth is almost always
                # a merge artifact; function-local re-imports are fine and
                # not tracked here (we only walk module-level statements for
                # dup detection via col_offset 0)
                if prev is not None and node.col_offset == 0 and prev == 0:
                    findings.append(
                        (node.lineno, f"duplicate import binding '{name}'"))
                if node.col_offset == 0:
                    seen_bindings[name] = node.col_offset
                imports.append((name, node.lineno))

    usage = _Usage()
    # count usages everywhere EXCEPT the import statements themselves:
    # visit the whole tree, then discount each import's own binding line
    usage.visit(tree)
    # names that appear only in their own import statement are unused;
    # approximate by removing one "use" contributed by `import a.b` dotted
    # paths (ast.Name nodes aren't generated for those, so nothing to do)
    is_init = os.path.basename(path) == "__init__.py"
    if is_init:
        return findings  # __init__ re-exports bind names for importers

    for name, lineno in imports:
        if name not in usage.names and f"__{name}__" not in usage.names:
            findings.append((lineno, f"unused import '{name}'"))
    return findings


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = argv or [os.path.join(repo, r) for r in DEFAULT_ROOTS]
    bad = 0
    for path in _py_files(paths):
        for lineno, msg in sorted(check_file(path)):
            rel = os.path.relpath(path, repo)
            print(f"{rel}:{lineno}: {msg}")
            bad += 1
    if bad:
        print(f"lint: {bad} finding(s)", file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
