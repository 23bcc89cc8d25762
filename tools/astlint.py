"""AST hygiene gate for `make check` — the pyflakes/ruff-subset linter.

The reference gates on ruff + mypy + vulture + deptry via pre-commit
(`.pre-commit-config.yaml:12-47`, `Makefile:13-16`). None of those tools
exist in this image (no pip egress), so this implements the highest-value
checks natively on `ast`:

  F401  unused imports
  F821  undefined names (module-wide binding analysis)
  F811  duplicate top-level/class-level definitions (the reference itself
        ships this bug: `compute_fisher_sensitivity` defined twice,
        `hessian_sensitivity_test.py:466,668`)
  F541  f-string without placeholders
  B006  mutable default argument
  E711  comparison to None with ==/!=
  E722  bare except

Scans the package + bench.py + __graft_entry__.py + tools/ + tests/
(F401 skipped for tests: pytest fixtures are referenced by parameter name).
"""
from __future__ import annotations

import ast
import builtins
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__",
                                 "__package__", "__spec__", "__builtins__",
                                 "__debug__", "__path__", "__class__"}


def _noqa(lines: list[str], lineno: int) -> bool:
    return 0 < lineno <= len(lines) and "noqa" in lines[lineno - 1]


def _bound_names(tree: ast.AST) -> set[str]:
    """Every name bound anywhere in the module (stores, args, defs, imports,
    targets, pattern captures). A module-wide flat set: scoping-exact F821
    needs a full symtable walk; flat binding catches typos with ~zero false
    positives, which is the right trade for a gate."""
    bound: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(
                node.ctx, (ast.Store, ast.Del)):
            bound.add(node.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, ast.arg):
            bound.add(node.arg)
        elif isinstance(node, ast.Import):
            for a in node.names:
                bound.add((a.asname or a.name).split(".")[0])
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name != "*":
                    bound.add(a.asname or a.name)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            bound.add(node.name)
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            bound.update(node.names)
        elif isinstance(node, ast.MatchAs) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchStar) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchMapping) and node.rest:
            bound.add(node.rest)
    return bound


def _check_file(p: pathlib.Path, check_imports: bool) -> list[str]:
    src = p.read_text()
    rel = p.relative_to(ROOT)
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax error: {e.msg}"]
    lines = src.splitlines()
    out: list[str] = []

    # F401 unused imports
    if check_imports:
        imported: dict[str, int] = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    imported[(a.asname or a.name).split(".")[0]] = node.lineno
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    if a.name != "*":
                        imported[a.asname or a.name] = node.lineno
        is_pkg_init = p.name == "__init__.py"
        for name, line in imported.items():
            if _noqa(lines, line) or is_pkg_init:
                continue
            if src.count(name) <= 1:
                out.append(f"{rel}:{line}: F401 unused import {name}")

    # F821 undefined names
    bound = _bound_names(tree) | BUILTINS
    star_import = any(isinstance(n, ast.ImportFrom)
                      and any(a.name == "*" for a in n.names)
                      for n in ast.walk(tree))
    if not star_import:
        for node in ast.walk(tree):
            if (isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load)
                    and node.id not in bound
                    and not _noqa(lines, node.lineno)):
                out.append(f"{rel}:{node.lineno}: F821 undefined name "
                           f"{node.id}")

    # F811 duplicate definitions at module/class level
    for scope in [tree] + [n for n in ast.walk(tree)
                           if isinstance(n, ast.ClassDef)]:
        seen: dict[str, int] = {}
        for node in scope.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                has_deco = bool(getattr(node, "decorator_list", []))
                if node.name in seen and not has_deco and not _noqa(
                        lines, node.lineno):
                    out.append(f"{rel}:{node.lineno}: F811 redefinition of "
                               f"{node.name} (first at line "
                               f"{seen[node.name]})")
                seen[node.name] = node.lineno

    # format specs (f"{x:.0f}") parse as nested JoinedStr — not f-strings
    spec_ids = {id(n.format_spec) for n in ast.walk(tree)
                if isinstance(n, ast.FormattedValue) and n.format_spec}
    for node in ast.walk(tree):
        # F541 f-string without placeholders
        if (isinstance(node, ast.JoinedStr) and id(node) not in spec_ids
                and not any(isinstance(v, ast.FormattedValue)
                            for v in node.values)
                and not _noqa(lines, node.lineno)):
            out.append(f"{rel}:{node.lineno}: F541 f-string without "
                       f"placeholders")
        # B006 mutable default argument
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [
                    d for d in node.args.kw_defaults if d is not None]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)) and not _noqa(
                        lines, d.lineno):
                    out.append(f"{rel}:{d.lineno}: B006 mutable default "
                               f"argument")
        # E711 comparison to None with ==/!=
        if isinstance(node, ast.Compare):
            for op, cmp in zip(node.ops, node.comparators):
                if (isinstance(op, (ast.Eq, ast.NotEq))
                        and isinstance(cmp, ast.Constant)
                        and cmp.value is None
                        and not _noqa(lines, node.lineno)):
                    out.append(f"{rel}:{node.lineno}: E711 comparison to "
                               f"None (use `is`)")
        # E722 bare except
        if (isinstance(node, ast.ExceptHandler) and node.type is None
                and not _noqa(lines, node.lineno)):
            out.append(f"{rel}:{node.lineno}: E722 bare except")
    return out


def main() -> int:
    targets: list[tuple[pathlib.Path, bool]] = []
    for sub in ("openai_whisper_compression_tpu", "tools"):
        targets += [(p, True) for p in sorted((ROOT / sub).rglob("*.py"))]
    targets += [(ROOT / "bench.py", True), (ROOT / "__graft_entry__.py", True)]
    targets += [(p, False) for p in sorted((ROOT / "tests").rglob("*.py"))]
    bad: list[str] = []
    for p, check_imports in targets:
        if p.exists():
            bad += _check_file(p, check_imports)
    if bad:
        print("\n".join(bad))
        print(f"{len(bad)} finding(s)")
        return 1
    print(f"astlint clean ({len(targets)} files: F401 F821 F811 F541 "
          f"B006 E711 E722)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
