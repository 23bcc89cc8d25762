"""AST hygiene scan: unused imports across the package (make check; the
reference runs ruff/vulture via pre-commit, `.pre-commit-config.yaml:12-20`)."""
import ast
import pathlib
import sys

bad = []
root = pathlib.Path(__file__).resolve().parent.parent
for p in (root / "openai_whisper_compression_tpu").rglob("*.py"):
    src = p.read_text()
    tree = ast.parse(src)
    imported = {}
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
    lines = src.splitlines()
    for name, line in imported.items():
        if "noqa" in lines[line - 1]:
            continue
        if src.count(name) <= 1:
            bad.append(f"{p.relative_to(root)}:{line}: unused import {name}")
if bad:
    print("\n".join(bad))
    sys.exit(1)
print("astlint clean")
