"""The `make check` lint gate must (a) pass on the repo and (b) actually
fire on each class of defect it claims to catch (a vacuous linter is worse
than none). Reference gates: ruff/mypy/vulture via pre-commit
(`.pre-commit-config.yaml:12-47`) — unavailable in this image, implemented
natively in tools/astlint.py."""

import pathlib
import subprocess
import sys
import textwrap

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

import astlint  # noqa: E402


def test_repo_is_lint_clean():
    r = subprocess.run([sys.executable, str(ROOT / "tools" / "astlint.py")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_every_check_fires(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text(textwrap.dedent("""\
        import os
        def f(x=[]):
            return undefined_thing + x
        def g():
            pass
        def g():
            pass
        s = f""
        if s == None:
            try:
                pass
            except:
                pass
    """))
    old_root = astlint.ROOT
    astlint.ROOT = tmp_path
    try:
        out = astlint._check_file(bad, True)
    finally:
        astlint.ROOT = old_root
    for code in ("F401", "F821", "F811", "F541", "B006", "E711", "E722"):
        assert any(code in o for o in out), code


def test_format_spec_not_flagged(tmp_path):
    ok = tmp_path / "ok.py"
    ok.write_text('x = 1.5\nprint(f"{x:.0f}")\n')
    old_root = astlint.ROOT
    astlint.ROOT = tmp_path
    try:
        out = astlint._check_file(ok, True)
    finally:
        astlint.ROOT = old_root
    assert not out, out
