"""bench.Artifact: the incremental-emission machinery that guarantees the
driver's last-line parse always sees a complete artifact (VERDICT r4 #1 —
round 4 recorded NO headline because the old bench printed one line only
after every row finished)."""

import json
import time

import bench


def _emitted(capsys):
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return [json.loads(ln) for ln in lines]


def test_artifact_emits_full_line_after_every_row(capsys):
    art = bench.Artifact(budget_s=1e9)
    art.set_headline("m", 123.0, "x_realtime")
    art.run_row("a", lambda: {"v": 1}, est_s=0)
    art.run_row("b", lambda: {"v": 2}, est_s=0)
    docs = _emitted(capsys)
    assert len(docs) == 3                       # headline + 2 rows
    assert docs[0]["value"] == 123.0 and docs[0]["rows"] == {}
    assert set(docs[-1]["rows"]) == {"a", "b"}
    assert docs[-1]["rows"]["a"]["v"] == 1
    # every emitted line parses standalone — a kill at ANY point leaves a
    # complete artifact as the last stdout line
    for d in docs:
        assert d["metric"] == "m" and d["unit"] == "x_realtime"


def test_artifact_budget_skips_are_named_not_silent(capsys):
    art = bench.Artifact(budget_s=0.0)          # already exhausted
    art.set_headline("m", 1.0, "u")
    art.run_row("slow_row", lambda: {"v": 1}, est_s=100)
    docs = _emitted(capsys)
    row = docs[-1]["rows"]["slow_row"]
    assert "skipped" in row and "budget" in row["skipped"]


def test_artifact_row_errors_recorded_not_raised(capsys):
    art = bench.Artifact(budget_s=1e9)
    art.set_headline("m", 1.0, "u")

    def boom():
        raise RuntimeError("tunnel fell over")

    art.run_row("flaky", boom, est_s=0)
    docs = _emitted(capsys)
    assert "tunnel fell over" in docs[-1]["rows"]["flaky"]["error"]


def test_artifact_rows_carry_wall_time(capsys):
    art = bench.Artifact(budget_s=1e9)
    art.set_headline("m", 1.0, "u")
    art.run_row("r", lambda: (time.sleep(0.05), {"v": 1})[1], est_s=0)
    docs = _emitted(capsys)
    assert docs[-1]["rows"]["r"]["t_row_s"] >= 0.0
