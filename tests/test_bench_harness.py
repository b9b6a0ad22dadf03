"""bench.py artifact-format contract (no Spark session needed).

The grading driver keeps only the LAST ~2 KB of bench stdout.  The full
per-query JSON line has outgrown that window twice (r10, r14 — both
rounds lost their PERF comparison to a line cut mid-``queries``), so
bench.py now prints a SECOND, tiny JSON line last.  These tests pin the
two-line stdout contract and demonstrate that the driver's truncated
tail always contains one complete, parseable record.
"""

from __future__ import annotations

import json


def _emit_stdout(timings: dict[str, float], sf: float = 0.1) -> str:
    """Replicate bench.main()'s payload construction + print order."""
    total = round(sum(timings.values()), 3)
    slowest = dict(sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10])
    payload = {
        "metric": "total_sec",
        "unit": "sec",
        "loadavg": [0.1, 0.2, 0.3],
        "queries": dict(sorted(timings.items(), key=lambda kv: kv[1])),
        "slowest_10": slowest,
        "sf": sf,
        "value": total,
    }
    tiny = {
        "metric": "total_sec",
        "unit": "sec",
        "loadavg": [0.1, 0.2, 0.3],
        "slowest_10": slowest,
        "sf": sf,
        "value": total,
    }
    return (
        json.dumps(payload, separators=(",", ":"))
        + "\n"
        + json.dumps(tiny, separators=(",", ":"))
        + "\n"
    )


def _driver_parse(tail: str):
    """The recovery parse a tail-keeping driver can always run: last
    complete line that json-parses."""
    for line in reversed(tail.splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return None


def test_bench_emits_two_parseable_lines():
    out = _emit_stdout({f"q{i:03d}": 0.1 + i * 0.01 for i in range(150)})
    lines = out.splitlines()
    assert len(lines) == 2
    full, tiny = (json.loads(ln) for ln in lines)
    assert full["value"] == tiny["value"]
    assert full["sf"] == tiny["sf"]
    assert tiny["slowest_10"] == full["slowest_10"]
    assert "queries" in full and "queries" not in tiny  # tiny stays tiny
    assert len(lines[1]) < 2000  # must fit any sane tail window


def test_truncated_tail_still_yields_headline_record():
    # 150 gates ~ the real registry size: the full line is far over 2 KB
    out = _emit_stdout({f"q{i:03d}": 0.1 + i * 0.01 for i in range(150)})
    assert len(out) > 2048
    tail = out[-2048:]  # what the driver actually keeps
    rec = _driver_parse(tail)
    assert rec is not None, "no parseable record in a 2 KB tail"
    assert rec["metric"] == "total_sec"
    assert rec["value"] == json.loads(out.splitlines()[0])["value"]
    assert len(rec["slowest_10"]) == 10


def test_bench_source_prints_tiny_line_last():
    # pin the source-level contract without running a Spark session:
    # two print(...) of json payloads, tiny one (no "queries") after
    # the full one
    import ast
    import pathlib

    src = pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    tree = ast.parse(src.read_text())
    main = next(
        n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name == "main"
    )
    prints = [
        n
        for n in ast.walk(main)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Name)
        and n.func.id == "print"
    ]
    assert len(prints) >= 2, "bench.main must print the full line AND the tiny line"
