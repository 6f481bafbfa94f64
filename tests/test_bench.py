"""Benchmark harness smoke test (tiny n, CPU)."""

import json


def test_bench_json_line(capsys):
    from mpx.bench import main

    rc = main(["-n", "512", "-m", "16", "--kernel", "xla",
               "--band", "64", "--chunk", "128", "--tile-rows", "8"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    assert set(data) == {"metric", "value", "unit", "vs_baseline"}
    assert data["value"] > 0
    assert data["unit"] == "pairs/s"
    assert data["vs_baseline"] == data["value"] / 3.0e10


def test_bench_suite_smoke(capsys, tmp_path):
    """--suite runs the named configs and emits one JSON array plus the
    README markdown table."""
    from mpx.bench import SUITE, main, suite_table

    out = str(tmp_path / "suite.json")
    rc = main(["--suite", "--only", "vanilla-f32-8192", "--table", "--out", out])
    assert rc == 0
    captured = capsys.readouterr()
    results = json.loads(captured.out)
    assert isinstance(results, list) and len(results) == 1
    r = results[0]
    assert r["name"] == "vanilla-f32-8192"
    assert r["n"] == 8192 and r["m"] == 32
    assert r["pairs_per_sec"] > 0 and "vs_baseline" in r
    assert "| config |" in captured.err  # markdown table on stderr
    assert json.load(open(out)) == results


def test_suite_covers_baseline_configs():
    """Every BASELINE.md:37-39 tier is represented."""
    from mpx.bench import SUITE

    names = {c["name"] for c in SUITE}
    assert "vanilla-f32-8192" in names
    assert "tiled-f32-131072" in names
    assert "showcase-f64-1048576" in names
    assert any(n.startswith("real-") for n in names)
    assert any(n.startswith("scale-") for n in names)
