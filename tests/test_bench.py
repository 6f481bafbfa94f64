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
