"""Benchmark harness smoke test (tiny n, CPU)."""

import json

import pytest


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


def test_batch_benchmark_smoke():
    """The fleet row's harness validates and reports total + per-series
    throughput (tiny shapes here; the suite row is 256x8192)."""
    from mpx.bench import run_batch_benchmark

    r = run_batch_benchmark(n=512, m=16, b=6, band=128, chunk=128,
                            validate=2)
    assert r["pairs_per_sec"] > 0 and r["series_ms"] > 0
    assert r["validation"]["series"] == 2
    assert r["validation"]["max_abs_err"] <= r["validation"]["tol"]


def test_suite_covers_baseline_configs():
    """Every BASELINE.md:37-39 tier is represented."""
    from mpx.bench import SUITE

    names = {c["name"] for c in SUITE}
    assert "vanilla-f32-8192" in names
    assert "tiled-f32-131072" in names
    assert "showcase-f64-1048576" in names
    assert any(n.startswith("real-") for n in names)
    assert any(n.startswith("scale-") for n in names)


def test_sampled_row_validation_catches_corruption():
    """validate_sampled_rows must flag a corrupted profile (this is the
    guard that would have caught the round-2 DEFAULT-precision one-hot
    index corruption, which only manifested on hardware)."""
    import numpy as np
    import pytest

    from mpx import MatrixProfileConfig, compute_matrix_profile
    from mpx.bench import ValidationError, validate_sampled_rows
    from mpx.io.datasets import generate_random_walk

    n, m = 2048, 32
    T = generate_random_walk(n, seed=7)
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="mxu",
                              band=256, chunk=512)
    MP, MPI = compute_matrix_profile(T, m, cfg)
    MP, MPI = np.array(MP), np.array(MPI)

    ok = validate_sampled_rows(T, m, MP, MPI, k=64, tol=1e-8)
    assert ok["rows"] == 64 and ok["max_abs_err"] <= 1e-8

    bad_val = MP.copy()
    bad_val[123] += 0.5
    with pytest.raises(ValidationError):
        validate_sampled_rows(T, m, bad_val, MPI, k=2048, tol=1e-8)

    bad_idx = MPI.copy()
    # point row 123 at a far-away, non-equidistant neighbor
    bad_idx[123] = (bad_idx[123] + 400) % (n - m + 1)
    with pytest.raises(ValidationError):
        validate_sampled_rows(T, m, MP, bad_idx, k=2048, tol=1e-8)


def test_suite_table_renders_artifact():
    """suite_table must render every row shape the artifact can contain
    (plain, streaming, topk, mstamp, pod) and sync_docs must consider
    the committed README current."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from mpx.bench import suite_table

    with open(os.path.join(repo, "BENCH_SUITE.json")) as f:
        rows = json.load(f)
    table = suite_table(rows)
    assert table.count("\n") == len(rows) + 1
    rc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "sync_docs.py"),
         "--check"], cwd=repo).returncode
    assert rc == 0, "README benchmark table is stale vs BENCH_SUITE.json"


def test_suite_reraises_validation_errors(monkeypatch):
    """Relay flakiness is skippable; numeric corruption is NOT."""
    import mpx.bench as B

    def corrupt(**kw):
        raise B.ValidationError("sampled-row validation FAILED")

    monkeypatch.setattr(B, "run_benchmark", corrupt)
    with pytest.raises(B.ValidationError):
        B.run_suite(names=["vanilla-f32-8192"])

    def flaky(**kw):
        raise RuntimeError("remote_compile: Broken pipe")

    monkeypatch.setattr(B, "run_benchmark", flaky)
    assert B.run_suite(names=["vanilla-f32-8192"]) == []


def test_thresh_benchmark_smoke():
    from mpx.bench import run_thresh_benchmark

    r = run_thresh_benchmark(n=4096, m=32, dtype="float32", threshold=0.6,
                             band=512, chunk=512, validate=8)
    assert r["validation"]["rows"] == 8
    assert r["pairs_per_sec"] > 0


def test_thresh_validation_catches_corruption(monkeypatch):
    import mpx.thresh as thresh_mod
    from mpx.bench import ValidationError, run_thresh_benchmark

    real = thresh_mod.compute_sum_thresh

    def corrupt(*a, **k):
        sums, cnts = real(*a, **k)
        sums = sums.copy()
        sums[len(sums) // 2] += 5.0
        return sums, cnts

    monkeypatch.setattr(thresh_mod, "compute_sum_thresh", corrupt)
    import pytest as _pytest

    with _pytest.raises(ValidationError):
        run_thresh_benchmark(n=2048, m=16, dtype="float64", threshold=0.2,
                             band=256, chunk=256, validate=2048)


def test_damp_benchmark_smoke():
    from mpx.bench import run_damp_benchmark

    r = run_damp_benchmark(n=4096, m=32, dtype="float32",
                           band=512, chunk=512, validate=8)
    assert r["validation"]["rows"] == 8
    assert r["pairs_per_sec"] > 0
