"""Serving mode (mpx/serve.py): protocol handling, warm streaming
sessions, error resilience, and the real stdin/stdout subprocess loop."""

import io
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from mpx.reference import compute_matrix_profile_reference
from mpx.serve import Server
from tests.conftest import REPO_ROOT, random_walk


def rpc(server, **req):
    return server.handle(json.dumps(req))


def test_compute_and_ping():
    s = Server()
    assert rpc(s, op="ping")["ok"] is True
    T = random_walk(300, seed=1)
    r = rpc(s, op="compute", series=T.tolist(), m=16, dtype="float64",
            id=7)
    assert r["id"] == 7
    MPe, _ = compute_matrix_profile_reference(T, 16)
    np.testing.assert_allclose(r["mp"], MPe, atol=1e-8)


def test_batch_motifs_discords_query():
    s = Server()
    fleet = np.cumsum(
        np.random.default_rng(2).standard_normal((3, 200)), axis=1)
    r = rpc(s, op="batch", series=fleet.tolist(), m=16)
    assert np.asarray(r["mp"]).shape == (3, 185)
    T = random_walk(400, seed=3)
    mo = rpc(s, op="motifs", series=T.tolist(), m=16, k=2)["motifs"]
    assert len(mo) == 2 and mo[0]["distance"] <= mo[1]["distance"]
    di = rpc(s, op="discords", series=T.tolist(), m=16, k=1)["discords"]
    assert len(di) == 1
    q = T[50:70]
    hits = rpc(s, op="query", series=T.tolist(), q=q.tolist(),
               k=2)["matches"]
    assert hits[0]["index"] == 50 and hits[0]["distance"] < 1e-6


def test_streaming_sessions():
    s = Server()
    T = random_walk(700, seed=4)
    assert rpc(s, op="stream.create", sid="a", series=T[:400].tolist(),
               m=16, dtype="float64")["ok"]
    r = rpc(s, op="stream.append", sid="a", points=T[400:].tolist())
    assert r["n"] == 700
    prof = rpc(s, op="stream.profile", sid="a")
    MPe, _ = compute_matrix_profile_reference(T, 16)
    np.testing.assert_allclose(prof["mp"], MPe, atol=1e-8)
    # floss session reports score + regimes on append
    assert rpc(s, op="stream.create", sid="f", series=T[:300].tolist(),
               m=16, mode="floss", window=700)["ok"]
    r = rpc(s, op="stream.append", sid="f", points=T[300:].tolist())
    assert 0.0 <= r["score"] <= 1.0 and len(r["regimes"]) == 1
    assert rpc(s, op="stream.drop", sid="f")["ok"]
    assert "error" in rpc(s, op="stream.profile", sid="f")
    assert rpc(s, op="ping")["streams"] == ["a"]


def test_matrix_and_merlin_ops():
    s = Server()
    T = random_walk(400, seed=77)
    r = rpc(s, op="matrix", series=T.tolist(), m=16, mwidth=6, mheight=6)
    M = np.asarray(r["matrix"])
    assert M.shape == (6, 6)
    from mpx.distmatrix import brute_force_pooled_matrix

    np.testing.assert_allclose(
        M, brute_force_pooled_matrix(T, 16, mwidth=6, mheight=6),
        atol=2e-3)
    # AB variant
    B = random_walk(300, seed=78)
    r = rpc(s, op="matrix", series=T.tolist(), b=B.tolist(), m=16,
            mwidth=4, mheight=5, pearson=True)
    assert np.asarray(r["matrix"]).shape == (5, 4)

    r = rpc(s, op="merlin", series=T.tolist(), lo=8, hi=16, k=2)
    assert len(r["per_length"]) == 9 and 1 <= len(r["top"]) <= 2
    from mpx.merlin import brute_force_multi_length_discords

    exp = brute_force_multi_length_discords(T, range(8, 17))
    for got, want in zip(r["per_length"], exp):
        assert got["m"] == want.m
        assert got["distance"] == pytest.approx(want.distance, abs=1e-9)


def test_mstamp_op():
    s = Server()
    rng = np.random.default_rng(88)
    T = np.cumsum(rng.standard_normal((3, 300)), axis=1)
    r = rpc(s, op="mstamp", series=[t.tolist() for t in T], m=16,
            mdl=True)
    assert np.asarray(r["pmp"]).shape == (3, 285)
    assert 1 <= r["best_k"] <= 3 and len(r["bitsaves"]) == 3
    from mpx.mstamp import compute_multidim_profile

    prof = compute_multidim_profile(T, 16)
    np.testing.assert_allclose(np.asarray(r["pmp"]),
                               np.asarray(prof.PMP), atol=1e-5)


def test_error_resilience():
    s = Server()
    assert "error" in s.handle("this is not json")
    assert "error" in s.handle("[1, 2, 3]")
    assert "error" in rpc(s, op="nope")
    assert "error" in rpc(s, op="compute", series=[1, 2], m=64)
    # the id echoes back even on failure
    r = rpc(s, op="nope", id="x")
    assert r["id"] == "x" and "error" in r
    # loop survives: a good request after the bad ones still works
    assert rpc(s, op="ping")["ok"] is True


def test_run_loop_in_memory():
    T = random_walk(200, seed=5)
    lines = [
        json.dumps({"op": "ping", "id": 1}),
        "garbage",
        json.dumps({"op": "compute", "series": T.tolist(), "m": 16,
                    "id": 2}),
        json.dumps({"op": "shutdown", "id": 3}),
        json.dumps({"op": "ping", "id": 4}),  # after shutdown: unread
    ]
    out = io.StringIO()
    rc = Server().run(infile=io.StringIO("\n".join(lines)), outfile=out)
    assert rc == 0
    resp = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert [r.get("id") for r in resp] == [1, None, 2, 3]
    assert resp[0]["ok"] and "error" in resp[1] and "mp" in resp[2]


def test_serve_subprocess_pipe():
    """The real `mpx serve` process over a pipe (CPU backend)."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2")
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            "from mpx.cli import main; raise SystemExit(main(['serve']))")
    T = random_walk(200, seed=6)
    reqs = "\n".join([
        json.dumps({"op": "ping", "id": 1}),
        json.dumps({"op": "compute", "series": T.tolist(), "m": 16,
                    "id": 2}),
        json.dumps({"op": "shutdown", "id": 3}),
    ]) + "\n"
    proc = subprocess.run(
        [sys.executable, "-c", code], input=reqs, env=env, cwd=REPO_ROOT,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    resp = [json.loads(ln) for ln in proc.stdout.splitlines()]
    assert resp[0]["ok"] is True
    MPe, _ = compute_matrix_profile_reference(T, 16)
    np.testing.assert_allclose(resp[1]["mp"], MPe, atol=2e-3)
    assert resp[2]["ok"] is True


def test_compute_allow_missing_with_nulls():
    """JSON null gaps + allow_missing route to the masked tier."""
    s = Server()
    T = random_walk(300, seed=8).tolist()
    T[150] = None
    r = rpc(s, op="compute", series=T, m=16, allow_missing=True,
            dtype="float64")
    assert "mp" in r
    from mpx.missing import missing_window_mask
    bad = missing_window_mask(
        np.asarray([np.nan if v is None else v for v in T]), 16)
    assert all(r["mpi"][int(i)] == -1 for i in np.nonzero(bad)[0])
    # without the flag: clean error, not a crash
    assert "error" in rpc(s, op="compute", series=T, m=16)


def test_serve_tcp(tmp_path):
    """TCP mode: warm state persists ACROSS connections (a stream
    created on connection 1 is visible on connection 2)."""
    import socket
    import threading
    import time

    from mpx.serve import Server

    s = Server()
    ready = str(tmp_path / "addr")
    th = threading.Thread(
        target=s.run_tcp,
        kwargs={"port": 0, "ready_file": ready},
        daemon=True,
    )
    th.start()
    for _ in range(100):
        if os.path.exists(ready):
            break
        time.sleep(0.05)
    host, port = open(ready).read().strip().split(":")

    def session(reqs):
        out = []
        with socket.create_connection((host, int(port))) as c:
            f = c.makefile("rw", encoding="utf-8")
            for r in reqs:
                f.write(json.dumps(r) + "\n")
                f.flush()
                out.append(json.loads(f.readline()))
        return out

    T = random_walk(300, seed=12)
    r1 = session([
        {"op": "ping", "id": 1},
        {"op": "stream.create", "sid": "tcp1",
         "series": T[:200].tolist(), "m": 16},
    ])
    assert r1[0]["ok"] and r1[1]["ok"]
    # second connection sees the same state, then shuts the server down
    r2 = session([
        {"op": "stream.append", "sid": "tcp1",
         "points": T[200:].tolist()},
        {"op": "shutdown"},
    ])
    assert r2[0]["n"] == 300 and r2[1]["ok"]
    th.join(timeout=30)
    assert not th.is_alive()


def test_serve_tcp_survives_client_drop(tmp_path):
    """An abruptly-reset client must not kill the server or its warm
    state (the idle timeout frees the single-threaded loop)."""
    import socket
    import struct
    import threading
    import time

    from mpx.serve import Server

    s = Server()
    ready = str(tmp_path / "addr")
    th = threading.Thread(
        target=s.run_tcp,
        kwargs={"port": 0, "ready_file": ready, "idle_timeout": 2.0},
        daemon=True,
    )
    th.start()
    for _ in range(100):
        if os.path.exists(ready):
            break
        time.sleep(0.05)
    host, port = open(ready).read().strip().split(":")
    T = random_walk(120, seed=13)
    c = socket.create_connection((host, int(port)))
    f = c.makefile("rw", encoding="utf-8")
    f.write(json.dumps({"op": "stream.create", "sid": "drop",
                        "series": T.tolist(), "m": 16}) + "\n")
    f.flush()
    assert json.loads(f.readline())["ok"]
    f.write(json.dumps({"op": "ping"}) + "\n")
    f.flush()
    # RST the connection without reading the response
    c.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                 struct.pack("ii", 1, 0))
    c.close()
    # server survives; the stream persists; shutdown still works
    with socket.create_connection((host, int(port)), timeout=30) as c2:
        f2 = c2.makefile("rw", encoding="utf-8")
        f2.write(json.dumps({"op": "ping"}) + "\n")
        f2.flush()
        r = json.loads(f2.readline())
        assert r["ok"] and r["streams"] == ["drop"]
        f2.write(json.dumps({"op": "shutdown"}) + "\n")
        f2.flush()
        assert json.loads(f2.readline())["ok"]
    th.join(timeout=30)
    assert not th.is_alive()


def test_contrast_op():
    s = Server()
    rng = np.random.default_rng(13)
    m = 48
    Tp = (rng.standard_normal(500) * 0.05)
    Tm = (rng.standard_normal(500) * 0.05)
    pat = np.sin(np.linspace(0, 4 * np.pi, m))
    Tp[60 : 60 + m] += pat
    Tp[350 : 350 + m] += pat
    r = rpc(s, op="contrast", plus=Tp.tolist(), minus=Tm.tolist(),
            m=m, k=2, dtype="float64", band=128, chunk=128, full=True)
    assert "error" not in r, r
    assert r["motifs"] and r["motifs"][0]["score"] > 0.5
    pair = sorted((r["motifs"][0]["index"], r["motifs"][0]["neighbor"]))
    assert abs(pair[0] - 60) < m and abs(pair[1] - 350) < m
    from mpx.contrast import brute_force_contrast_profile

    np.testing.assert_allclose(
        np.asarray(r["cp"]), brute_force_contrast_profile(Tp, Tm, m),
        atol=1e-8)
    # cp omitted without full
    r2 = rpc(s, op="contrast", plus=Tp.tolist(), minus=Tm.tolist(),
             m=m, dtype="float64", band=128, chunk=128)
    assert "cp" not in r2 and r2["motifs"]


def test_chains_op():
    from tests.test_chains import drifting_series

    s = Server()
    T, starts = drifting_series()
    r = rpc(s, op="chains", series=T.tolist(), m=32, dtype="float64",
            anchor=starts[0])
    assert "error" not in r, r
    assert r["length"] >= 4 and r["chain"][0] == starts[0]
    assert all(a < b for a, b in zip(r["chain"], r["chain"][1:]))
    r2 = rpc(s, op="chains", series=T.tolist(), m=32, dtype="float64")
    assert r2["length"] >= r["length"]


def test_thresh_op():
    s = Server()
    rng = np.random.default_rng(7)
    m = 32
    T = rng.normal(0, 0.5, 800)
    pat = np.sin(np.linspace(0, 4 * np.pi, m))
    for pos in (100, 400, 700):
        T[pos : pos + m] += 3 * pat
    r = rpc(s, op="thresh", series=T.tolist(), m=m, threshold=0.8,
            dtype="float64")
    assert "error" not in r, r
    assert r["counts"][100] >= 2 and r["counts"][400] >= 2
    assert sorted(r["counts"])[len(r["counts"]) // 2] == 0


def test_motiflets_op():
    from tests.test_motiflets import planted

    s = Server()
    T, starts = planted()
    r = rpc(s, op="motiflets", series=T.tolist(), m=48, k=5,
            dtype="float64", band=64, chunk=128)
    assert "error" not in r, r
    assert len(r["indices"]) == 5
    for idx in r["indices"]:
        assert min(abs(idx - st) for st in starts) <= 4


def test_damp_stream_session():
    from tests.test_damp import with_anomaly

    s = Server()
    m = 32
    T = with_anomaly(m=m)
    r = rpc(s, op="stream.create", sid="d1", series=T[:300].tolist(),
            m=m, mode="damp", dtype="float64")
    assert r.get("ok"), r
    alerts = []
    for o in range(300, len(T), 128):
        r = rpc(s, op="stream.append", sid="d1",
                points=T[o : o + 128].tolist())
        assert "error" not in r, r
        alerts += r["alerts"]
    assert abs(alerts[-1]["index"] - 700) <= m
    assert r["discord"]["index"] == alerts[-1]["index"]
    assert rpc(s, op="stream.drop", sid="d1").get("ok")
