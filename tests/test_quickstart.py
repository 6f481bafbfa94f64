"""The quickstart example must run end-to-end: it is the documented
tour of the whole API surface, so any breaking API change fails here."""

import os
import runpy

from tests.conftest import REPO_ROOT


def test_quickstart_runs(capsys):
    path = os.path.join(REPO_ROOT, "examples", "quickstart.py")
    cwd = os.getcwd()
    os.chdir(REPO_ROOT)  # dataset paths are repo-relative
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        os.chdir(cwd)
    out = capsys.readouterr().out
    for marker in ("motif:", "discord:", "streaming == batch: True",
                   "floss:", "mpdist clusters:", "batch tier:",
                   "contrast:", "chains:", "density:", "3-motiflet:",
                   "damp:", "ap16 tier:"):
        assert marker in out, f"quickstart output missing {marker!r}"
