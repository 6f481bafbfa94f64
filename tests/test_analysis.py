"""Motif/discord extraction on constructed signals."""

import numpy as np

from mpx import MatrixProfileConfig, compute_matrix_profile
from mpx.analysis import top_discords, top_motifs


def test_motifs_and_discords():
    rng = np.random.default_rng(5)
    T = rng.standard_normal(1024) * 0.05
    motif = np.sin(np.linspace(0, 6 * np.pi, 96))
    T[100:196] += motif
    T[700:796] += motif
    T[400:432] += 6.0 * np.hanning(32)  # an anomaly bump
    m = 96
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="xla",
                              band=256, chunk=512, tile_rows=8, tile_cols=8)
    MP, MPI = compute_matrix_profile(T, config=cfg)

    motifs = top_motifs(MP, MPI, m, k=1)
    assert motifs, "no motif found"
    a, b, d = motifs[0]
    assert abs(a - 100) <= 4 and abs(b - 700) <= 4
    assert d < 1.0

    discords = top_discords(MP, MPI, m, k=1)
    assert discords
    # the bump at 400 must be among the most anomalous windows
    assert abs(discords[0].index - (400 + 16 - m // 2)) <= m
