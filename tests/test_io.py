"""I/O codecs and dataset registry: format compatibility with the
reference's .tsb/.mpb/.mpib and ascii conventions (FileIO.hpp, tsbin.py)."""

import os
import struct

import numpy as np
import pytest

from mpx.io.tsb import (
    read_ascii,
    read_binary,
    read_series,
    write_ascii,
    write_binary,
    write_results,
)
from mpx.io.datasets import dataset_path, list_datasets, listings, load_dataset


def test_tsb_roundtrip(tmp_path):
    data = np.random.default_rng(0).standard_normal(257)
    p = str(tmp_path / "x.tsb")
    write_binary(p, data, "double")
    back = read_binary(p, "double", n=257)
    np.testing.assert_array_equal(back, data.astype("<f8"))


def test_tsb_matches_reference_struct_format(tmp_path):
    # The reference writes raw struct.pack('d'*n) — verify byte identity.
    data = [1.5, -2.25, 3.141592653589793]
    p = str(tmp_path / "x.tsb")
    write_binary(p, data, "double")
    with open(p, "rb") as f:
        raw = f.read()
    assert raw == struct.pack("<3d", *data)


def test_int_binary_and_size_checks(tmp_path):
    p = str(tmp_path / "x.mpib")
    write_binary(p, np.array([1, -1, 7]), "int")
    assert read_binary(p, "int").dtype == np.dtype("<i4")
    with pytest.raises(ValueError):
        read_binary(p, "int", n=5)
    with pytest.raises(ValueError):
        read_binary(p, "double")  # 12 bytes not a multiple of 8


def test_ascii_roundtrip_and_gz(tmp_path):
    data = np.array([1.0, 2.5, -3.125])
    p = str(tmp_path / "x.txt")
    write_ascii(p, data)
    np.testing.assert_array_equal(read_ascii(p), data)
    write_ascii(str(tmp_path / "one.txt"), data, oneline=True)
    np.testing.assert_array_equal(read_ascii(str(tmp_path / "one.txt")), data)

    import gzip

    with gzip.open(str(tmp_path / "x.txt.gz"), "wt") as f:
        f.write("1.0\n2.5\n-3.125\n")
    np.testing.assert_array_equal(read_series(str(tmp_path / "x.txt.gz")), data)


def test_write_results(tmp_path):
    MP = np.array([0.5, 1.5])
    MPI = np.array([1, 0])
    mpb, mpib = write_results(str(tmp_path / "out"), MP, MPI)
    np.testing.assert_array_equal(read_binary(mpb, "double"), MP)
    np.testing.assert_array_equal(read_binary(mpib, "int"), MPI)


def test_vendored_datasets_load():
    cats = list_datasets()
    assert {"benchmark", "binary", "real", "synthetic", "test"} <= set(cats)
    T = load_dataset("1024.txt", "test")
    assert T.shape == (1024,)
    Tb = load_dataset("1024.tsb", "binary")
    assert Tb.shape == (1024,)
    # The binary and ascii variants encode the same series.
    np.testing.assert_allclose(T, Tb, atol=1e-12)
    assert len(listings()) > 10


def test_real_dataset():
    T = load_dataset("ecg-heartbeat-av.txt", "real")
    assert T.ndim == 1 and T.shape[0] > 1000


def test_dataset_not_found():
    with pytest.raises(FileNotFoundError):
        dataset_path("nope.txt")
