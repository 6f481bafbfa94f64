"""Dataset registry over the vendored data/ tree.

Mirrors the reference's dataset layout and catalog (data/listings.json,
data/README.md): categories benchmark/ (random walks), test/, real/,
synthetic/, binary/ (.tsb).  Large random walks that the reference ships
as missing blobs can be regenerated with :func:`generate_random_walk`.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from mpx.io.tsb import read_series

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DATA_ROOT = os.environ.get("MPX_DATA_ROOT", os.path.join(_REPO_ROOT, "data"))

CATEGORIES = ("benchmark", "binary", "real", "synthetic", "test")


def list_datasets(category: Optional[str] = None, data_root: Optional[str] = None):
    """Return {category: [file names]} of available datasets."""
    root = data_root or DATA_ROOT
    cats = (category,) if category else CATEGORIES
    out = {}
    for cat in cats:
        d = os.path.join(root, cat)
        if os.path.isdir(d):
            out[cat] = sorted(os.listdir(d))
    return out


def listings(data_root: Optional[str] = None):
    root = data_root or DATA_ROOT
    path = os.path.join(root, "listings.json")
    with open(path) as f:
        return json.load(f)


def dataset_path(name: str, category: Optional[str] = None,
                 data_root: Optional[str] = None) -> str:
    """Resolve a dataset name (optionally category-qualified like
    'test/1024.txt') to an absolute path."""
    root = data_root or DATA_ROOT
    if os.path.sep in name and os.path.exists(os.path.join(root, name)):
        return os.path.join(root, name)
    cats = (category,) if category else CATEGORIES
    for cat in cats:
        p = os.path.join(root, cat, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"dataset {name!r} not found under {root}")


def load_dataset(name: str, category: Optional[str] = None,
                 data_root: Optional[str] = None) -> np.ndarray:
    return read_series(dataset_path(name, category, data_root))


def generate_random_walk(n: int, seed: int = 0) -> np.ndarray:
    """Regenerate benchmark-style random walks (the reference's large
    blobs, data/.MISSING_LARGE_BLOBS, are not checked in upstream either)."""
    rng = np.random.default_rng(seed)
    return np.cumsum(rng.standard_normal(n))
