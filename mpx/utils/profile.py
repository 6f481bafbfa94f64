"""Per-phase benchmark profile (include/host/BenchmarkProfile.hpp analog).

Accumulates named timings into categories and renders a percentage report;
the driver pushes the same phase categories as the reference
(pre-computation, compute, post-computation).  Device work is timed with
``jax.block_until_ready`` at phase boundaries.
"""

from __future__ import annotations

import contextlib
import json
from collections import OrderedDict

from mpx.utils.timer import Timer


class BenchmarkProfile:
    def __init__(self):
        # category -> OrderedDict(name -> ns)
        self._categories: "OrderedDict[str, OrderedDict[str, int]]" = OrderedDict()

    def push(self, category: str, ns: int, name: str | None = None):
        entries = self._categories.setdefault(category, OrderedDict())
        key = name if name is not None else f"#{len(entries)}"
        entries[key] = entries.get(key, 0) + ns

    def total(self) -> int:
        return sum(sum(e.values()) for e in self._categories.values())

    def category_totals(self) -> "OrderedDict[str, int]":
        return OrderedDict(
            (cat, sum(entries.values())) for cat, entries in self._categories.items()
        )

    def report(self, file=None) -> str:
        total = max(self.total(), 1)
        lines = ["Benchmark profile:"]
        for cat, ns in self.category_totals().items():
            lines.append(f"  {cat}: {Timer.pretty(ns)} ({100.0 * ns / total:.2f}%)")
        lines.append(f"  Total: {Timer.pretty(self.total())}")
        text = "\n".join(lines)
        if file is not None:
            print(text, file=file)
        return text

    def as_json(self) -> str:
        return json.dumps(
            {cat: ns for cat, ns in self.category_totals().items()}
        )


@contextlib.contextmanager
def phase(profile: "BenchmarkProfile | None", category: str, name: str | None = None):
    """Time a phase into ``profile`` (no-op when profile is None)."""
    if profile is None:
        yield
        return
    t = Timer()
    try:
        yield
    finally:
        profile.push(category, t.elapsed(), name)
