"""Drop-in API shims for ecosystems reference users come from.

* :mod:`mpx.compat.pyscamp` — the pyscamp module surface (the reference's
  own golden tooling imports ``pyscamp`` — util/matrix_profile.py:2).
"""
