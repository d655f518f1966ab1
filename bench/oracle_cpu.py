"""Measure the reference CPU envelope (BASELINE.md row 5).

The reference publishes no numbers and its mount was empty (SURVEY.md §0/§7),
so the speed bar is measured here with the trusted float64 NumPy/SciPy oracle
— the same dense-Gram + LLT + triangular-solve math the reference runs
through Eigen on a single CPU.  Usage:

    python bench/oracle_cpu.py [N]      # default N=10000

Prints one JSON line with fit / query wall-clock, and appends nothing —
record results in BASELINE.md by hand (they are hardware-of-record numbers).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import numpy as np

import oracle  # tests/oracle.py — the trusted implementation


def run(n: int = 10_000, n_query: int = 64**3, seed: int = 0):
    g = np.random.default_rng(seed)
    # GPIS-shaped training set on the unit sphere.
    x = g.normal(size=(n, 3))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.zeros(n)
    noise = np.full(n, 1e-4)

    t0 = time.perf_counter()
    model = oracle.fit("rbf", x, y, noise, 0.7, 1.0)
    t_fit = time.perf_counter() - t0

    # Dense 64^3 grid query in chunks (same math as the device path).
    axis = np.linspace(-1.5, 1.5, round(n_query ** (1 / 3)))
    gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
    q = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)
    t0 = time.perf_counter()
    chunk = 4096
    for i in range(0, len(q), chunk):
        oracle.predict(model, q[i : i + chunk])
    t_query = time.perf_counter() - t0

    return {"n": n, "n_query": len(q), "fit_s": round(t_fit, 3),
            "query_s": round(t_query, 3), "total_s": round(t_fit + t_query, 3)}


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    print(json.dumps(run(n)))
