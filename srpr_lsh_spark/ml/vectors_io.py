"""Model-vector text format round-trip — the reference's ``save_vectors`` /
``load_vectors`` (``src/MatrixFactorization.h:100-158``, identical format in
``src/SRPRModel.h``):

    line 1:      "<n_users> <n_items> <d>"
    next n_users lines: d space-separated values, 8 decimal places
    next n_items lines: same

``load_vectors`` validates the header against the expected shape and returns
``None`` on mismatch — the caller's recompute-fallback trigger, exactly the
reference's dims-mismatch retrain path (``MatrixFactorization.h:136-141``).
"""

from __future__ import annotations

import os

import numpy as np


def save_vectors(path: str, user_vectors: np.ndarray, item_vectors: np.ndarray) -> None:
    n_users, d = user_vectors.shape
    n_items, d2 = item_vectors.shape
    if d != d2:
        raise ValueError(f"user/item dims differ: {d} vs {d2}")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"{n_users} {n_items} {d}\n")
        for block in (user_vectors, item_vectors):
            for row in block:
                f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
    os.replace(tmp, path)


def load_vectors(
    path: str, n_users: int, n_items: int, d: int
) -> "tuple[np.ndarray, np.ndarray] | None":
    """Returns (U, V) or None if the file is absent or its dims mismatch —
    the caller should recompute (retrain) on None."""
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            header = f.readline().split()
            if len(header) != 3:
                return None
            fu, fi, fd = (int(x) for x in header)
            if (fu, fi, fd) != (n_users, n_items, d):
                return None
            data = np.loadtxt(f, dtype=np.float64, max_rows=fu + fi)
    except ValueError:
        # corrupt header token or malformed row: any unreadable file is a
        # recompute trigger, never a crash (MatrixFactorization.h:129-141)
        return None
    if data.ndim == 1:
        data = data.reshape(1, -1)
    if data.shape != (fu + fi, fd):
        return None
    return data[:fu].copy(), data[fu:].copy()
