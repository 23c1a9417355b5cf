"""Scipy sparse oracle: assembles the reference's exact linear systems
(laplace.cpp:31-119; poisson.cpp:145-290) and solves them directly in f64.
Used to validate the matrix-free TPU solvers to the BASELINE 1e-5 per-pixel
parity target."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def laplace_fill_oracle(image: np.ndarray, invalid: np.ndarray) -> np.ndarray:
    """Direct port of approx::solve_matrix (laplace.cpp:31-119)."""
    image = np.asarray(image, dtype=np.float64).copy()
    invalid = np.asarray(invalid, dtype=bool)
    h, w = image.shape
    rows_i, cols_i = np.nonzero(invalid)
    if len(rows_i) == 0:
        return image
    min_r, max_r = rows_i.min(), rows_i.max()
    min_c, max_c = cols_i.min(), cols_i.max()
    bh = max_r - min_r + 1
    bw = max_c - min_c + 1
    n = bh * bw

    def idx(r, c):
        return (c - min_c) + (r - min_r) * bw

    A = sp.lil_matrix((n, n))
    b = np.zeros(n)
    for r in range(min_r, max_r + 1):
        for c in range(min_c, max_c + 1):
            i = idx(r, c)
            on_border = r == 0 or r == h - 1 or c == 0 or c == w - 1
            if on_border or not invalid[r, c]:
                A[i, i] = 1.0
                b[i] = image[r, c]
            else:
                for dr, dc, v in ((-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0), (0, 0, -4.0)):
                    r2, c2 = r + dr, c + dc
                    if not invalid[r2, c2]:
                        b[i] -= v * image[r2, c2]
                    else:
                        j = idx(r2, c2)
                        # invalid pixels outside the bbox cannot exist;
                        # invalid border pixels are handled as known rows
                        on_border2 = r2 == 0 or r2 == h - 1 or c2 == 0 or c2 == w - 1
                        if on_border2:
                            # border rows are identity: move to RHS? The
                            # reference adds a coefficient — the identity row
                            # pins u_j to image value, so equivalent either way
                            A[i, j] += v
                        else:
                            A[i, j] += v
    x = spla.spsolve(A.tocsr(), b)
    for r, c in zip(rows_i, cols_i):
        image[r, c] = x[idx(r, c)]
    return image


def poisson_blend_oracle(
    inputs: np.ndarray, replacement: np.ndarray, invalid: np.ndarray
) -> np.ndarray:
    """Direct port of the mask-overload blend (poisson.cpp:145-290), solved
    directly (the CG there converges to this at tight tolerance)."""
    inputs = np.asarray(inputs, dtype=np.float64).copy()
    repl = np.asarray(replacement, dtype=np.float64)
    invalid = np.asarray(invalid, dtype=bool)
    C, h, w = inputs.shape
    var = -np.ones((h, w), dtype=np.int64)
    ids = np.nonzero(invalid)
    n = len(ids[0])
    var[ids] = np.arange(n)

    A = sp.lil_matrix((n, n))
    rows = []
    for r, c in zip(*ids):
        i = var[r, c]
        nbrs = [
            (r + dr, c + dc)
            for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1))
            if 0 <= r + dr < h and 0 <= c + dc < w
        ]
        A[i, i] = float(len(nbrs))
        for (r2, c2) in nbrs:
            if invalid[r2, c2]:
                A[i, var[r2, c2]] = -1.0
        rows.append((r, c, nbrs))
    A = A.tocsr()

    out = inputs.copy()
    for ch in range(C):
        b = np.zeros(n)
        for (r, c, nbrs) in rows:
            i = var[r, c]
            for (r2, c2) in nbrs:
                b[i] += repl[ch, r, c] - repl[ch, r2, c2]
                if not invalid[r2, c2]:
                    b[i] += inputs[ch, r2, c2]
        x = spla.spsolve(A, b)
        out[ch][invalid] = x[var[invalid]]
    return out
