"""Mask-aware geometric multigrid for the masked Poisson systems.

Round-1 scaffold: currently delegates to the matrix-free CG kernel (which is
already fast for the sub-4K tiles in the benchmark configs); the V-cycle
with mask-aware coarsening lands next (SURVEY.md §7 stage 4). The public
``solve`` signature is stable so the Laplace/Poisson layers won't change.
"""

from __future__ import annotations

import numpy as np

from .cg import solve_masked_poisson, CGResult


def solve(
    b: np.ndarray,
    umask: np.ndarray,
    deg: np.ndarray | None = None,
    x0: np.ndarray | None = None,
    tolerance: float = 1e-6,
    refinement_steps: int = 2,
) -> CGResult:
    n = int(np.asarray(umask).sum())
    return solve_masked_poisson(
        b,
        umask,
        x0=x0,
        deg=deg,
        tolerance=min(tolerance, 1e-6),
        max_iterations=4 * n + 64,
        refinement_steps=refinement_steps,
    )
