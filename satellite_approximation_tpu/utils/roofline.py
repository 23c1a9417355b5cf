"""Roofline telemetry: analytic HBM-traffic models + achieved-bandwidth rows.

The solver hot loops (Jacobi smoother, V-cycle, PCG iteration) are all
memory-bound on TPU — arithmetic intensity well under 1 FLOP/byte — so the
meaningful utilization number is achieved HBM GB/s as a fraction of the
chip's peak, not MFU. This module provides:

* analytic *bytes-moved* models for each hot kernel, derived from the
  implementation's actual data flow (including the Pallas window halo
  read amplification) — the denominator of "fraction of speed of light";
* a measurement helper (median of N timed runs, compile excluded);
* :class:`RooflineRow`, the artifact schema emitted into results_rNN.json
  (VERDICT round-2 item 5): every perf claim carries ``achieved_gbps`` and
  ``pct_of_roofline``.

The reference's analog is the per-solve PerfInfo CSV
(/root/reference/lib/approx/source/poisson.cpp:218-261) — wall time and
iterations only; this upgrades it to hardware-normalized utilization.

Assumptions stated in each model's docstring; all are *effective-traffic*
models (each array read or written once per pass unless the implementation
demonstrably re-reads it), so pct_of_roofline can slightly exceed honest
attainability where XLA fuses better than the model assumes.
"""

from __future__ import annotations

import dataclasses
import time


# Peak HBM bandwidth by device kind, GB/s. v5e ("v5 lite"): 819 GB/s
# (public TPU v5e spec, 16 GB HBM2 @ 819 GBps). Others included for
# completeness when this code runs elsewhere.
_PEAK_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}
_DEFAULT_PEAK = 819.0  # this project targets v5e


def hbm_peak_gbps() -> float:
    """Peak HBM bandwidth of the default device, GB/s."""
    try:
        import jax

        kind = jax.devices()[0].device_kind
    except Exception:  # noqa: BLE001 — no device: fall back to target chip
        return _DEFAULT_PEAK
    for key, val in _PEAK_GBPS.items():
        if key.lower() in kind.lower():
            return val
    return _DEFAULT_PEAK


@dataclasses.dataclass
class RooflineRow:
    """One measured kernel with its bandwidth utilization."""

    name: str
    seconds: float
    bytes_moved: int
    achieved_gbps: float
    pct_of_roofline: float
    note: str = ""

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "seconds": round(self.seconds, 6),
            "bytes_moved": int(self.bytes_moved),
            "achieved_gbps": round(self.achieved_gbps, 1),
            "pct_of_roofline": round(self.pct_of_roofline, 1),
            "note": self.note,
        }


def measure(fn, n: int = 5, warmup: int = 1) -> float:
    """Median wall-seconds of ``fn()`` over ``n`` runs after ``warmup``
    compile/warm runs. ``fn`` must block (block_until_ready inside)."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def row(name: str, seconds: float, bytes_moved: int, note: str = "") -> RooflineRow:
    gbps = bytes_moved / seconds / 1e9
    peak = hbm_peak_gbps()
    return RooflineRow(name, seconds, bytes_moved, gbps, 100.0 * gbps / peak, note)


# ---------------------------------------------------------------------------
# Analytic traffic models (bytes). All take the *logical* image shape; the
# Pallas models account for the strip/halo padding and window overlap of
# ops/pallas_kernels.py.
# ---------------------------------------------------------------------------


def _pallas_window_amplification(h: int, w: int) -> float:
    """HBM-read amplification of the strip kernel: each (strip x ctile)
    interior is fetched as a haloed window; tiles are shape-adaptive
    (ops.pallas_kernels.kernel_tiles)."""
    from ..ops.pallas_kernels import HALO_C, HALO_R, kernel_tiles

    strip, ctile = kernel_tiles(h, w)
    return ((strip + 2 * HALO_R) * (ctile + 2 * HALO_C)) / (strip * ctile)


def _pallas_padded_pixels(h: int, w: int) -> int:
    """Interior pixels after padding h, w up to strip/tile multiples —
    the kernel streams the padded grid, not the logical one."""
    from ..ops.pallas_kernels import kernel_tiles

    strip, ctile = kernel_tiles(h, w)
    hp = -(-h // strip) * strip
    wp = -(-w // ctile) * ctile
    return hp * wp


def smoother_bytes(
    h: int,
    w: int,
    channels: int = 1,
    dtype_bytes: int = 4,
    emit_residual: bool = False,
    emit_restricted: bool = False,
) -> int:
    """HBM traffic of one ``fused_jacobi_tpu`` call (any sweep count — the
    whole point of the fusion is that sweeps are VMEM-resident).

    Reads u, b per channel and mask, deg once... conservatively: the kernel
    as written streams mask and deg per channel (they ride the same window
    DMA), so the model charges them per channel too. Writes the smoothed u
    interior; ``emit_residual`` adds the residual write; ``emit_restricted``
    replaces it with a quarter-size write.
    """
    px = _pallas_padded_pixels(h, w)
    amp = _pallas_window_amplification(h, w)
    reads = 4 * px * amp * dtype_bytes * channels  # u, b, m, d windows
    writes = px * dtype_bytes * channels
    if emit_residual:
        writes += px * dtype_bytes * channels
    if emit_restricted:
        writes += px // 4 * dtype_bytes * channels
    return int(reads + writes)


def xla_smoother_bytes(
    h: int, w: int, channels: int, dtype_bytes: int, sweeps: int
) -> int:
    """XLA per-sweep Jacobi path (models/multigrid._smooth fallback): each
    sweep reads u, b, m, deg and writes u (XLA fuses the roll/arith chain
    into one pass over the arrays)."""
    px = h * w
    # u and b are per-channel reads, m and deg shared across channels
    # (broadcast inside the fused pass); the smoothed u writes per channel
    per_sweep = (2 * channels + 2) * px * dtype_bytes + channels * px * dtype_bytes
    return int(sweeps * per_sweep)


def restrict_bytes(h: int, w: int, channels: int, dtype_bytes: int) -> int:
    """XLA full-weighting restriction: read fine r, write coarse r_c
    (+ coarse mask read, negligible)."""
    return int(channels * (h * w + (h * w) // 4) * dtype_bytes)


def prolong_correct_bytes(h: int, w: int, channels: int, dtype_bytes: int) -> int:
    """XLA prolong + add + mask: read coarse e_c, read fine u and mask,
    write fine u (one fused elementwise pass)."""
    px = h * w
    return int(channels * (px // 4 + 2 * px) * dtype_bytes + px * dtype_bytes)


def laplacian_bytes(h: int, w: int, channels: int, dtype_bytes: int) -> int:
    """masked_laplacian (XLA): read u (per channel), m, deg; write Au."""
    px = h * w
    return int((2 * channels + 2) * px * dtype_bytes)


def vcycle_bytes(
    level_shapes: list[tuple[int, int]],
    channels: int = 1,
    dtype_bytes: int = 4,
    pre_sweeps: int = 6,
    post_sweeps: int = 6,
    coarse_iters: int = 64,
    pallas_min_px: int = 512 * 512,
    fused_residual: bool = True,
    fused_restrict: bool = False,
) -> int:
    """Total HBM traffic of one V-cycle over the hierarchy.

    Fine levels >= ``pallas_min_px`` use the fused Pallas smoother (one
    pass for all sweeps); smaller levels pay the XLA per-sweep cost. The
    coarsest level runs ``coarse_iters`` CG iterations (A-apply + vector
    updates each).
    """
    total = 0
    n = len(level_shapes)
    for i, (h, w) in enumerate(level_shapes):
        px = h * w
        if i == n - 1:
            per_iter = laplacian_bytes(h, w, channels, dtype_bytes) + int(
                6 * channels * px * dtype_bytes
            )
            total += coarse_iters * per_iter
            continue
        if px >= pallas_min_px:
            total += smoother_bytes(
                h, w, channels, dtype_bytes,
                emit_residual=fused_residual, emit_restricted=fused_restrict,
            )
            if not fused_residual:
                total += laplacian_bytes(h, w, channels, dtype_bytes)
                total += 2 * channels * px * dtype_bytes  # r = (b - Au) * m pass
            if not fused_restrict:
                total += restrict_bytes(h, w, channels, dtype_bytes)
            total += prolong_correct_bytes(h, w, channels, dtype_bytes)
            total += smoother_bytes(h, w, channels, dtype_bytes)
        else:
            total += xla_smoother_bytes(h, w, channels, dtype_bytes, pre_sweeps)
            total += laplacian_bytes(h, w, channels, dtype_bytes)
            total += 2 * channels * px * dtype_bytes
            total += restrict_bytes(h, w, channels, dtype_bytes)
            total += prolong_correct_bytes(h, w, channels, dtype_bytes)
            total += xla_smoother_bytes(h, w, channels, dtype_bytes, post_sweeps)
    return int(total)


def pcg_iteration_bytes(
    level_shapes: list[tuple[int, int]],
    channels: int = 1,
    fine_dtype_bytes: int = 4,
    precond_dtype_bytes: int = 4,
    **vcycle_kwargs,
) -> int:
    """Marginal HBM traffic of one MG-PCG iteration (multigrid._pcg_core
    body): one fine A-apply, one V-cycle preconditioner application, and
    the x/r/p/z vector updates (reads r,p,z,ap + writes x,r,p ~ 7 arrays,
    assuming XLA fuses each update chain into one pass)."""
    h, w = level_shapes[0]
    px = h * w
    total = laplacian_bytes(h, w, channels, fine_dtype_bytes)
    total += vcycle_bytes(
        level_shapes, channels, precond_dtype_bytes, **vcycle_kwargs
    )
    total += 7 * channels * px * fine_dtype_bytes
    return int(total)


def hierarchy_shapes(h: int, w: int, min_size: int = 24) -> list[tuple[int, int]]:
    """Level shapes produced by models/multigrid.build_hierarchy."""
    shapes = [(h, w)]
    while min(h, w) > min_size:
        h, w = (h + 1) // 2, (w + 1) // 2
        shapes.append((h, w))
    return shapes
