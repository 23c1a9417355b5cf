"""Device-first Laplace fill: the full-tile production path.

The reference assembles its sparse system on the host from host arrays
(laplace.cpp:31-119). Profiling on tunneled-TPU hosts showed the rebuild's
full-tile latency was dominated not by the solve (~0.17 s per PCG iteration
at 10980^2) but by H2D transfers of host-assembled f64 right-hand sides
(~1 GB/band). This module assembles everything on device instead:

    upload image (f32) + mask (bool, once)          ~0.6 GB total
    b = shift_sum(known) in f64    \
    x0 = image * mask              |   all on-device, exact
    deg = in-image neighbour count /
    mask hierarchy: 2x2 any-pool ladder, on device

so the only per-band transfer is the f32 image data itself — and none at
all when the image is already device-resident (e.g. produced by the
detection pipeline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .cg import CGResult, shift_sum
from . import multigrid


@jax.jit
def _assemble(img32: jnp.ndarray, umask: jnp.ndarray):
    """(b64, x064) for the masked Laplace system, computed in f64 on device.

    b collects known-neighbour Dirichlet values: for unknown p,
    b[p] = sum of known 4-neighbours (zero outside the image) — the RHS the
    reference builds row-by-row at laplace.cpp:71-106."""
    um64 = umask.astype(jnp.float64)
    img64 = img32.astype(jnp.float64)
    b64 = shift_sum(img64 * (1.0 - um64)) * um64
    x064 = img64 * um64
    return b64, x064


@jax.jit
def _x0_from_image(img32: jnp.ndarray, umask: jnp.ndarray):
    return img32.astype(jnp.float64) * umask.astype(jnp.float64)


@jax.jit
def _residual_from_image(img32, x64, umask, deg):
    """True f64 residual of the Laplace system, with b rebuilt on the fly
    from the f32 image — b never persists in HBM (a full-tile f64 RHS is
    ~1 GB/band, the difference between fitting 13 bands and OOM).
    Returns (r64, ||r|| per band, ||b|| per band)."""
    um64 = umask.astype(jnp.float64)
    img64 = img32.astype(jnp.float64)
    b64 = shift_sum(img64 * (1.0 - um64)) * um64
    x = x64 * um64
    ax = (deg.astype(jnp.float64) * x - shift_sum(x)) * um64
    r = (b64 - ax) * um64
    return (
        r,
        jnp.sqrt(jnp.sum(r * r, axis=(-2, -1))),
        jnp.sqrt(jnp.sum(b64 * b64, axis=(-2, -1))),
    )


@jax.jit
def _composite(img32: jnp.ndarray, x64: jnp.ndarray, umask: jnp.ndarray):
    umf = umask.astype(img32.dtype)
    return img32 * (1.0 - umf) + x64.astype(img32.dtype) * umf


@functools.partial(jax.jit, donate_argnums=0)
def _write_bands(buf: jnp.ndarray, chunk: jnp.ndarray, start) -> jnp.ndarray:
    """In-place (donated) chunk write — avoids a second full-tile copy at
    assembly time; a 13-band output plus a concatenate would not fit HBM."""
    return jax.lax.dynamic_update_slice(buf, chunk, (start, 0, 0))


def laplace_fill(
    image,
    umask,
    tolerance: float = 1e-6,
    refinement_steps: int = 3,
    max_iterations: int = 200,
    device_output: bool = True,
    max_chunk_elements: int | None = None,
    band_sink=None,
    stats: dict | None = None,
) -> CGResult:
    """Fill ``image`` where ``umask`` is True by solving the Laplace system
    with multigrid-preconditioned CG; returns the composited image.

    ``image`` is (C, H, W) or (H, W), any float dtype (host or device);
    ``umask`` is (H, W) bool. Bands are solved in HBM-sized chunks; the
    mask hierarchy and compiled executables are shared across chunks.

    ``band_sink``: optional ``fn(start, end, filled_chunk)`` consuming each
    filled chunk as it completes (streaming to a TIFF writer, host buffer,
    checksum, ...). With a sink, chunks are NOT accumulated on device and
    the returned ``x`` is None — a full 13-band 10980^2 output (6.3 GB)
    plus solver state exceeds one chip's HBM, so large workloads stream.

    Host-input chunks are prefetched: chunk k+1's H2D enqueues while chunk
    k solves, overlapping transfer with compute. ``stats`` (optional dict)
    receives ``solve_s`` (time blocked on solver results) for
    transfer-vs-compute attribution.
    """
    import numpy as np

    host_input = isinstance(image, np.ndarray)
    if host_input:
        # keep the image on the host and upload band chunks as they solve:
        # a full 13-band tile plus its filled output cannot both sit in HBM
        image = np.asarray(image, np.float32)
        squeeze = image.ndim == 2
        img32 = image[None] if squeeze else image
    else:
        img32 = jnp.asarray(image, jnp.float32)
        squeeze = img32.ndim == 2
        if squeeze:
            img32 = img32[None]
    umask_j = jnp.asarray(umask, bool)

    c, h, w = img32.shape
    limit = max_chunk_elements or multigrid_chunk_limit()
    bands_per_chunk = max(int(limit // (h * w)), 1)

    import numpy as _np

    deg_j = jax.jit(
        multigrid._neighbor_degree_traced, static_argnums=(0, 1)
    )(h, w)
    levels_j = multigrid._device_hierarchy(umask_j, deg_j)
    from .cg import _accumulate64

    single_chunk = bands_per_chunk >= c
    filled = (
        None
        if (single_chunk or band_sink is not None)
        else jnp.zeros((c, h, w), jnp.float32)
    )
    total_iters = 0
    err = 0.0
    solve_s = 0.0
    transfer_s = 0.0
    import time as _time

    prefetched = jnp.asarray(img32[0:bands_per_chunk]) if host_input else None
    for s in range(0, c, bands_per_chunk):
        e = min(s + bands_per_chunk, c)
        if host_input:
            chunk = prefetched
            if e < c:
                # async enqueue: the next chunk's H2D proceeds while this
                # chunk solves
                prefetched = jnp.asarray(img32[e : min(e + bands_per_chunk, c)])
            # attribute the wait for this chunk's upload to transfer, not
            # solve (the sum forces materialization on device)
            t_up0 = _time.perf_counter()
            _ = float(chunk[..., ::499, ::499].sum())
            transfer_s += _time.perf_counter() - t_up0
        else:
            chunk = img32[s:e]
        t_solve0 = _time.perf_counter()
        x64 = _x0_from_image(chunk, umask_j)
        r64, rnorm_j, bnorm_j = _residual_from_image(chunk, x64, umask_j, deg_j)
        rnorm = _np.asarray(rnorm_j)
        bnorm = _np.asarray(bnorm_j)
        target = tolerance * bnorm
        for _ in range(max(refinement_steps, 1)):
            if _np.all(rnorm <= _np.maximum(target, 1e-300)):
                break
            needed = _np.min(target / _np.maximum(rnorm, 1e-300))
            inner_tol = float(
                _np.clip(0.5 * needed, multigrid.INNER_TOL_FLOOR, 0.5)
            )
            d, iters, _ = multigrid._pcg_run(
                r64.astype(jnp.float32),
                jnp.zeros(r64.shape, jnp.float32),
                jnp.asarray(inner_tol, jnp.float32),
                levels_j,
                max_iterations=max_iterations,
                precond_dtype=multigrid._precond_dtype_for((h, w)),
            )
            total_iters += int(iters)
            x64 = _accumulate64(x64, d, umask_j)
            del d
            r64, rnorm_j, bnorm_j = _residual_from_image(
                chunk, x64, umask_j, deg_j
            )
            rnorm = _np.asarray(rnorm_j)
        err = max(err, float(_np.max(rnorm / _np.maximum(bnorm, 1e-300))))
        solve_s += _time.perf_counter() - t_solve0
        out_chunk = _composite(chunk, x64, umask_j)
        del chunk, x64, r64
        if band_sink is not None:
            band_sink(s, e, out_chunk)
            del out_chunk
        elif single_chunk:
            filled = out_chunk
        else:
            # a ragged tail chunk gets its own jit specialization
            filled = _write_bands(filled, out_chunk, s)
            del out_chunk
    if squeeze and filled is not None:
        filled = filled[0]
    if stats is not None:
        stats["solve_s"] = solve_s
        stats["transfer_wait_s"] = transfer_s
    if not device_output and filled is not None:
        filled = _np.asarray(filled)
    return CGResult(filled, total_iters, err)


def multigrid_chunk_limit() -> int:
    from .cg import MAX_CHUNK_ELEMENTS

    return MAX_CHUNK_ELEMENTS
