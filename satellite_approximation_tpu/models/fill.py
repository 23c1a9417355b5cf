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
    mask hierarchy: 2x2 all-pool ladder, on device

so the only per-band transfer is the f32 image data itself — and none at
all when the image is already device-resident (e.g. produced by the
detection pipeline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

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


@functools.partial(jax.jit, donate_argnums=(1,))
def _composite(img32: jnp.ndarray, x_hi: jnp.ndarray, x_lo: jnp.ndarray, umask: jnp.ndarray):
    """Known pixels from the input, solved values over the mask — always in
    f32 (integer-dtype inputs upload as-is to halve H2D; casting the solve
    result to an integer dtype would truncate the solution). x_hi + x_lo is
    the correctly-rounded f32 solution (|x_lo| <= eps|x_hi|). ``x_hi`` is
    DONATED — the output reuses its buffer, which is what lets a 2-band
    full-tile chunk's composite fit next to the solver state (callers drop
    x_hi immediately after)."""
    umf = umask.astype(jnp.float32)
    return img32.astype(jnp.float32) * (1.0 - umf) + (x_hi + x_lo) * umf


@jax.jit
def _gather_masked(
    x_hi: jnp.ndarray, x_lo: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray
) -> jnp.ndarray:
    """Solved f64 values at the unknown pixels, (C, n): the double-float
    pair recombines in f64 on the gathered vector only — never a full-tile
    emulated-f64 pass."""
    return x_hi[:, iy, ix].astype(jnp.float64) + x_lo[:, iy, ix].astype(jnp.float64)


@jax.jit
def _recombine64(x_hi: jnp.ndarray, x_lo: jnp.ndarray) -> jnp.ndarray:
    """Double-float pair -> f64 array, for callers whose API surface is f64
    (multigrid.solve, solve_masked_poisson)."""
    return x_hi.astype(jnp.float64) + x_lo.astype(jnp.float64)


def _two_sum(a, b):
    """Knuth TwoSum: returns (s, e) with s + e == a + b EXACTLY (branch-free,
    6 flops). Safe under XLA: jax never enables unsafe FP reassociation."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _shift_taps(x):
    """The four in-image 4-neighbour taps (zero outside), as separate arrays
    so callers can feed them through an exact summation cascade."""
    h, w = x.shape[-2], x.shape[-1]
    p = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)])
    return (
        p[..., 0:h, 1 : w + 1],
        p[..., 2 : h + 2, 1 : w + 1],
        p[..., 1 : h + 1, 0:w],
        p[..., 1 : h + 1, 2 : w + 2],
    )


def _cascade(terms):
    """Neumaier compensated sum of f32 terms: (s, c) with s + c capturing the
    exact sum to ~2^-48 relative — every individual rounding error is
    recovered by TwoSum and accumulated in c."""
    s, c = _two_sum(terms[0], terms[1])
    for t in terms[2:]:
        s, e = _two_sum(s, t)
        c = c + e
    return s, c


def _norm64(x32):
    """||x|| with the squares accumulated in f64 (elementwise squares stay
    f32; only the tree reduction runs emulated — negligible next to an
    all-f64 pass)."""
    return jnp.sqrt(jnp.sum((x32 * x32).astype(jnp.float64), axis=(-2, -1)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_iterations", "refinement_steps", "precond_dtype",
        "use_multigrid", "mode", "emit",
    ),
)
def _fused_refine_solve(
    img32,
    rep32,
    umask,
    deg,
    levels_j,
    tolerance,
    max_iterations,
    refinement_steps,
    precond_dtype,
    use_multigrid,
    mode="laplace",
    emit="pair",
):
    """The WHOLE solve — compensated-f32 residual refinement around an inner
    f32 (P)CG — as one compiled program: zero host round trips until the
    final norms.

    The host-driven variant (solve -> fetch rnorm -> adapt inner_tol ->
    solve ...) pays 2+ host<->device synchronizations per refinement pass;
    on a networked-TPU runtime each costs ~0.1 s, dominating small solves.
    Here the adaptive inner tolerance, the refinement while_loop, and the
    nested (P)CG while_loop all trace into a single XLA program — the
    compiler-friendly-control-flow answer (lax.while_loop, static shapes).

    Precision design (round 4): TPUs have no f64 ALUs — XLA emulates f64 in
    software, and the previous all-f64 residual pass measured 203 ms/eval at
    10980^2 vs 45 ms for f32 (benchmarks/x_overhead.py), ~45% of per-band
    solve time. The refinement state is now a DOUBLE-FLOAT pair (x_hi, x_lo)
    and each residual is an error-free TwoSum cascade over the stencil terms
    (~2^-48 effective precision, bit-identical to the f64 pass on u16-scale
    inputs — benchmarks/x_dfloat.py), at 77 ms/eval. Key identities: the
    known/unknown supports are disjoint so known + x_hi is exact, and
    deg*x = 4*x - k*x with k = 4 - deg in {0,1,2} makes both products exact.

    ``mode`` selects the RHS assembly (recomputed in-graph each residual
    pass so b never persists in HBM):

    * "laplace": b = known-neighbour Dirichlet sums of ``img32``
      (laplace.cpp:71-106); x0 = img32 over the mask.
    * "poisson": b = guidance divergence of ``rep32`` + Dirichlet sums of
      ``img32`` (poisson.cpp:103-123/241-254); x0 = rep32 over the mask
      (solveWithGuess parity, poisson.cpp:231-257).
    * "rhs": ``img32`` IS the f64 right-hand side and ``rep32`` the f64
      warm start — the raw-system entry for multigrid.solve and
      solve_masked_poisson (split hi/lo once at entry).

    Returns (x_hi, x_lo, iterations, rnorm_per_band, bnorm_per_band):
    x_hi + x_lo is the solution to ~2^-48; callers that need f64 add the
    pair in f64 (multigrid.solve), f32 consumers take x_hi + x_lo directly.
    """
    from .cg import _cg_core
    from . import multigrid as _mg

    umf = umask.astype(jnp.float32)
    k = (4.0 - deg.astype(jnp.float32)) * umf  # in {0,1,2} on unknowns

    if mode == "rhs":
        b_hi = img32.astype(jnp.float32)
        b_lo = (img32 - b_hi.astype(jnp.float64)).astype(jnp.float32)
        b_hi = b_hi * umf
        b_lo = b_lo * umf
        x_hi = rep32.astype(jnp.float32)
        x_lo = (rep32 - x_hi.astype(jnp.float64)).astype(jnp.float32)
        x_hi = x_hi * umf
        x_lo = x_lo * umf
        known = None
        g = None
    else:
        known = img32.astype(jnp.float32) * (1.0 - umf)
        if mode == "poisson":
            g = rep32.astype(jnp.float32)
            src = g
        else:
            g = None
            src = img32.astype(jnp.float32)
        x_hi = src * umf
        x_lo = jnp.zeros_like(x_hi)
        b_hi = b_lo = None

    def residual(x_hi, x_lo):
        """r = (b - A(x_hi + x_lo)) * um via one exact cascade over the hi
        terms; lo terms contribute at eps^2 and sum in plain f32."""
        if mode == "rhs":
            hi_terms = list(_shift_taps(x_hi)) + [b_hi, -4.0 * x_hi, k * x_hi]
            lo_extra = b_lo
        else:
            y_hi = known + x_hi  # disjoint supports: exact
            hi_terms = list(_shift_taps(y_hi)) + [-4.0 * x_hi, k * x_hi]
            if mode == "poisson":
                hi_terms += [-t for t in _shift_taps(g)] + [4.0 * g, -(k * g)]
            lo_extra = None
        s, c = _cascade(hi_terms)
        l1, l2, l3, l4 = _shift_taps(x_lo)
        lo = l1 + l2 + l3 + l4 - 4.0 * x_lo + k * x_lo
        if lo_extra is not None:
            lo = lo + lo_extra
        r = (s + (c + lo)) * umf
        return r, _norm64(r)

    def bnorm_():
        """||b|| in plain f32 arithmetic (f64-accumulated reduction): bnorm
        only scales the stopping target, so its ~1e-7 relative rounding
        moves the certified tolerance by the same 1e-7 — irrelevant at
        1e-6 — while the cascade variant measured 19 ms vs 11 ms per
        full-tile band (benchmarks/x_resid_marginal)."""
        if mode == "rhs":
            return _norm64(b_hi)
        b = shift_sum(known)
        if mode == "poisson":
            b = b + (4.0 - k) * g - shift_sum(g)
        return _norm64(b * umf)

    if use_multigrid:
        # single-pass floor for the f32 preconditioner; the bf16
        # preconditioner keeps the conservative floor (see multigrid)
        tol_floor = (
            _mg.INNER_TOL_FLOOR_F32
            if precond_dtype == jnp.float32
            else _mg.INNER_TOL_FLOOR
        )
    else:
        tol_floor = 5e-8

    # hoist the preconditioner's dtype-cast levels + padded mask/deg
    # operands out of the refinement loop (each pass re-entering _pcg_core
    # would otherwise rebuild them)
    if use_multigrid:
        if isinstance(levels_j, _mg.Hierarchy):
            mg_levels, mg_coarse_inv = levels_j.levels, levels_j.coarse_inv
        else:
            mg_levels, mg_coarse_inv = levels_j, None
        levels_16 = tuple(
            (m_, d_.astype(precond_dtype)) for m_, d_ in mg_levels
        )
        prebuilt = (levels_16, _mg._padded_md_for_levels(levels_16))
    else:
        mg_levels = mg_coarse_inv = prebuilt = None

    # Pallas residual cascade (laplace mode, large grids): the XLA cascade
    # materializes every shifted tap as a padded full-raster copy and runs
    # at ~45 GB/s — ~40-50 ms per full-tile band, twice per solve. The
    # kernel computes the same TwoSum chain (same operand order, bit-equal
    # to the sign of zero) inside streamed VMEM windows, and the entry
    # variant emits the Dirichlet RHS b from the same windows (the ||b||
    # pass folds in). Level-0's prebuilt padded invm operand is reused.
    from ..ops import pallas_kernels as _pk

    h_, w_ = umask.shape[-2], umask.shape[-1]
    pmd0 = prebuilt[1][0] if prebuilt is not None else None
    use_resker = mode == "laplace" and pmd0 is not None
    if use_resker:
        imgp = _pk.pad_for_kernel(img32.astype(jnp.float32), h_, w_)

        def residual_k(x_hi, x_lo):
            r_full = _pk.residual_pair_tpu_padded(
                imgp,
                _pk.pad_for_kernel(x_hi, h_, w_),
                _pk.pad_for_kernel(x_lo, h_, w_),
                pmd0, h_, w_,
            )
            # rim-free output with exact-zero pads: the norm over the full
            # array equals the norm over [:h, :w] bit-for-bit
            return r_full[..., :h_, :w_], _norm64(r_full)

        r_full, b_full = _pk.residual_entry_tpu_padded(imgp, pmd0, h_, w_)
        bnorm = _norm64(b_full)
        r_hi, rnorm = r_full[..., :h_, :w_], _norm64(r_full)
        residual = residual_k
    else:
        bnorm = bnorm_()
        r_hi, rnorm = residual(x_hi, x_lo)
    target = jnp.maximum(tolerance * bnorm, jnp.finfo(jnp.float64).tiny)

    def cond(state):
        step, _, _, _, rnorm, _ = state
        return jnp.logical_and(jnp.any(rnorm > target), step < refinement_steps)

    def body(state):
        step, x_hi, x_lo, r_hi, rnorm, iters = state
        needed = jnp.min(target / jnp.maximum(rnorm, 1e-300))
        inner_tol = jnp.clip(0.5 * needed, tol_floor, 0.5).astype(jnp.float32)
        z32 = jnp.zeros(r_hi.shape, jnp.float32)
        if use_multigrid:
            d, it, _ = _mg._pcg_core(
                r_hi, z32, inner_tol, mg_levels,
                max_iterations=max_iterations, precond_dtype=precond_dtype,
                coarse_inv=mg_coarse_inv, prebuilt=prebuilt,
            )
        else:
            d, it, _ = _cg_core(r_hi, z32, umask, deg, inner_tol, max_iterations)
        x_hi, e = _two_sum(x_hi, d * umf)
        x_lo = x_lo + e
        r_hi, rnorm = residual(x_hi, x_lo)
        return step + 1, x_hi, x_lo, r_hi, rnorm, iters + it

    _, x_hi, x_lo, r_hi, rnorm, iters = lax.while_loop(
        cond, body, (jnp.int32(0), x_hi, x_lo, r_hi, rnorm, jnp.int32(0))
    )
    if emit == "composite":
        # the composited image comes out of the SAME program: one dispatch
        # per chunk instead of two (each jit call costs host serialization
        # + an RPC enqueue on tunneled runtimes), and the x_hi/x_lo pair
        # never materializes as a program output
        assert mode != "rhs", "rhs mode has no image to composite"
        filled = img32.astype(jnp.float32) * (1.0 - umf) + (x_hi + x_lo) * umf
        return filled, iters, rnorm, bnorm
    return x_hi, x_lo, iters, rnorm, bnorm


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
    masked_values_output: bool = False,
    use_multigrid: bool = True,
    replacement=None,
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

    ``masked_values_output``: return only the solved values at the unknown
    pixels as a host (C, n) f64 array (np.nonzero row-major order) instead
    of the composited image — on tunneled-TPU hosts the D2H fetch shrinks
    from the full raster to ~n values (the reference-parity ``solve_matrix``
    scatters these back into its f64 host image). Mutually exclusive with
    ``band_sink``.

    ``use_multigrid=False`` solves the residual systems with plain f32 CG
    instead of multigrid-preconditioned CG — no hierarchy build, the right
    call for small unknown sets (SolverConfig.mg_threshold_pixels); pass a
    CG-sized ``max_iterations`` (e.g. 4n+64) with it.

    ``replacement``: optional guidance image of the same shape — switches
    the system to Poisson editing (guidance-divergence RHS, warm start from
    the replacement; poisson.cpp:103-123/231-257). The composited output
    still takes known pixels from ``image``.
    """
    import numpy as np

    host_input = isinstance(image, np.ndarray)
    if host_input:
        # keep the image on the host and upload band chunks as they solve:
        # a full 13-band tile plus its filled output cannot both sit in HBM.
        # u8/u16 rasters (the Sentinel-2 case) upload in their integer dtype
        # — HALF the H2D bytes — and cast to f32 on device (exact: u16 ⊂ f32)
        if image.dtype not in (np.uint8, np.uint16, np.int16, np.int32):
            image = np.asarray(image, np.float32)
        squeeze = image.ndim == 2
        img32 = image[None] if squeeze else image
        if replacement is not None:
            if replacement.dtype not in (np.uint8, np.uint16, np.int16, np.int32):
                replacement = np.asarray(replacement, np.float32)
            rep32 = replacement[None] if squeeze else replacement
    else:
        # device inputs: integer rasters stay in their integer dtype (a
        # resident 13-band u16 stack is 3.1 GB vs 6.3 GB f32 — the margin
        # that lets 2-band chunks fit next to the solver state); the
        # per-chunk f32 cast happens inside the fused solve
        img32 = jnp.asarray(image)
        if img32.dtype not in (jnp.uint8, jnp.uint16, jnp.int16, jnp.int32):
            img32 = img32.astype(jnp.float32)
        squeeze = img32.ndim == 2
        if squeeze:
            img32 = img32[None]
        if replacement is not None:
            rep32 = jnp.asarray(replacement)
            if rep32.dtype not in (jnp.uint8, jnp.uint16, jnp.int16, jnp.int32):
                rep32 = rep32.astype(jnp.float32)
            if squeeze:
                rep32 = rep32[None]
    mode = "laplace" if replacement is None else "poisson"
    # dedup repeated mask uploads (multi-date fills reuse one cloud mask)
    umask_j = multigrid.device_constant(
        umask if isinstance(umask, np.ndarray) else jnp.asarray(umask, bool)
    ).astype(bool)

    c, h, w = img32.shape
    limit = max_chunk_elements or multigrid_chunk_limit()
    # NOTE (round-5 negative result, benchmarks/x_fulltile13): multi-band
    # full-tile chunks do NOT pay. Every per-chunk "fixed" cost (residual
    # cascades, bnorm, the refinement passes' setup V-cycles, composite) is
    # bandwidth-bound and scales with the chunk's bands, iteration counts
    # are per-band-max rather than shared, and a 2-band 10980^2 chunk's
    # solver state exhausts a 16 GB chip's HBM.
    bands_per_chunk = max(int(limit // (h * w)), 1)

    import numpy as _np

    if masked_values_output and band_sink is not None:
        raise ValueError("masked_values_output and band_sink are mutually exclusive")
    deg_j = jax.jit(
        multigrid._neighbor_degree_traced, static_argnums=(0, 1)
    )(h, w)
    levels_j = multigrid._device_hierarchy(umask_j, deg_j) if use_multigrid else None

    if masked_values_output:
        ys, xs = _np.nonzero(_np.asarray(umask))
        iy = jnp.asarray(ys, jnp.int32)
        ix = jnp.asarray(xs, jnp.int32)
        masked_vals = []

    single_chunk = bands_per_chunk >= c
    # masked_values_output never materializes the raster output — holding a
    # (C, H, W) accumulator anyway would pin ~6 GB of HBM for a 13-band tile
    filled = (
        None
        if (single_chunk or band_sink is not None or masked_values_output)
        else jnp.zeros((c, h, w), jnp.float32)
    )
    total_iters = 0
    err = 0.0
    solve_s = 0.0
    transfer_s = 0.0
    import time as _time

    prefetched = jnp.asarray(img32[0:bands_per_chunk]) if host_input else None
    prefetched_rep = (
        jnp.asarray(rep32[0:bands_per_chunk])
        if host_input and replacement is not None
        else None
    )
    # Per-chunk result scalars stay ON DEVICE until the loop ends: a
    # blocking device_get per chunk costs a link round trip (~25 ms on
    # tunneled hosts) and — worse — stalls the dispatch pipeline, so chunk
    # k+1's solve could not overlap chunk k's epilogue. One batched fetch
    # at the end pays a single RTT for all chunks.
    pending_norms: list = []
    # scalar operands hoisted out of the loop: each jnp scalar creation is
    # its own tiny H2D transfer (a full link round trip on tunneled hosts)
    tol_j = jnp.float64(tolerance)
    pdtype = multigrid._precond_dtype_for((h, w))
    # Fusing the composite into the solve program (emit="composite") saves a
    # dispatch per chunk, but at full-tile scale the fused program
    # MISCOMPILES on the current TPU toolchain: the refinement while_loop is
    # eliminated (iterations == 0, rnorm == 0 exactly) when the loop's
    # x_hi/x_lo results feed only the in-program composite instead of being
    # program outputs. Verified good at 600^2/2048^2/5490^2 and broken at
    # 10980^2 with otherwise identical operands (round 5; same toolchain
    # family as the round-3 reduce_window pins in bench.py). Above the
    # verified ceiling the chunk solve emits the pair and composites in a
    # second dispatch — sub-ms next to a multi-second full-tile band solve.
    fuse_composite = (not masked_values_output) and (h * w <= _COMPOSITE_FUSE_LIMIT)
    t_loop0 = _time.perf_counter()
    for s in range(0, c, bands_per_chunk):
        e = min(s + bands_per_chunk, c)
        if host_input:
            chunk = prefetched
            rchunk = prefetched_rep
            if e < c:
                # async enqueue: the next chunk's H2D proceeds while this
                # chunk solves
                prefetched = jnp.asarray(img32[e : min(e + bands_per_chunk, c)])
                if replacement is not None:
                    prefetched_rep = jnp.asarray(
                        rep32[e : min(e + bands_per_chunk, c)]
                    )
            # attribute the wait for this chunk's upload to transfer, not
            # solve (the sum forces materialization on device)
            t_up0 = _time.perf_counter()
            _ = float(chunk[..., ::499, ::499].sum())
            if rchunk is not None:
                _ = float(rchunk[..., ::499, ::499].sum())
            transfer_s += _time.perf_counter() - t_up0
        else:
            chunk = img32[s:e]
            rchunk = rep32[s:e] if replacement is not None else None
        # one fused program: compensated-f32 refinement + inner (P)CG +
        # (for image outputs) the composite, in a single dispatch; norms
        # are the only values that cross back to the host
        solve_out = _fused_refine_solve(
            chunk,
            chunk if rchunk is None else rchunk,
            umask_j,
            deg_j,
            () if levels_j is None else levels_j,
            tol_j,
            max_iterations=max_iterations,
            refinement_steps=max(refinement_steps, 1),
            precond_dtype=pdtype,
            use_multigrid=use_multigrid,
            mode=mode,
            emit="composite" if fuse_composite else "pair",
        )
        if masked_values_output:
            x_hi, x_lo, iters_j, rnorm_j, bnorm_j = solve_out
            pending_norms.append((iters_j, rnorm_j, bnorm_j))
            # compact D2H: n f64 values per band instead of the full raster
            masked_vals.append(_np.asarray(_gather_masked(x_hi, x_lo, iy, ix)))
            del chunk, x_hi, x_lo
            continue
        if fuse_composite:
            out_chunk, iters_j, rnorm_j, bnorm_j = solve_out
        else:
            x_hi, x_lo, iters_j, rnorm_j, bnorm_j = solve_out
            out_chunk = _composite(chunk, x_hi, x_lo, umask_j)
            del x_hi, x_lo
        pending_norms.append((iters_j, rnorm_j, bnorm_j))
        del chunk
        if band_sink is not None:
            band_sink(s, e, out_chunk)
            del out_chunk
        elif single_chunk:
            filled = out_chunk
        else:
            # a ragged tail chunk gets its own jit specialization
            filled = _write_bands(filled, out_chunk, s)
            del out_chunk
    # ONE batched fetch for every chunk's norms (single link RTT)
    for iters_v, rnorm, bnorm in jax.device_get(pending_norms):
        total_iters += int(iters_v)
        err = max(err, float(_np.max(rnorm / _np.maximum(bnorm, 1e-300))))
    solve_s = _time.perf_counter() - t_loop0 - transfer_s
    if stats is not None:
        stats["solve_s"] = solve_s
        stats["transfer_wait_s"] = transfer_s
    if masked_values_output:
        vals = _np.concatenate(masked_vals, axis=0)
        return CGResult(vals[0] if squeeze else vals, total_iters, err)
    if squeeze and filled is not None:
        filled = filled[0]
    if not device_output and filled is not None:
        filled = _np.asarray(filled)
    return CGResult(filled, total_iters, err)


# Largest per-band grid (elements) allowed to fuse the composite into the
# solve program — the largest size the fused program is VERIFIED correct at
# (5490^2 = 30.1M; the 10980^2 fused program miscompiles — see laplace_fill)
_COMPOSITE_FUSE_LIMIT = 31_000_000


def multigrid_chunk_limit() -> int:
    from .cg import MAX_CHUNK_ELEMENTS

    return MAX_CHUNK_ELEMENTS
