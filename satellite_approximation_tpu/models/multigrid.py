"""Mask-aware geometric multigrid for the masked Poisson systems.

The reference hands every system to a single-level Eigen CG whose iteration
count grows with the masked-region diameter (poisson.cpp:203-257). For
full-tile fills (10980^2) that is thousands of iterations; multigrid makes
the cost O(N) regardless of region size — the decisive step toward the
<1 s full-tile target (SURVEY.md §7 stage 4).

Design (fully jittable, static shapes):

* hierarchy: unknown masks coarsen by 2x2 ALL-pooling — a coarse cell is
  unknown only when its whole 2x2 fine block is. Any-pooling (the obvious
  choice) grows every unknown blob by ~1 cell per level, so the
  rediscretized coarse operator under-anchors the Dirichlet boundary and
  the coarse correction overshoots small blobs by (1+2/rho)^2 — measured
  DIVERGENT as a stationary iteration (ratio 1.6-2.4, benchmarks/
  x_vcontraction.py). All-pooling shrinks blobs instead: corrections are
  conservative ((1-2/rho)^2 < 1, never divergent) and structures too thin
  to survive coarsening are exactly the ones the smoother already handles
  (2-3 PCG iterations on crack/scanline masks, benchmarks/x_thinmask.py).
  Measured at 2048^2 (benchmarks/x_coarsen_ab.py): 5 vs 7 PCG iterations
  to 1e-4, 7 vs 12 to 3e-7;
* operator on every level is the rediscretized masked 5-point stencil
  (deg*u - sum of unknown neighbours); grid-h factors cancel because
  restriction is a 2x2 block sum (amplification 4 = the coarse operator's
  4x symbol growth) and prolongation is its exact transpose (piecewise-
  constant block broadcast), keeping the V-cycle symmetric. Block
  transfers measured another iteration off (4 @1e-4, benchmarks/
  x_blocktransfer.py) AND avoid the separable bilinear transfers' XLA
  lane-relayout cost (47 ms of a 183 ms full-tile PCG iteration);
* smoother: damped Jacobi (w=0.8), same count pre/post → the V-cycle is an
  (approximately) SPD preconditioner, wrapped in *flexible* PCG
  (Polak-Ribiere beta) to absorb the coarse-level CG's nonlinearity; on TPU
  the fine-level smoother is a fused Pallas strip kernel;
* everything runs in f32 on-device inside one jitted while_loop; the outer
  f64 iterative-refinement loop (shared with models/cg.py) restores
  f64-grade accuracy.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .cg import CGResult, neighbor_degree, masked_laplacian

_OMEGA = 0.8
# K=7 re-A/B'd at full tile under the round-5 az-fused cost model
# (benchmarks/x_sweeps_r5): K=6 451.8 ms/band at 7 PCG iterations,
# K=7 427.5 ms at 6 — the stronger cycle buys an iteration. K=7 is also
# the ring-budget ceiling: post sweeps + the emitted-residual ring must
# fit HALO_R = 8.
_PRE_SMOOTH = 7
_POST_SMOOTH = 7
_COARSE_ITERS = 64
_MIN_SIZE = 24
# Smoother polynomial: "chebyshev" gives each sweep its own weight from the
# Chebyshev roots on [LAMBDA_MAX/alpha, LAMBDA_MAX] — the K-sweep error
# polynomial is then the minimax polynomial on the smoothing interval
# (contraction 2/T_K(sigma) instead of damped Jacobi's (1-omega*lo)^K).
# With K=6, alpha=4: 0.0055 vs 0.047 — a strictly stronger smoother at the
# same cost. "jacobi" restores the classic fixed-omega sweeps.
SMOOTHER = "chebyshev"
_CHEB_ALPHA = 4.0  # smooth [lambda_max/alpha, lambda_max]
_LAMBDA_MAX = 2.0  # Gershgorin bound of D^-1 A for the masked 5-point stencil


def _smoother_omegas(k: int) -> tuple[float, ...]:
    """Per-sweep weights. Chebyshev: omega_j = 1/theta_j with theta_j the
    K Chebyshev nodes on the smoothing interval; applied in natural order
    pre-smoothing and reversed post-smoothing so the V-cycle stays
    (approximately) symmetric — each Jacobi factor (I - omega D^-1 A) is
    self-adjoint in the D-inner product, so reversing the product order
    transposes the smoother."""
    import math

    if SMOOTHER != "chebyshev":
        return (_OMEGA,) * k
    lo, hi = _LAMBDA_MAX / _CHEB_ALPHA, _LAMBDA_MAX
    mid, rad = (hi + lo) / 2.0, (hi - lo) / 2.0
    thetas = [mid + rad * math.cos(math.pi * (2 * j - 1) / (2 * k)) for j in range(1, k + 1)]
    return tuple(1.0 / t for t in thetas)
# see the inner_tol comment in solve(): per-pass f32 CG stops here and the
# f64 outer loop carries the rest. With a bf16 preconditioner the floor
# stays high (grinding f32 PCG against a low-precision preconditioner far
# below ~1e-4 burns iterations near its noise floor); the f32
# preconditioner reaches 1e-6-grade targets in ONE pass — measured at full
# tile (benchmarks/x_fulltile13): floor 3e-7 = 5.27 s / 78 iters vs
# floor 1e-4 = 5.52 s / 84 iters for the 13-band fill (the second
# refinement pass's setup V-cycle + cascade disappear).
INNER_TOL_FLOOR = 1e-4
INNER_TOL_FLOOR_F32 = 3e-7
# V-cycle working dtype (see _pcg_run). None = size-adaptive: bf16's halved
# HBM traffic wins at moderate grids, but its contraction degrades with
# grid size (A/B, benchmarks/ab_*: 2048^2x13 bf16 0.75s/13it vs f32 0.89s/
# 12it; 10980^2 bf16 3.48s/37it vs f32 3.06s/21it) — crossover ~4k.
PRECOND_DTYPE = None


def _precond_dtype_for(shape: tuple[int, int]):
    if PRECOND_DTYPE is not None:
        return PRECOND_DTYPE
    return jnp.float32 if max(shape) > 4096 else jnp.bfloat16


def _neighbor_degree_traced(h: int, w: int) -> jnp.ndarray:
    """neighbor_degree computed on device (no 480MB H2D per level)."""
    ii = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    jj = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    edge = (
        (ii == 0).astype(jnp.float32)
        + (ii == h - 1).astype(jnp.float32)
        + (jj == 0).astype(jnp.float32)
        + (jj == w - 1).astype(jnp.float32)
    )
    return 4.0 - edge


def _allpool(m: jnp.ndarray) -> jnp.ndarray:
    # strided slices, not reshape-to-(h/2,2,w/2,2): the 4-D reshape
    # materializes a badly-laid-out temporary on TPU at full-tile scale.
    # Padding cells are False, so border blocks straddling the pad are
    # known — consistent with "shrink toward the Dirichlet anchor".
    h, w = m.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    mp = jnp.pad(m, ((0, ph - h), (0, pw - w)))
    return (mp[0::2, 0::2] & mp[0::2, 1::2]) & (mp[1::2, 0::2] & mp[1::2, 1::2])


@jax.jit
def _build_levels_device(m0: jnp.ndarray):
    """Coarse (umask, deg) levels computed entirely on device — the exact
    device analog of :func:`build_hierarchy` minus level 0 (which keeps the
    caller's mask/deg). The saturation rule (a level with NO known cells →
    deg=4 ladder, i.e. implicit exterior Dirichlet) folds into a traced
    flag instead of a host branch; with all-pooling it can only trigger
    when the input mask itself is all-unknown (the mask never grows), but
    that degenerate input must not produce a singular coarse operator."""
    out = []
    m = m0
    sat = jnp.asarray(False)
    while min(m.shape) > _MIN_SIZE:
        m2 = _allpool(m)
        sat = jnp.logical_or(sat, m2.all())
        h2, w2 = m2.shape
        deg2 = jnp.where(
            sat, jnp.full((h2, w2), 4.0, jnp.float32), _neighbor_degree_traced(h2, w2)
        )
        out.append((m2, deg2))
        m = m2
    return tuple(out)


@jax.jit
def _mask_checksum_device(m: jnp.ndarray):
    """Exact-content checksum keying the hierarchy cache for device masks:
    bits pack 32-per-uint32-word on device, then two independent
    position-mixed modular sums reduce to one tiny D2H fetch. Every bit of
    the mask feeds both sums through a position-dependent odd multiplier
    (invertible mod 2^32), so any single-pixel flip changes both — unlike
    the 3-float-moment fingerprint this replaces, whose collisions silently
    reused a wrong coarse hierarchy (bounded damage — the f64 outer residual
    still converges — but a whole hazard class for two extra reductions)."""
    flat = m.reshape(-1)
    pad = (-flat.shape[0]) % 32
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    bits = flat.reshape(-1, 32).astype(jnp.uint32)
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    words = jnp.sum(bits << shifts, axis=1, dtype=jnp.uint32)
    i = jnp.arange(words.shape[0], dtype=jnp.uint32)
    h1 = jnp.sum(
        words * (jnp.uint32(2) * i + jnp.uint32(0x9E3779B9)), dtype=jnp.uint32
    )
    h2 = jnp.sum(
        (words ^ (i * jnp.uint32(0x85EBCA6B))) * jnp.uint32(0xC2B2AE35),
        dtype=jnp.uint32,
    )
    return h1, h2


def build_hierarchy(umask: np.ndarray, deg: np.ndarray):
    """List of (umask, deg) per level, finest first. Coarse unknowns are
    2x2 ALL-pools of fine unknowns (see the module docstring for why
    any-pooling diverges); degrees are the in-image neighbour counts of
    the coarse grid (the rediscretized operator)."""
    levels = [(np.asarray(umask, bool), np.asarray(deg, np.float32))]
    m = np.asarray(umask, bool)
    while min(m.shape) > _MIN_SIZE:
        h, w = m.shape
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        mp = np.zeros((ph, pw), dtype=bool)
        mp[:h, :w] = m
        pooled = mp.reshape(ph // 2, 2, pw // 2, 2).all(axis=(1, 3))
        if pooled.all():
            # no known cell survives (only possible when the input mask is
            # itself all-unknown — all-pooling never grows the mask). With
            # in-image-neighbour degrees the operator would turn singular
            # (pure-Neumann graph Laplacian); continue coarsening with
            # deg=4 everywhere — an implicit zero-Dirichlet just outside
            # the image, the right boundary approximation for the error
            # equation and plenty for a preconditioner.
            m = pooled
            while True:
                levels.append((m, np.full(m.shape, 4.0, dtype=np.float32)))
                if min(m.shape) <= _MIN_SIZE:
                    break
                h2, w2 = m.shape
                m = np.ones(((h2 + 1) // 2, (w2 + 1) // 2), dtype=bool)
            return levels
        m = pooled
        d = neighbor_degree(m.shape)
        levels.append((m, d))
    return levels


class Hierarchy(NamedTuple):
    """Device multigrid hierarchy: (umask, deg) per level plus the dense
    inverse of the coarsest-level operator (None when the coarsest grid is
    too large for a dense factorization — extreme aspect ratios only)."""

    levels: tuple
    coarse_inv: Optional[jnp.ndarray]


# Dense-coarse-solve cap, in coarsest-grid CELLS. 4096 cells = a 4096^2 f32
# inverse (67 MB) built once per mask; every square input stops well under
# it (a 10980^2 tile's coarsest level is 22x22 = 484 cells).
_DENSE_COARSE_MAX = 4096


@jax.jit
def _dense_coarse_inverse(m, deg):
    """inv(A) of the coarsest masked 5-point operator, dense f32.

    The coarse-grid correction was a ~100-iteration CG whose ~8 tiny ops per
    iteration dominated the V-cycle's non-bandwidth time on TPU (measured:
    the marginal PCG iteration ran at ~29% of the HBM roofline at 2048^2,
    with the coarse tail the largest non-traffic term). One precomputed
    N<=4096 dense inverse turns the whole coarse solve into a single MXU
    matvec — and makes the V-cycle's coarsest correction exact, which also
    strengthens the preconditioner.

    Rows/cols for known cells are identity (their residual is zero), so the
    inverse acts as the exact solve on every masked component.
    """
    hc, wc = m.shape
    n = hc * wc
    mflat = m.ravel()
    diag = jnp.where(mflat, deg.ravel().astype(jnp.float32), jnp.float32(1.0))
    rng = jnp.arange(n, dtype=jnp.int32)
    a = jnp.zeros((n, n), jnp.float32).at[rng, rng].set(diag)
    idx = rng.reshape(hc, wc)

    def link(a, p, q, ok):
        val = jnp.where(ok, jnp.float32(-1.0), jnp.float32(0.0))
        a = a.at[p, q].add(val)
        return a.at[q, p].add(val)

    a = link(
        a, idx[:-1, :].ravel(), idx[1:, :].ravel(), (m[:-1, :] & m[1:, :]).ravel()
    )
    a = link(
        a, idx[:, :-1].ravel(), idx[:, 1:].ravel(), (m[:, :-1] & m[:, 1:]).ravel()
    )
    return jnp.linalg.inv(a)


def _use_pallas(u, sweeps, extra_ring=0):
    from ..ops.pallas_kernels import pallas_available, HALO_R as HALO

    return (
        pallas_available()
        and u.ndim == 3
        and u.shape[-2] * u.shape[-1] >= 512 * 512
        and sweeps + extra_ring <= HALO
    )


def _smooth(u, b, um, deg, omegas: tuple, u_is_zero: bool = False):
    """Weighted-Jacobi sweeps (one weight per sweep — Chebyshev smoothing
    by default, see :func:`_smoother_omegas`) restricted to unknowns. On
    TPU, large levels dispatch to the fused Pallas strip kernel (all sweeps
    in VMEM, ~2.5x faster than the XLA per-sweep path); small levels and
    other backends use XLA.

    ``u_is_zero``: the caller guarantees u == 0 (the V-cycle pre-smooth —
    every level's incoming iterate is zeros). Bit-identical results, but
    the first sweep needs no A-apply (A·0 = 0) and the Pallas path skips
    the u DMA entirely (fused_jacobi_zero_tpu)."""
    from ..ops.pallas_kernels import fused_jacobi_tpu, fused_jacobi_zero_tpu

    eff_sweeps = len(omegas) - (1 if u_is_zero else 0)
    if _use_pallas(b, eff_sweeps):
        if u_is_zero:
            return fused_jacobi_zero_tpu(
                b, um, deg, sweeps=len(omegas), omega=omegas
            )
        # the Pallas path computes updates everywhere (mask folds into the
        # update term); match the XLA path exactly
        return fused_jacobi_tpu(u, b, um, deg, sweeps=len(omegas), omega=omegas)

    inv_deg = jnp.where(deg > 0, 1.0 / deg, 0.0)

    if u_is_zero:
        u = omegas[0] * b * inv_deg * um
        omegas = omegas[1:]
    for om in omegas:
        au = masked_laplacian(u, um, deg)
        u = u + om * (b - au) * inv_deg * um
    return u


def _smooth_residual(u, b, um, deg, omegas: tuple, u_is_zero: bool = False):
    """(smoothed u, post-smooth residual (b - A u) * um) — fused into ONE
    Pallas pass where available (the residual reuses the VMEM window, no
    second full-grid A-apply)."""
    from ..ops.pallas_kernels import fused_jacobi_tpu, fused_jacobi_zero_tpu

    eff_sweeps = len(omegas) - (1 if u_is_zero else 0)
    if _use_pallas(b, eff_sweeps, extra_ring=1):
        if u_is_zero:
            return fused_jacobi_zero_tpu(
                b, um, deg, sweeps=len(omegas), omega=omegas, emit_residual=True
            )
        return fused_jacobi_tpu(
            u, b, um, deg, sweeps=len(omegas), omega=omegas, emit_residual=True
        )
    u = _smooth(u, b, um, deg, omegas, u_is_zero=u_is_zero)
    r = (b - masked_laplacian(u, um, deg)) * um.astype(u.dtype)
    return u, r


def _restrict(r):
    """R = P^T: 2x2 block sum to the coarser grid (piecewise-constant
    transfers), after padding odd sizes up to even.

    The block sum's amplification of a smooth mode is 4, exactly matching
    the rediscretized coarse operator's 4x symbol growth, so corrections
    come back correctly scaled (same cancellation the previous separable
    full-weighting scheme had). Chosen over bilinear/full-weighting on
    measurement: one PCG iteration FEWER to 1e-4 with all-pool coarsening
    (benchmarks/x_blocktransfer.py) and none of the lane-dim strided
    relayouts that made the separable transfers cost 47 ms of a 183 ms
    full-tile PCG iteration (15x their HBM traffic bound)."""
    h, w = r.shape[-2], r.shape[-1]
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    nb = r.ndim - 2
    pad = [(0, 0)] * nb + [(0, ph - h), (0, pw - w)]
    rp = jnp.pad(r, pad)
    # rows first, then columns — the same grouping the sharded path
    # (parallel/mg.py) composes, so both sum bit-identically in f32.
    # The row pass runs as a sublane-only reduce_window: same pair sums
    # as rp[0::2] + rp[1::2] bit-for-bit, but 4x faster at full tile
    # (0.90 vs 3.62 ms, benchmarks/x_restrict_axes.py) because the
    # strided-slice form relayouts. The column pass stays on strided
    # slices — a lane-dim reduce_window is 20x WORSE (37.9 ms).
    rows = lax.reduce_window(
        rp,
        jnp.zeros((), r.dtype),
        lax.add,
        (1,) * nb + (2, 1),
        (1,) * nb + (2, 1),
        "VALID",
    )
    return rows[..., :, 0::2] + rows[..., :, 1::2]


def _prolong(e, fine_shape):
    """P = R^T: piecewise-constant block broadcast back to the fine grid.

    Stays on jnp.repeat. A dilate(interior-pad)+stride-1-2x2-window-sum
    formulation measured 2x faster fused with the mask/add consumer
    (benchmarks/x_transfer3.py), and is value-identical in eager mode —
    but under jit on this TPU toolchain it MISCOMPILES at coarse sizes
    >= 512^2 (outputs wrong almost everywhere while eager is exact;
    guarded by tests/test_pallas.py::TestTransferLowering). Do not
    reintroduce without that test passing on the real chip."""
    up = jnp.repeat(jnp.repeat(e, 2, axis=-2), 2, axis=-1)
    return up[..., : fine_shape[-2], : fine_shape[-1]]


def _padded_md_for_levels(levels_j):
    """Per-level padded ``invm`` operand (the kernel's merged mask+degree
    window, ops/pallas_kernels.invm_for_kernel) for levels the Pallas
    smoother will take, None elsewhere — built ONCE per solve (outside the
    PCG while_loop) so each smoother call skips its pad copies; the padded
    u/b state lives inside :func:`_v_cycle`'s padded branch."""
    from ..ops.pallas_kernels import (
        HALO_R, invm_for_kernel, pad_for_kernel, pallas_available,
    )

    sweeps = max(_PRE_SMOOTH + 1, _POST_SMOOTH)
    out = []
    for um, deg in levels_j:
        h, w = um.shape[-2], um.shape[-1]
        if pallas_available() and h * w >= 512 * 512 and sweeps <= HALO_R:
            out.append(pad_for_kernel(invm_for_kernel(um, deg), h, w))
        else:
            out.append(None)
    return tuple(out)


def _v_cycle(levels_j, b, u, lvl, coarse_inv=None, padded_md=None,
             u_is_zero: bool = False, emit_top_residual: bool = False):
    """One V-cycle. ``u_is_zero`` asserts the incoming iterate is zeros
    (always true when the cycle runs as a preconditioner and for every
    recursive level) — results are bit-identical, but pre-smoothing skips
    the u read and its first A-apply (see _smooth).

    ``emit_top_residual``: return ``(u, (b - A u) * m)`` instead of ``u``,
    with the residual computed inside the top level's post-smooth kernel
    window (Pallas path) — the PCG loop turns it into A·u for free and
    drops its standalone A-apply pass (see fused_jacobi_corr_tpu_padded)."""
    um, deg = levels_j[lvl]
    if lvl == len(levels_j) - 1:
        if emit_top_residual:
            # single-level hierarchies only: the coarse solve IS the top
            u2 = _v_cycle(levels_j, b, u, lvl, coarse_inv, padded_md,
                          u_is_zero=u_is_zero)
            return u2, (b - masked_laplacian(u2, um, deg)) * um.astype(u2.dtype)
        if coarse_inv is not None:
            # exact coarse solve: one MXU matvec against the precomputed
            # dense inverse (see _dense_coarse_inverse) — replaces ~100 CG
            # iterations of tiny VPU ops
            r = b * um if u_is_zero else (b - masked_laplacian(u, um, deg)) * um
            n = um.shape[-2] * um.shape[-1]
            rb = r.reshape(*r.shape[:-2], n).astype(jnp.float32)
            e = (rb @ coarse_inv.T).astype(u.dtype).reshape(r.shape)
            return u + e * um.astype(u.dtype)
        # coarsest without a dense inverse (oversized coarse grids only):
        # plain CG, budgeted by the coarse grid's diameter (an all-unknown
        # input mask keeps every level saturated, so the coarsest level can
        # be large and nearly all-unknown — a fixed budget starves it and
        # the whole preconditioner collapses)
        coarse_iters = max(_COARSE_ITERS, 4 * max(um.shape))
        r = b * um if u_is_zero else (b - masked_laplacian(u, um, deg)) * um

        def body(_, state):
            x, r, p, rs = state
            ap = masked_laplacian(p, um, deg)
            pap = jnp.sum(p * ap, axis=(-2, -1))
            alpha = jnp.where(pap > 0, rs / jnp.where(pap > 0, pap, 1.0), 0.0)
            a = alpha[..., None, None]
            x = x + a * p
            r = r - a * ap
            rs_new = jnp.sum(r * r, axis=(-2, -1))
            beta = jnp.where(rs > 0, rs_new / jnp.where(rs > 0, rs, 1.0), 0.0)
            p = r + beta[..., None, None] * p
            return x, r, p, rs_new

        rs = jnp.sum(r * r, axis=(-2, -1))
        u, _, _, _ = lax.fori_loop(0, coarse_iters, body, (u, r, r, rs))
        return u

    pre = _smoother_omegas(_PRE_SMOOTH)
    post = tuple(reversed(_smoother_omegas(_POST_SMOOTH)))
    pmd = padded_md[lvl] if padded_md is not None else None
    eff_pre = len(pre) - (1 if u_is_zero else 0)
    if pmd is not None and _use_pallas(b, eff_pre, extra_ring=1):
        # padded-resident level: u/b stay in the kernel's padded layout
        # across both smoother passes, so only b pays a materialized pad
        # (u starts as padded zeros; mask/deg were padded once per solve by
        # _padded_md_for_levels; the output slice fuses into its consumer).
        # Bit-identical to the plain path — the kernel sees the same
        # windows (tests/test_pallas.py::TestPaddedIO) — but drops ~5 GB of
        # pad/slice copy traffic per V-cycle at full-tile scale
        # (benchmarks/x_lane_align.py measured the pads at ~40% of each
        # smoother call's wall time).
        from ..ops.pallas_kernels import (
            corr_half_for_kernel,
            fused_jacobi_corr_tpu_padded,
            fused_jacobi_tpu_padded,
            fused_jacobi_zero_tpu_padded,
            pad_for_kernel,
            slice_from_kernel,
        )

        invmp = pmd
        h, w = um.shape[-2], um.shape[-1]
        bp = pad_for_kernel(b, h, w)
        um_c, _ = levels_j[lvl + 1]
        if u_is_zero:
            # zero-start pre-smooth: the u operand (and its pad copy + DMA)
            # disappears entirely — see fused_jacobi_zero_tpu.
            # NEGATIVE RESULT (round 5): emit_residual="half" (the restrict
            # row pass fused into the kernel via a sublane-split reshape)
            # is bit-exact but ~2.3x SLOWER end to end at full tile
            # (9.76 s vs 5.27 s for the 13-band fill at identical
            # iteration counts — the in-kernel reshape relayouts dominate).
            # The kernel mode + bitwise test are kept
            # (tests/test_pallas.py::TestHalfRestrict) as the record; the
            # production path emits the full residual and restricts in XLA.
            up, rp = fused_jacobi_zero_tpu_padded(
                bp, invmp, h, w, sweeps=len(pre), omega=pre,
                emit_residual=True,
            )
            r = slice_from_kernel(rp, h, w)
            r_c = _restrict(r) * um_c.astype(r.dtype)
        else:
            up = pad_for_kernel(u, h, w)
            up, rp = fused_jacobi_tpu_padded(
                up, bp, invmp, h, w, sweeps=len(pre), omega=pre,
                emit_residual=True,
            )
            r = slice_from_kernel(rp, h, w)
            r_c = _restrict(r) * um_c.astype(r.dtype)
        e_c = _v_cycle(
            levels_j, r_c, jnp.zeros_like(r_c), lvl + 1, coarse_inv, padded_md,
            u_is_zero=True,
        )
        # coarse-correction add fused into the post-smooth kernel: XLA
        # pays only the lane repeat at HALF height; the sublane repeat +
        # masked add happen in VMEM (was: a full-raster prolong + mask
        # multiply + add pass, the largest non-smoother level-0 term)
        corr_half = corr_half_for_kernel(e_c, h, w, dtype=up.dtype)
        out = fused_jacobi_corr_tpu_padded(
            up, bp, invmp, corr_half, h, w, sweeps=len(post), omega=post,
            emit_residual=emit_top_residual,
        )
        if emit_top_residual:
            up, rp = out
            return slice_from_kernel(up, h, w), slice_from_kernel(rp, h, w)
        return slice_from_kernel(out, h, w)
    u, r = _smooth_residual(u, b, um, deg, pre, u_is_zero=u_is_zero)
    um_c, _ = levels_j[lvl + 1]
    r_c = _restrict(r) * um_c.astype(r.dtype)
    e_c = _v_cycle(levels_j, r_c, jnp.zeros_like(r_c), lvl + 1, coarse_inv, padded_md,
                   u_is_zero=True)
    u = u + _prolong(e_c, u.shape) * um.astype(u.dtype)
    # reversed weights = the transpose smoother (see _smoother_omegas)
    if emit_top_residual:
        return _smooth_residual(u, b, um, deg, post)
    u = _smooth(u, b, um, deg, post)
    return u


def _pcg_core(
    b, x0, tol, levels_j, max_iterations, precond_dtype=jnp.float32,
    coarse_inv=None, prebuilt=None,
):
    """Traceable MG-PCG body — callable from inside other jitted programs
    (the fused refinement solve in models/fill.py); :data:`_pcg_run` is the
    jitted entry point.

    MG-preconditioned CG over (..., H, W) batches. ``levels_j`` is a
    pytree of (umask, deg) per level, passed as traced arguments so the
    compilation caches on *shapes* — new cloud masks reuse the executable.
    ``coarse_inv`` (optional) is the dense coarsest-operator inverse from
    :func:`_dense_coarse_inverse`; accepting a bare levels tuple without it
    keeps older callers (parallel/mg, benchmarks) working unchanged."""
    if isinstance(levels_j, Hierarchy):
        levels_j, coarse_inv = levels_j.levels, levels_j.coarse_inv
    um0, deg0 = levels_j[0]
    # the V-cycle is only a preconditioner and could in principle run at
    # reduced precision (half the HBM traffic) — but A/B measurement
    # (benchmarks/ab_precond.py) shows bf16 rounding wrecks the cycle's
    # contraction: 89 vs 23 PCG iterations at 2048^2, 29 vs 17 at 10980^2,
    # and bf16 loses on wall clock at both sizes. Default is f32.
    if prebuilt is not None:
        # caller hoisted the dtype-cast levels + padded mask/deg operands
        # OUTSIDE its own loop (the refinement while_loop runs _pcg_core
        # once per pass — rebuilding the pads per pass cost ~2.5 ms/band
        # of pure copy traffic at full tile)
        levels_16, padded_md = prebuilt
    else:
        levels_16 = tuple((m_, d_.astype(precond_dtype)) for m_, d_ in levels_j)
        # mask/deg pads for the padded-resident Pallas levels, built once
        # per solve — the while_loop body below reuses them every iteration
        padded_md = _padded_md_for_levels(levels_16)

    # A·z-from-the-kernel recurrence: only when the V-cycle runs in f32 —
    # a bf16 preconditioner (grids <= 4096) would hand back a bf16-grade
    # az, and the residual recurrence r -= alpha*ap would inherit ~1e-2
    # relative error; those grids keep the exact standalone A-apply.
    use_az = precond_dtype == jnp.float32

    def precond(r):
        """(z, az): the V-cycle preconditioner output AND its A-image,
        az = A z on unknowns, recovered from the top post-smooth kernel's
        in-window residual (az = r - (r - A z)*m; r is masked upstream).
        The PCG body then forms A p by the recurrence
        ap = az + beta * ap_prev — dropping its standalone A-apply pass
        (8.6 ms of a 42.7 ms full-tile iteration, an XLA lane-shift
        stencil at ~22% of the HBM roofline). The recurrence drift is the
        classic recursive-residual one: harmless here because (a) the
        inner solve only runs to INNER_TOL_FLOOR-grade tolerances over a
        handful of iterations, and (b) the outer double-float refinement
        re-measures the TRUE residual each pass."""
        if not use_az:
            z16 = _v_cycle(
                levels_16,
                r.astype(precond_dtype),
                jnp.zeros(r.shape, precond_dtype),
                0,
                coarse_inv,
                padded_md,
                u_is_zero=True,
            )
            return z16.astype(r.dtype), None
        z16, res16 = _v_cycle(
            levels_16,
            r.astype(precond_dtype),
            jnp.zeros(r.shape, precond_dtype),
            0,
            coarse_inv,
            padded_md,
            u_is_zero=True,
            emit_top_residual=True,
        )
        z = z16.astype(r.dtype)
        az = r - res16.astype(r.dtype)
        return z, az

    def dots(a, b):
        return jnp.sum(a * b, axis=(-2, -1))

    def run(b, x0, tol):
        umf = um0.astype(b.dtype)
        b = b * umf
        x = x0 * umf
        r = (b - masked_laplacian(x, um0, deg0)) * umf
        z, az = precond(r)
        p = z
        ap = az if use_az else masked_laplacian(p, um0, deg0)
        rz = dots(r, z)
        bs = dots(b, b)
        threshold = jnp.maximum(tol * tol * bs, jnp.finfo(b.dtype).tiny)

        def cond(state):
            _, r, _, _, _, _, it = state
            rr = dots(r, r)
            return jnp.logical_and(jnp.any(rr > threshold), it < max_iterations)

        def body(state):
            x, r, p, ap, z, rz, it = state
            pap = dots(p, ap)
            alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
            a = alpha[..., None, None]
            x = x + a * p
            r_new = r - a * ap
            z_new, az_new = precond(r_new)
            rz_new = dots(r_new, z_new)
            if coarse_inv is not None:
                # the V-cycle with the EXACT dense coarse solve is a fixed
                # LINEAR operator (weighted-Jacobi sweeps, block transfers,
                # one dense matvec), so classic Fletcher–Reeves beta is
                # valid — one full-raster dot fewer per iteration
                beta_num = rz_new
            else:
                # flexible (Polak–Ribière) beta: robust to the nonlinear
                # coarse-level CG fallback (oversized coarse grids)
                beta_num = rz_new - dots(r, z_new)
            beta = jnp.where(rz > 0, beta_num / jnp.where(rz > 0, rz, 1.0), 0.0)
            bcast = beta[..., None, None]
            p = z_new + bcast * p
            if use_az:
                ap = az_new + bcast * ap  # A p by linearity: A(z + beta p)
            else:
                ap = masked_laplacian(p, um0, deg0)
            return x, r_new, p, ap, z_new, rz_new, it + 1

        x, r, p, ap, z, rz, it = lax.while_loop(
            cond, body, (x, r, p, ap, z, rz, jnp.int32(0))
        )
        return x, it, dots(r, r) / jnp.maximum(bs, jnp.finfo(b.dtype).tiny)

    return run(b, x0, tol)


_pcg_run = functools.partial(
    jax.jit, static_argnames=("max_iterations", "precond_dtype")
)(_pcg_core)


# repeated solves on the same mask (multi-date fills, refinement passes,
# benchmarks) reuse the uploaded hierarchy — re-uploading ~20MB of level
# masks per call is real money on tunneled-TPU hosts. Both caches are LRU
# (OrderedDict, least-recent evicted one at a time): the previous
# clear-everything-at-cap eviction thrashed alternating-mask workloads
# (multi-date fills swap between 2-3 masks; a wholesale clear re-uploaded
# all of them every cycle — tests/test_solvers.py::test_cache_lru_no_churn).
from collections import OrderedDict

_HIERARCHY_CACHE: OrderedDict = OrderedDict()
_CONST_CACHE: OrderedDict = OrderedDict()
_HIERARCHY_CACHE_CAP = 8
_CONST_CACHE_CAP = 16


def _lru_get(cache: OrderedDict, key):
    val = cache.get(key)
    if val is not None:
        cache.move_to_end(key)
    return val


def _lru_put(cache: OrderedDict, key, val, cap: int):
    cache[key] = val
    cache.move_to_end(key)
    while len(cache) > cap:
        cache.popitem(last=False)


def device_constant(arr) -> jnp.ndarray:
    """Upload a host array once and reuse the device copy on repeated
    calls with equal content. A full-tile f32 ``deg`` raster is 480 MB of
    H2D per solve on a tunneled host if re-uploaded; even at 2048^2 the
    16 MB re-upload dominated the per-solve overhead (measured: the
    13-band bench solve was ~0.8 s of fixed cost around ~45 ms of PCG
    iterations). Device arrays pass through untouched."""
    if not isinstance(arr, np.ndarray):
        return jnp.asarray(arr)
    key = (arr.shape, str(arr.dtype), hash(arr.tobytes()))
    cached = _lru_get(_CONST_CACHE, key)
    if cached is not None:
        return cached
    if arr.dtype == np.bool_:
        # bool rasters cross the link bit-packed (8x fewer H2D bytes)
        from ..ops.masks import push_mask

        val = push_mask(arr)
    else:
        val = jnp.asarray(arr)
    _lru_put(_CONST_CACHE, key, val, _CONST_CACHE_CAP)
    return val


def _device_hierarchy(umask, deg) -> Hierarchy:
    """:class:`Hierarchy` — (umask, deg) per level as device arrays plus
    the dense coarsest-operator inverse. Coarse levels are computed on
    device (no per-level uploads); the cache key is a host hash for numpy
    masks or a device fingerprint (one scalar fetch) for device masks."""
    if isinstance(umask, np.ndarray):
        key = (umask.shape, hash(umask.tobytes()))
        umask_j = None
    else:
        umask_j = umask
        h1, h2 = jax.device_get(_mask_checksum_device(umask_j))
        key = (umask_j.shape, int(h1), int(h2))
    deg_j = device_constant(deg).astype(jnp.float32)
    cached = _lru_get(_HIERARCHY_CACHE, key)
    if cached is not None:
        # coarse levels depend on the mask alone; level 0 carries the
        # caller's deg — and when level 0 IS the coarsest level (single-
        # level hierarchies), the dense inverse depends on that deg too
        levels = ((cached.levels[0][0], deg_j),) + cached.levels[1:]
        coarse_inv = cached.coarse_inv
        if len(levels) == 1 and coarse_inv is not None:
            coarse_inv = _dense_coarse_inverse(levels[0][0], deg_j)
        return Hierarchy(levels, coarse_inv)
    if umask_j is None:
        umask_j = jnp.asarray(umask, bool)
    levels_j = ((umask_j, deg_j),) + tuple(_build_levels_device(umask_j))
    m_c, d_c = levels_j[-1]
    coarse_inv = (
        _dense_coarse_inverse(m_c, d_c) if m_c.size <= _DENSE_COARSE_MAX else None
    )
    hier = Hierarchy(levels_j, coarse_inv)
    _lru_put(_HIERARCHY_CACHE, key, hier, _HIERARCHY_CACHE_CAP)
    return hier


def solve(
    b: np.ndarray,
    umask: np.ndarray,
    deg: np.ndarray | None = None,
    x0: np.ndarray | None = None,
    tolerance: float = 1e-6,
    refinement_steps: int = 2,
    max_iterations: int = 200,
    device_output: bool = False,
) -> CGResult:
    """MG-preconditioned CG solve + f64 refinement. Same contract as
    models.cg.solve_masked_poisson.

    Precision ceiling: the solution is carried as a DOUBLE-FLOAT f32 pair
    (~2^-48 ≈ 3.6e-15 effective relative precision — see
    fill._fused_refine_solve), not true f64. Tolerances below ~1e-14
    relative cannot converge; the reported ``error`` stays faithful, and a
    warning flags the unreachable request up front."""
    if tolerance < 1e-13:
        import warnings

        warnings.warn(
            f"tolerance={tolerance:g} is below the double-float solver's "
            "~1e-14 relative precision floor; convergence will stall there "
            "(the returned error field reports the achieved residual)",
            stacklevel=2,
        )
    b64_j = jnp.asarray(b, dtype=jnp.float64)
    squeeze = b64_j.ndim == 2
    if squeeze:
        b64_j = b64_j[None]
    if isinstance(umask, np.ndarray):
        umask = np.asarray(umask, bool)
    if deg is None:
        # computed on device: no 4-byte-per-pixel H2D for the default case
        h, w = umask.shape
        deg = jax.jit(_neighbor_degree_traced, static_argnums=(0, 1))(h, w)
    # note: the hierarchy rediscretizes with full in-image degrees; a custom
    # fine-level deg only affects the fine operator
    hier = _device_hierarchy(umask, deg)

    pdtype = _precond_dtype_for(umask.shape)

    umask_j = hier.levels[0][0]
    deg_j = device_constant(deg)
    umf = umask_j.astype(jnp.float64)
    x064 = (
        jnp.zeros(b64_j.shape, jnp.float64)
        if x0 is None
        else jnp.asarray(x0, dtype=jnp.float64).reshape(b64_j.shape) * umf
    )

    # one fused program: the f64 refinement loop (with its adaptive inner
    # tolerance, floored at INNER_TOL_FLOOR — driving f32 PCG far below
    # ~1e-4 against a finite-precision preconditioner grinds iterations
    # near its noise floor) and the inner PCG while_loop compile together;
    # only the final norms cross back to the host
    from .fill import _fused_refine_solve, _recombine64

    x_hi, x_lo, iters_j, rnorm_j, bnorm_j = _fused_refine_solve(
        b64_j, x064, umask_j, deg_j, hier, jnp.float64(tolerance),
        max_iterations=max_iterations,
        refinement_steps=max(refinement_steps, 1),
        precond_dtype=pdtype, use_multigrid=True, mode="rhs",
    )
    # f64 surface kept for callers; the recombine is the only emulated-f64
    # pass (the solve itself runs double-float f32 — see _fused_refine_solve)
    x64_j = _recombine64(x_hi, x_lo)
    # ONE batched fetch: separate np.asarray calls each pay a link RTT
    iters_v, rnorm, bnorm = jax.device_get((iters_j, rnorm_j, bnorm_j))
    total_iters = int(iters_v)

    rel = float(np.max(rnorm / np.maximum(bnorm, 1e-300)))
    if device_output:
        # skip the D2H fetch (slow on tunneled-TPU setups); caller gets a
        # device array
        x = x64_j[0] if squeeze else x64_j
        return CGResult(x, total_iters, rel)
    x64 = np.asarray(x64_j)
    x = x64[0] if squeeze else x64
    return CGResult(x, total_iters, rel)
