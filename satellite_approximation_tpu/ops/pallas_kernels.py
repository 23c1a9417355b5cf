"""Pallas TPU kernels for the solver hot loops.

``fused_jacobi_tpu``: K damped-Jacobi sweeps of the masked 5-point system in
one kernel. XLA executes each sweep as a separate HBM round trip (~3 arrays
of traffic per sweep); this kernel streams (row-strip x column-tile) windows
with a halo rim through VMEM, runs all K sweeps on-chip — the halo keeps the
window interior exact, since stencil information travels one cell per
sweep — and DMAs only the interior back. ~K-fold less HBM traffic on the
smoother, which dominates every multigrid V-cycle.

Implementation notes for this environment:
* windows are (strip+2*HALO_R) x (ctile+2*HALO_C) with HALO_C=128 (one
  full lane tile) so every DMA slice START — including the padded-IO
  variant's interior-offset output writes — is 128-aligned in the lane
  dimension (Mosaic requirement; 64 satisfied the plain mode's reads but
  not the padded writes at offset HALO_C + j*ctile); (strip, ctile) are
  chosen PER SHAPE by :func:`kernel_tiles` to minimize streamed window
  area — fixed tiles either waste VMEM-window halo on small images or
  pad small widths up to the tile (a fixed ctile=4096 doubles the
  traffic of a 2048-wide level); column tiling keeps VMEM bounded for
  arbitrarily wide images;
* the kernel is GRID-FREE — one program loops (channel, strip, coltile)
  with explicit HBM<->VMEM DMAs. The axon remote-compile toolchain on this
  host fails to legalize any gridded pallas_call (even trivial ones);
* neighbour sums use pltpu.roll (circular): wrap-around garbage enters only
  at the window rim and travels one cell per sweep — the halo discard zone
  absorbs it;
* all kernel-side indices are explicitly i32 (jax x64 mode would otherwise
  materialize i64 scalars, which several tpu.* MLIR ops reject).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO_R = 8  # row halo: sweeps+residual ring must fit (sublane-tile multiple)
HALO_C = 128  # column halo = one lane tile: every DMA start stays aligned
_STRIP_MAX = 240  # interior rows per strip, multiple of 8
_CTILE_MAX = 4096  # interior columns per tile, multiple of 128
# v5e cores carry 128 MB of VMEM; the toolchain's 16 MB scoped default was
# what forced the old 112x2048 windows. 64 MB comfortably fits the
# largest 256x4352 windows (~36 MB peak) while leaving headroom for Mosaic.
_VMEM_LIMIT = 64 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def kernel_tiles(h: int, w: int) -> tuple[int, int]:
    """(strip, ctile) for a logical (h, w) image: the interior tile sizes
    minimizing total streamed window area ceil(n/t) * (t + 2*halo) — i.e.
    the exact halo-amplification + trailing-pad tradeoff — subject to the
    hardware alignment steps (8 sublanes / 128 lanes) and the VMEM caps.
    Ties break to the LARGER tile (fewer DMA round trips)."""

    def pick(n: int, step: int, halo: int, cap: int) -> int:
        best_cost, best_t = None, step
        for t in range(step, cap + 1, step):
            cost = -(-n // t) * (t + 2 * halo)
            if best_cost is None or cost <= best_cost:
                best_cost, best_t = cost, t
        return best_t

    return pick(h, 8, HALO_R, _STRIP_MAX), pick(w, 128, HALO_C, _CTILE_MAX)


def _kernel_factory(
    sweeps: int,
    omega,
    strip: int,
    ctile: int,
    n_strips: int,
    n_ctiles: int,
    channels: int,
    emit_residual: bool = False,
    out_off_r: int = 0,
    out_off_c: int = 0,
    zero_start: bool = False,
):
    winr = strip + 2 * HALO_R
    winc = ctile + 2 * HALO_C
    # scalar omega = classic damped Jacobi; a tuple gives each sweep its
    # own weight (Chebyshev polynomial smoothing, models/multigrid)
    omegas = omega if isinstance(omega, tuple) else (float(omega),) * sweeps
    assert len(omegas) == sweeps

    # zero_start: the smoother starts from u == 0 (ALWAYS the case for a
    # V-cycle pre-smoother — every level's incoming iterate is zeros). The
    # kernel then takes no u operand at all: the u DMA disappears (one full
    # array of HBM read traffic) and the first sweep collapses to
    # u = omega0 * b / deg on unknowns — bit-identical to running the full
    # sweep against zeros (A·0 = 0), one sweep's rolls cheaper on the VPU.
    def kernel(*refs):
        if zero_start:
            b_hbm, m_hbm, d_hbm, *outs_and_scratch = refs
            u_hbm = None
        else:
            u_hbm, b_hbm, m_hbm, d_hbm, *outs_and_scratch = refs
        if emit_residual:
            if zero_start:
                out_hbm, res_hbm, sb, sm, sd, so, sr, sems = outs_and_scratch
                su = None
            else:
                out_hbm, res_hbm, su, sb, sm, sd, so, sr, sems = outs_and_scratch
        else:
            if zero_start:
                out_hbm, sb, sm, sd, so, sems = outs_and_scratch
                su = None
            else:
                out_hbm, su, sb, sm, sd, so, sems = outs_and_scratch
            res_hbm = sr = None
        one = jnp.int32(1)

        def tile_body(ci, i, j, carry):
            r0 = i * jnp.int32(strip)
            c0 = j * jnp.int32(ctile)

            idx = [jnp.int32(t) for t in range(6)]
            copies = [
                pltpu.make_async_copy(
                    b_hbm.at[ci, pl.ds(r0, winr), pl.ds(c0, winc)], sb, sems.at[idx[1]]
                ),
                pltpu.make_async_copy(
                    m_hbm.at[pl.ds(r0, winr), pl.ds(c0, winc)], sm, sems.at[idx[2]]
                ),
                pltpu.make_async_copy(
                    d_hbm.at[pl.ds(r0, winr), pl.ds(c0, winc)], sd, sems.at[idx[3]]
                ),
            ]
            if not zero_start:
                copies.append(
                    pltpu.make_async_copy(
                        u_hbm.at[ci, pl.ds(r0, winr), pl.ds(c0, winc)],
                        su,
                        sems.at[idx[0]],
                    )
                )
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            # compute in f32 regardless of the storage dtype: tpu.dynamic_rotate
            # only supports 32-bit data, and bf16 inputs only need the DMA
            # traffic halved, not the arithmetic
            m = sm[:, :].astype(jnp.float32)
            deg = sd[:, :].astype(jnp.float32)
            b = sb[:, :].astype(jnp.float32)
            inv0 = jnp.where(deg > 0, 1.0 / deg, 0.0)
            unknown = m > 0

            # masking is SELECT-based, not multiply-based: where(m>0, u, 0)
            # equals u*m bit-for-bit at mask 1/0 values, but a select also
            # annihilates non-finite garbage (NaN*0 = NaN would not) — this
            # is what lets the padded-IO variant leave its output rims
            # uninitialized and still chain safely (rim bytes can be any
            # bit pattern; every read path runs through a select)
            def neighbor_sum(u):
                um = jnp.where(unknown, u, 0.0)
                return (
                    pltpu.roll(um, one, 0)
                    + pltpu.roll(um, jnp.int32(winr - 1), 0)
                    + pltpu.roll(um, one, 1)
                    + pltpu.roll(um, jnp.int32(winc - 1), 1)
                )

            # unrolled so each sweep can carry its own weight (Chebyshev
            # smoothing); sweeps <= HALO_R keeps this a handful of steps
            if zero_start:
                # first sweep against u == 0: A·0 = 0, so the update is
                # just omega0 * b / deg on unknowns — bit-identical to the
                # general sweep at u = 0 (see fused_jacobi_zero docstring)
                u = jnp.where(unknown, omegas[0] * b * inv0, 0.0)
                rest = omegas[1:]
            else:
                u = su[:, :].astype(jnp.float32)
                rest = omegas
            for om in rest:
                au = deg * u - neighbor_sum(u)
                u = jnp.where(unknown, u + om * (b - au) * inv0, u)
            so[:, :] = u[HALO_R : HALO_R + strip, HALO_C : HALO_C + ctile].astype(
                so.dtype
            )
            oro = jnp.int32(out_off_r)
            oco = jnp.int32(out_off_c)
            out_cp = pltpu.make_async_copy(
                so,
                out_hbm.at[ci, pl.ds(oro + r0, strip), pl.ds(oco + c0, ctile)],
                sems.at[idx[4]],
            )
            out_cp.start()
            if emit_residual:
                # the post-smooth residual r = (b - A u) * m in the same
                # window — interior needs one more exact ring, so
                # sweeps + 1 <= HALO_R (asserted by the caller)
                au = deg * u - neighbor_sum(u)
                res = jnp.where(unknown, b - au, 0.0)
                sr[:, :] = res[
                    HALO_R : HALO_R + strip, HALO_C : HALO_C + ctile
                ].astype(sr.dtype)
                res_cp = pltpu.make_async_copy(
                    sr,
                    res_hbm.at[ci, pl.ds(oro + r0, strip), pl.ds(oco + c0, ctile)],
                    sems.at[idx[5]],
                )
                res_cp.start()
                res_cp.wait()
            out_cp.wait()
            return carry

        def strip_loop(ci, i, carry):
            return lax.fori_loop(
                jnp.int32(0), jnp.int32(n_ctiles), lambda j, c: tile_body(ci, i, j, c), carry
            )

        def channel_loop(ci, carry):
            return lax.fori_loop(
                jnp.int32(0), jnp.int32(n_strips), lambda i, c: strip_loop(ci, i, c), carry
            )

        lax.fori_loop(jnp.int32(0), jnp.int32(channels), channel_loop, jnp.int32(0))

    return kernel


@functools.partial(jax.jit, static_argnames=("sweeps", "omega", "emit_residual"))
def fused_jacobi_tpu(
    u, b, umask, deg, sweeps: int = 8, omega=0.8, emit_residual: bool = False
):
    """K fused Jacobi sweeps (K <= HALO_R); u/b (C, H, W) f32, umask/deg (H, W).

    Equivalent to K applications of the XLA sweep (multigrid._smooth) —
    validated in tests/test_pallas.py. ``omega`` is either a scalar weight
    (damped Jacobi) or a K-tuple of per-sweep weights (Chebyshev
    smoothing). With ``emit_residual`` (requires K + 1 <= HALO_R for the
    extra exact ring) also returns r = (b - A u) * m computed in the same
    VMEM window — the V-cycle's post-smooth residual without another
    full-grid A-apply pass.
    """
    assert sweeps + (1 if emit_residual else 0) <= HALO_R, (
        f"sweeps={sweeps} (+residual ring: {emit_residual}) exceeds halo {HALO_R}"
    )
    if isinstance(omega, tuple):
        assert len(omega) == sweeps
    c, h, w = u.shape
    strip, ctile = kernel_tiles(h, w)
    winr = strip + 2 * HALO_R
    winc = ctile + 2 * HALO_C
    hp = -(-h // strip) * strip
    wp = -(-w // ctile) * ctile

    def pad_img(x, value=0.0):
        return jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 2)
            + [(HALO_R, hp - h + HALO_R), (HALO_C, wp - w + HALO_C)],
            constant_values=value,
        )

    dtype = u.dtype  # f32 or bf16 (the multigrid preconditioner runs bf16)
    up = pad_img(u)
    bp = pad_img(b.astype(dtype))
    mp = pad_img(umask.astype(dtype))
    dp = pad_img(deg.astype(dtype), value=1.0)

    n_strips = hp // strip
    n_ctiles = wp // ctile
    out_shape = jax.ShapeDtypeStruct((c, hp, wp), dtype)
    scratch = [
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((strip, ctile), dtype),
    ]
    if emit_residual:
        scratch.append(pltpu.VMEM((strip, ctile), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((6,)))
    out = pl.pallas_call(
        _kernel_factory(
            sweeps,
            omega if isinstance(omega, tuple) else float(omega),
            strip, ctile, n_strips, n_ctiles, c, emit_residual,
        ),
        out_shape=(out_shape, out_shape) if emit_residual else out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            (pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY))
            if emit_residual
            else pl.BlockSpec(memory_space=pl.ANY)
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(up, bp, mp, dp)
    if emit_residual:
        return out[0][:, :h, :w], out[1][:, :h, :w]
    return out[:, :h, :w]


def pad_for_kernel(x, h: int, w: int, value: float = 0.0):
    """Pad a logical (…, h, w) array into the kernel's padded layout:
    HALO_R/HALO_C front rims, trailing pads to the shape's
    :func:`kernel_tiles` strip/ctile multiples."""
    strip, ctile = kernel_tiles(h, w)
    hp = -(-h // strip) * strip
    wp = -(-w // ctile) * ctile
    return jnp.pad(
        x,
        [(0, 0)] * (x.ndim - 2)
        + [(HALO_R, hp - h + HALO_R), (HALO_C, wp - w + HALO_C)],
        constant_values=value,
    )


def slice_from_kernel(x, h: int, w: int):
    """Interior view of a padded-layout array (inverse of pad_for_kernel)."""
    return x[..., HALO_R : HALO_R + h, HALO_C : HALO_C + w]


@functools.partial(
    jax.jit, static_argnames=("h", "w", "sweeps", "omega", "emit_residual")
)
def fused_jacobi_tpu_padded(
    up,
    bp,
    umaskp,
    degp,
    h: int,
    w: int,
    sweeps: int = 8,
    omega=0.8,
    emit_residual: bool = False,
):
    """Padded-IO variant of :func:`fused_jacobi_tpu`: every operand is
    already in the kernel's padded layout (:func:`pad_for_kernel`) and the
    smoothed output comes back in the SAME layout.

    Why this exists: the convenience wrapper pads u/b/mask/deg and slices
    the output on EVERY call — four materialized pad copies plus a slice,
    ~5 GB of pure HBM copy traffic per call at full-tile scale, ~40% of
    the call's wall time (benchmarks/x_lane_align.py). A V-cycle level
    that keeps its state padded pays the pads once per solve instead.

    Contract (exactness-preserving, verified in tests/test_pallas.py):
    * interiors of the outputs equal the convenience wrapper's outputs
      bit-for-bit (identical windows, identical arithmetic);
    * BOTH outputs' rim/pad cells are UNINITIALIZED garbage (the kernel
      writes interior tiles only; in-place aliasing is impossible because
      adjacent strips' windows overlap by the halo). That is safe to
      chain: the kernel reads every input through mask SELECTS (never
      mask multiplies), so even NaN rim bytes cannot reach interior
      results — but any non-kernel consumer must slice the interior
      (:func:`slice_from_kernel`) first.
    """
    assert sweeps + (1 if emit_residual else 0) <= HALO_R
    if isinstance(omega, tuple):
        assert len(omega) == sweeps
    strip, ctile = kernel_tiles(h, w)
    winr = strip + 2 * HALO_R
    winc = ctile + 2 * HALO_C
    c, hpad, wpad = up.shape
    hp = hpad - 2 * HALO_R
    wp = wpad - 2 * HALO_C
    assert hp == -(-h // strip) * strip and wp == -(-w // ctile) * ctile, (
        "padded operands do not match pad_for_kernel's layout for (h, w)",
        (hpad, wpad), (h, w), (strip, ctile),
    )
    dtype = up.dtype
    out_shape = jax.ShapeDtypeStruct((c, hpad, wpad), dtype)
    scratch = [
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((strip, ctile), dtype),
    ]
    if emit_residual:
        scratch.append(pltpu.VMEM((strip, ctile), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((6,)))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        _kernel_factory(
            sweeps,
            omega if isinstance(omega, tuple) else float(omega),
            strip,
            ctile,
            hp // strip,
            wp // ctile,
            c,
            emit_residual,
            out_off_r=HALO_R,
            out_off_c=HALO_C,
        ),
        out_shape=(out_shape, out_shape) if emit_residual else out_shape,
        in_specs=[any_spec] * 4,
        out_specs=(any_spec, any_spec) if emit_residual else any_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(up, bp.astype(dtype), umaskp.astype(dtype), degp.astype(dtype))


def _zero_call(
    b, umask, deg, h, w, sweeps, omega, emit_residual, padded_io
):
    """Shared pallas_call plumbing for the zero-start kernels."""
    assert (sweeps - 1) + (1 if emit_residual else 0) <= HALO_R
    if isinstance(omega, tuple):
        assert len(omega) == sweeps
    strip, ctile = kernel_tiles(h, w)
    winr = strip + 2 * HALO_R
    winc = ctile + 2 * HALO_C
    c = b.shape[0]
    if padded_io:
        hpad, wpad = b.shape[-2], b.shape[-1]
        hp = hpad - 2 * HALO_R
        wp = wpad - 2 * HALO_C
        assert hp == -(-h // strip) * strip and wp == -(-w // ctile) * ctile
        bp, mp, dp = b, umask, deg
    else:
        hp = -(-h // strip) * strip
        wp = -(-w // ctile) * ctile
        hpad, wpad = hp + 2 * HALO_R, wp + 2 * HALO_C
        bp = pad_for_kernel(b, h, w)
        mp = pad_for_kernel(umask, h, w)
        dp = pad_for_kernel(deg, h, w, value=1.0)
    dtype = b.dtype
    out_shape = jax.ShapeDtypeStruct((c, hpad, wpad), dtype)
    scratch = [
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((winr, winc), dtype),
        pltpu.VMEM((strip, ctile), dtype),
    ]
    if emit_residual:
        scratch.append(pltpu.VMEM((strip, ctile), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((6,)))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out = pl.pallas_call(
        _kernel_factory(
            sweeps,
            omega if isinstance(omega, tuple) else float(omega),
            strip,
            ctile,
            hp // strip,
            wp // ctile,
            c,
            emit_residual,
            out_off_r=HALO_R,
            out_off_c=HALO_C,
            zero_start=True,
        ),
        out_shape=(out_shape, out_shape) if emit_residual else out_shape,
        in_specs=[any_spec] * 3,
        out_specs=(any_spec, any_spec) if emit_residual else any_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(bp, mp.astype(dtype), dp.astype(dtype))
    if padded_io:
        return out
    if emit_residual:
        return (
            slice_from_kernel(out[0], h, w),
            slice_from_kernel(out[1], h, w),
        )
    return slice_from_kernel(out, h, w)


@functools.partial(jax.jit, static_argnames=("sweeps", "omega", "emit_residual"))
def fused_jacobi_zero_tpu(b, umask, deg, sweeps: int = 8, omega=0.8,
                          emit_residual: bool = False):
    """K fused Jacobi sweeps starting from u == 0 — the V-cycle pre-smooth
    case (every level's incoming iterate is zeros, multigrid._v_cycle).

    Bit-identical to ``fused_jacobi_tpu(zeros, b, ...)`` (A·0 = 0 makes the
    first sweep omega0 * b / deg exactly), but the u operand disappears:
    no zeros array materialized in HBM, no u window DMA, and the first
    sweep costs no rolls. The exactness ring budget also relaxes by one —
    sweep 1 is purely local, so (sweeps - 1) + residual ring <= HALO_R.
    """
    c, h, w = b.shape
    return _zero_call(b, umask, deg, h, w, sweeps, omega, emit_residual, False)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "sweeps", "omega", "emit_residual")
)
def fused_jacobi_zero_tpu_padded(
    bp, umaskp, degp, h: int, w: int, sweeps: int = 8, omega=0.8,
    emit_residual: bool = False,
):
    """Padded-IO zero-start variant: operands already in pad_for_kernel
    layout, outputs come back in the same layout (interiors exact, rims
    uninitialized — same contract as fused_jacobi_tpu_padded)."""
    return _zero_call(bp, umaskp, degp, h, w, sweeps, omega, emit_residual, True)


def pallas_available() -> bool:
    """True when the default backend can lower Pallas TPU kernels."""
    return jax.default_backend() == "tpu"
