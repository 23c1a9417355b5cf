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
# what forced the old 112x2048 windows. 96 MB fits the largest variant —
# the corr post-smooth WITH the residual ring (3 double-buffered 256x4352
# windows + the half-height corr operand + 2 interior out tiles, ~66 MB)
# — while leaving headroom for Mosaic's own stack.
_VMEM_LIMIT = 96 * 1024 * 1024


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

    # strip step is 16 (not the hardware-minimum 8) so the fuse_corr
    # variant's HALF-height window slices stay 8-sublane-aligned in both
    # start (r0/2 = k*strip/2) and size (strip/2 + HALO_R)
    return pick(h, 16, HALO_R, _STRIP_MAX), pick(w, 128, HALO_C, _CTILE_MAX)


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
    fuse_corr: bool = False,
):
    """Round-4 kernel: merged mask+degree operand and double-buffered DMA.

    * The mask and degree windows collapse into ONE ``invm`` operand
      (invm = 1/deg on unknowns, 0 elsewhere): unknown = invm > 0,
      inv = invm, and deg reconstructs in-window as 1/invm — EXACT for the
      stencil's degree values {1,2,3,4} (1/(1/d) roundtrips bit-perfectly;
      verified for all four). Input DMA drops from 4 windows to 3 (2 for
      zero-start).
    * Tiles stream through a 2-deep pipeline: tile t+1's input DMAs run
      while tile t computes, and output DMAs drain asynchronously (waited
      two tiles later, before their buffer is reused). The previous serial
      kernel waited every DMA inline — at full tile the window DMAs were
      ~35% of smoother wall time.
    * ``fuse_corr`` (post-smooth): the V-cycle's coarse-correction add
      ``u += prolong(e) * mask`` folds into the kernel. The operand is the
      HALF-HEIGHT, lane-expanded correction (XLA does the cheap lane
      repeat; see :func:`corr_half_for_kernel`); the kernel does the
      sublane repeat in VMEM and the masked add before sweep 1 — removing
      the full-raster prolong+mask+add XLA pass per V-cycle level (the
      largest remaining non-smoother term at full tile, ~6.6 ms/level-0
      apply). Requires r0 even (strip is a multiple of 8) so window rows
      pair-align with the half-height operand.
    """
    winr = strip + 2 * HALO_R
    winc = ctile + 2 * HALO_C
    # scalar omega = classic damped Jacobi; a tuple gives each sweep its
    # own weight (Chebyshev polynomial smoothing, models/multigrid)
    omegas = omega if isinstance(omega, tuple) else (float(omega),) * sweeps
    assert len(omegas) == sweeps
    per_chan = n_strips * n_ctiles
    n_tiles = channels * per_chan
    # emit_residual="half": the residual comes out with its ROW PAIRS
    # already summed (res[2i] + res[2i+1]) — the expensive half of the
    # V-cycle's 2x2 block restrict — into a HALF-HEIGHT, rim-free output.
    # The residual write and its downstream read shrink 2x each, and the
    # XLA row pass (a sublane reduce_window over the full raster)
    # disappears; XLA keeps only the cheap lane-strided column pairing.
    half_restrict = emit_residual == "half"

    # zero_start: the smoother starts from u == 0 (ALWAYS the case for a
    # V-cycle pre-smoother — every level's incoming iterate is zeros). The
    # kernel then takes no u operand at all: the u DMA disappears (one full
    # array of HBM read traffic) and the first sweep collapses to
    # u = omega0 * b * invm on unknowns — bit-identical to running the full
    # sweep against zeros (A·0 = 0), one sweep's rolls cheaper on the VPU.
    assert not (fuse_corr and zero_start), "corr add needs a u operand"

    def kernel(*refs):
        corr_hbm = scorr = None
        if zero_start:
            b_hbm, im_hbm, *rest = refs
            u_hbm = None
        elif fuse_corr:
            u_hbm, b_hbm, im_hbm, corr_hbm, *rest = refs
        else:
            u_hbm, b_hbm, im_hbm, *rest = refs
        if emit_residual:
            out_hbm, res_hbm = rest[0], rest[1]
            scratch = rest[2:]
        else:
            out_hbm, res_hbm = rest[0], None
            scratch = rest[1:]
        if zero_start:
            su = None
            if emit_residual:
                sb, sim, so, sr, sems = scratch
            else:
                sb, sim, so, sems = scratch
                sr = None
        elif fuse_corr:
            if emit_residual:
                su, sb, sim, scorr, so, sr, sems = scratch
            else:
                su, sb, sim, scorr, so, sems = scratch
                sr = None
        else:
            if emit_residual:
                su, sb, sim, so, sr, sems = scratch
            else:
                su, sb, sim, so, sems = scratch
                sr = None
        one = jnp.int32(1)

        def coords(t):
            ci = t // jnp.int32(per_chan)
            rem = t % jnp.int32(per_chan)
            r0 = (rem // jnp.int32(n_ctiles)) * jnp.int32(strip)
            c0 = (rem % jnp.int32(n_ctiles)) * jnp.int32(ctile)
            return ci, r0, c0

        def in_copies(t, sel):
            ci, r0, c0 = coords(t)
            cps = [
                pltpu.make_async_copy(
                    b_hbm.at[ci, pl.ds(r0, winr), pl.ds(c0, winc)],
                    sb.at[sel],
                    sems.at[sel, jnp.int32(0)],
                ),
                pltpu.make_async_copy(
                    im_hbm.at[pl.ds(r0, winr), pl.ds(c0, winc)],
                    sim.at[sel],
                    sems.at[sel, jnp.int32(1)],
                ),
            ]
            if not zero_start:
                cps.append(
                    pltpu.make_async_copy(
                        u_hbm.at[ci, pl.ds(r0, winr), pl.ds(c0, winc)],
                        su.at[sel],
                        sems.at[sel, jnp.int32(2)],
                    )
                )
            if fuse_corr:
                # half-height slice at rh0 = row_tile * (strip/2): computed
                # from the tile index directly (NOT r0 // 2 — Mosaic's
                # divisibility analysis can prove i * (strip/2) is 8-aligned
                # because strip/2 % 8 == 0, but not a division's result).
                # Fine window row i pairs with half row i//2 exactly.
                rem = t % jnp.int32(per_chan)
                rh0 = (rem // jnp.int32(n_ctiles)) * jnp.int32(strip // 2)
                cps.append(
                    pltpu.make_async_copy(
                        corr_hbm.at[ci, pl.ds(rh0, winr // 2), pl.ds(c0, winc)],
                        scorr.at[sel],
                        sems.at[sel, jnp.int32(5)],
                    )
                )
            return cps

        def out_copy(t, sel):
            ci, r0, c0 = coords(t)
            return pltpu.make_async_copy(
                so.at[sel],
                out_hbm.at[
                    ci,
                    pl.ds(jnp.int32(out_off_r) + r0, strip),
                    pl.ds(jnp.int32(out_off_c) + c0, ctile),
                ],
                sems.at[sel, jnp.int32(3)],
            )

        def res_copy(t, sel):
            ci, r0, c0 = coords(t)
            if half_restrict:
                # rim-free half-height layout: row tile k lands at
                # k * (strip/2) (computed from the tile index, not r0/2 —
                # Mosaic's divisibility analysis needs the product form)
                rem = t % jnp.int32(per_chan)
                rh0 = (rem // jnp.int32(n_ctiles)) * jnp.int32(strip // 2)
                return pltpu.make_async_copy(
                    sr.at[sel],
                    res_hbm.at[ci, pl.ds(rh0, strip // 2), pl.ds(c0, ctile)],
                    sems.at[sel, jnp.int32(4)],
                )
            return pltpu.make_async_copy(
                sr.at[sel],
                res_hbm.at[
                    ci,
                    pl.ds(jnp.int32(out_off_r) + r0, strip),
                    pl.ds(jnp.int32(out_off_c) + c0, ctile),
                ],
                sems.at[sel, jnp.int32(4)],
            )

        # prologue: tile 0's inputs start before the loop
        for cp in in_copies(jnp.int32(0), jnp.int32(0)):
            cp.start()

        def body(t, carry):
            sel = lax.rem(t, jnp.int32(2))
            for cp in in_copies(t, sel):
                cp.wait()

            @pl.when(t + 1 < n_tiles)
            def _():
                for cp in in_copies(t + 1, jnp.int32(1) - sel):
                    cp.start()

            # the out buffers recycle every 2 tiles: drain tile t-2's copies
            # before overwriting their source VMEM
            @pl.when(t >= 2)
            def _():
                out_copy(t - 2, sel).wait()
                if emit_residual:
                    res_copy(t - 2, sel).wait()

            # compute in f32 regardless of the storage dtype: tpu.dynamic_rotate
            # only supports 32-bit data, and bf16 inputs only need the DMA
            # traffic halved, not the arithmetic
            invm = sim[sel].astype(jnp.float32)
            b = sb[sel].astype(jnp.float32)
            unknown = invm > 0
            inv0 = invm
            # degree reconstruction, ROUNDED to the nearest integer (1.0
            # where known/padded: the au value there is select-discarded, it
            # just must stay finite). In f32 the round is a no-op — 1/(1/d)
            # is bit-exact for d in {1,2,3,4} — but bf16 operands store
            # invm rounded (1/3 -> 0.333984), where the raw reciprocal
            # would perturb deg=3 cells to ~2.994; rounding restores the
            # exact stencil degree for every operand dtype.
            deg = jnp.where(
                unknown, jnp.round(1.0 / jnp.where(unknown, invm, 1.0)), 1.0
            )

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
                rest_om = omegas[1:]
            else:
                u = su[sel].astype(jnp.float32)
                if fuse_corr:
                    # coarse-correction add: sublane-repeat the half-height
                    # operand and add on unknowns. select (not multiply)
                    # so uninitialized rim bytes in the corr pads cannot
                    # poison the interior (same rationale as neighbor_sum)
                    rep = jnp.repeat(scorr[sel].astype(jnp.float32), 2, axis=0)
                    u = u + jnp.where(unknown, rep, 0.0)
                rest_om = omegas
            for om in rest_om:
                au = deg * u - neighbor_sum(u)
                u = jnp.where(unknown, u + om * (b - au) * inv0, u)
            so[sel] = u[HALO_R : HALO_R + strip, HALO_C : HALO_C + ctile].astype(
                so.dtype
            )
            out_copy(t, sel).start()
            if emit_residual:
                # the post-smooth residual r = (b - A u) * m in the same
                # window — interior needs one more exact ring, so
                # sweeps + 1 <= HALO_R (asserted by the caller)
                au = deg * u - neighbor_sum(u)
                res = jnp.where(unknown, b - au, 0.0)
                interior = res[HALO_R : HALO_R + strip, HALO_C : HALO_C + ctile]
                if half_restrict:
                    # restrict row pass in VMEM: res[2i] + res[2i+1] —
                    # bit-identical operand order to the XLA reduce_window
                    # pair sum (multigrid._restrict). Spelled as a
                    # sublane-split reshape + plain indexing: strided
                    # slices/gathers don't lower in-kernel
                    r3 = interior.reshape(strip // 2, 2, ctile)
                    sr[sel] = (r3[:, 0, :] + r3[:, 1, :]).astype(sr.dtype)
                else:
                    sr[sel] = interior.astype(sr.dtype)
                res_copy(t, sel).start()
            return carry

        lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), body, jnp.int32(0))
        # epilogue: the last one or two tiles' output copies are in flight
        for dt in (2, 1):
            if n_tiles >= dt:
                t_last = n_tiles - dt
                sel_last = jnp.int32(t_last % 2)
                out_copy(jnp.int32(t_last), sel_last).wait()
                if emit_residual:
                    res_copy(jnp.int32(t_last), sel_last).wait()

    return kernel


def invm_for_kernel(umask, deg):
    """The kernel's merged mask+degree operand: 1/deg on unknowns, 0 on
    knowns/padding. unknown = invm > 0; deg reconstructs exactly in-window
    (1/(1/d) is bit-exact for d in {1,2,3,4})."""
    degf = deg.astype(jnp.float32)
    inv0 = jnp.where(degf > 0, 1.0 / degf, 0.0)
    return jnp.where(umask.astype(jnp.float32) > 0, inv0, 0.0)


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
    imp = pad_img(invm_for_kernel(umask, deg).astype(dtype))

    n_strips = hp // strip
    n_ctiles = wp // ctile
    out_shape = jax.ShapeDtypeStruct((c, hp, wp), dtype)
    scratch = [
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, strip, ctile), dtype),
    ]
    if emit_residual:
        scratch.append(pltpu.VMEM((2, strip, ctile), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, 5)))
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
    )(up, bp, imp)
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
    invmp,
    h: int,
    w: int,
    sweeps: int = 8,
    omega=0.8,
    emit_residual: bool = False,
):
    """Padded-IO variant of :func:`fused_jacobi_tpu`: every operand is
    already in the kernel's padded layout (:func:`pad_for_kernel`; the
    mask+degree operand is the merged ``invmp`` from
    :func:`invm_for_kernel`) and the smoothed output comes back in the
    SAME layout.

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
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, strip, ctile), dtype),
    ]
    if emit_residual:
        scratch.append(pltpu.VMEM((2, strip, ctile), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, 5)))
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
        in_specs=[any_spec] * 3,
        out_specs=(any_spec, any_spec) if emit_residual else any_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(up, bp.astype(dtype), invmp.astype(dtype))


def corr_half_for_kernel(e_c, h: int, w: int, dtype=None):
    """The fuse_corr operand: coarse correction ``e_c`` (C, ceil(h/2),
    ceil(w/2)) lane-expanded to full width and laid out so half-height row
    ``HALO_R//2 + lc`` / col ``HALO_C + cl`` hold the value fine pixel
    (2*lc(+1), cl) prolongs to. XLA pays only the lane repeat (the
    relayout-heavy axis); the kernel does the sublane repeat in VMEM."""
    strip, ctile = kernel_tiles(h, w)
    hp = -(-h // strip) * strip
    wp = -(-w // ctile) * ctile
    half_h = (hp + 2 * HALO_R) // 2
    e2 = jnp.repeat(e_c, 2, axis=-1)[..., :w]
    if dtype is not None:
        e2 = e2.astype(dtype)
    h2 = e2.shape[-2]
    return jnp.pad(
        e2,
        [(0, 0)] * (e2.ndim - 2)
        + [(HALO_R // 2, half_h - HALO_R // 2 - h2), (HALO_C, wp + HALO_C - w)],
    )


@functools.partial(
    jax.jit, static_argnames=("h", "w", "sweeps", "omega", "emit_residual")
)
def fused_jacobi_corr_tpu_padded(
    up, bp, invmp, corr_half, h: int, w: int, sweeps: int = 8, omega=0.8,
    emit_residual: bool = False,
):
    """Post-smooth with the coarse-correction add fused in
    (:func:`corr_half_for_kernel` builds ``corr_half``): bit-equal to
    ``fused_jacobi_tpu_padded(up + pad(prolong(e)*mask), ...)`` up to the
    sign of zero on KNOWN cells (the fused path selects, the XLA path adds
    prolong(e)*0 — known-cell values never reach interior smoothing, which
    reads neighbours through unknown-selects). Same padded-IO contract as
    fused_jacobi_tpu_padded.

    ``emit_residual`` (requires sweeps + 1 <= HALO_R): also return
    r = (b - A u) * m from the same VMEM window — this is how the PCG loop
    gets A·z for free after the top-level post-smooth (az = b - res), which
    replaces the standalone masked_laplacian A-apply on p (measured 8.6 ms
    of a 42.7 ms full-tile iteration at ~22% of HBM speed-of-light — the
    XLA lane-shift stencil relayouts; the in-window ring costs ~1 ms)."""
    assert sweeps + (1 if emit_residual else 0) <= HALO_R
    if isinstance(omega, tuple):
        assert len(omega) == sweeps
    strip, ctile = kernel_tiles(h, w)
    winr = strip + 2 * HALO_R
    winc = ctile + 2 * HALO_C
    c, hpad, wpad = up.shape
    hp = hpad - 2 * HALO_R
    wp = wpad - 2 * HALO_C
    assert hp == -(-h // strip) * strip and wp == -(-w // ctile) * ctile
    assert corr_half.shape == (c, hpad // 2, wpad), (corr_half.shape, up.shape)
    dtype = up.dtype
    out_shape = jax.ShapeDtypeStruct((c, hpad, wpad), dtype)
    scratch = [
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, winr // 2, winc), dtype),
        pltpu.VMEM((2, strip, ctile), dtype),
    ]
    if emit_residual:
        scratch.append(pltpu.VMEM((2, strip, ctile), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, 6)))
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
            emit_residual=emit_residual,
            out_off_r=HALO_R,
            out_off_c=HALO_C,
            fuse_corr=True,
        ),
        out_shape=(out_shape, out_shape) if emit_residual else out_shape,
        in_specs=[any_spec] * 4,
        out_specs=(any_spec, any_spec) if emit_residual else any_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(up, bp.astype(dtype), invmp.astype(dtype), corr_half.astype(dtype))
    return out


def _zero_call(b, invm, h, w, sweeps, omega, emit_residual, padded_io):
    """Shared pallas_call plumbing for the zero-start kernels.
    ``emit_residual``: False | True | "half" (row-paired half-height
    restrict output, rim-free — see _kernel_factory)."""
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
        bp, imp = b, invm
    else:
        hp = -(-h // strip) * strip
        wp = -(-w // ctile) * ctile
        hpad, wpad = hp + 2 * HALO_R, wp + 2 * HALO_C
        bp = pad_for_kernel(b, h, w)
        imp = pad_for_kernel(invm, h, w)
    dtype = b.dtype
    half = emit_residual == "half"
    out_shape = jax.ShapeDtypeStruct((c, hpad, wpad), dtype)
    res_shape = (
        jax.ShapeDtypeStruct((c, hp // 2, wp), dtype) if half else out_shape
    )
    scratch = [
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, winr, winc), dtype),
        pltpu.VMEM((2, strip, ctile), dtype),
    ]
    if emit_residual:
        scratch.append(
            pltpu.VMEM((2, strip // 2 if half else strip, ctile), dtype)
        )
    scratch.append(pltpu.SemaphoreType.DMA((2, 5)))
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
        out_shape=(out_shape, res_shape) if emit_residual else out_shape,
        in_specs=[any_spec] * 2,
        out_specs=(any_spec, any_spec) if emit_residual else any_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(bp, imp.astype(dtype))
    if padded_io:
        return out
    if emit_residual:
        return (
            slice_from_kernel(out[0], h, w),
            out[1] if half else slice_from_kernel(out[1], h, w),
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
    return _zero_call(
        b, invm_for_kernel(umask, deg).astype(b.dtype), h, w, sweeps, omega,
        emit_residual, False,
    )


@functools.partial(
    jax.jit, static_argnames=("h", "w", "sweeps", "omega", "emit_residual")
)
def fused_jacobi_zero_tpu_padded(
    bp, invmp, h: int, w: int, sweeps: int = 8, omega=0.8,
    emit_residual: bool = False,
):
    """Padded-IO zero-start variant: operands already in pad_for_kernel
    layout (``invmp`` from :func:`invm_for_kernel`), outputs come back in
    the same layout (interiors exact, rims uninitialized — same contract
    as fused_jacobi_tpu_padded)."""
    return _zero_call(bp, invmp, h, w, sweeps, omega, emit_residual, True)


def _residual_factory(
    strip: int,
    ctile: int,
    n_strips: int,
    n_ctiles: int,
    channels: int,
    with_xlo: bool,
    emit_b: bool,
):
    """Round-5 kernel: the double-float refinement RESIDUAL CASCADE in one
    VMEM pass (models/fill._fused_refine_solve.residual, laplace mode).

    The XLA route materializes each shifted tap of y = known + x_hi as its
    own padded full-raster copy, so the exact TwoSum cascade runs at
    ~45 GB/s effective — ~40-50 ms per full-tile band, twice per solve
    (entry + convergence certificate), ~25% of the whole band solve
    (benchmarks/x_fixed_probe). Here the taps are pltpu.roll's inside one
    streamed window and the cascade arithmetic runs on VMEM-resident data.

    Bit-parity contract (tests/test_pallas.py::TestResidualCascade): the
    TwoSum chain folds terms in EXACTLY the XLA operand order —
    (up, down, left, right, -4*x_hi, k*x_hi), then the f32 lo-sum
    ((((lu+ld)+ll)+lr) - 4*x_lo) + k*x_lo — so interior results match the
    XLA cascade to the sign of zero (select-vs-multiply masking, same
    rationale as the smoother kernels).

    * ``with_xlo=False``: the ENTRY residual. At entry x_hi = img*mask and
      x_lo = 0 identically (fill.py builds them that way for the laplace
      warm start), so y = img bit-exactly (disjoint supports) and the
      x_hi/x_lo operands disappear — 2 input windows, like the zero-start
      smoother.
    * ``emit_b`` (entry only): also emit b = shift_sum(known) * mask from
      the same windows — the ||b|| pass (11 ms/band in XLA) becomes one
      extra interior write.
    * outputs are RIM-FREE (C, hp, wp): tile interiors only, no halo rims,
      trailing tile pads are exact zeros (mask pads are 0 -> select 0), so
      norms over the full output equal norms over [:h, :w] bit-for-bit
      (adding exact f64 zeros is exact).
    """
    winr = strip + 2 * HALO_R
    winc = ctile + 2 * HALO_C
    per_chan = n_strips * n_ctiles
    n_tiles = channels * per_chan

    def kernel(*refs):
        one = jnp.int32(1)
        if with_xlo:
            img_hbm, xhi_hbm, xlo_hbm, im_hbm, *rest = refs
        else:
            img_hbm, im_hbm, *rest = refs
            xhi_hbm = xlo_hbm = None
        if emit_b:
            r_hbm, b_hbm = rest[0], rest[1]
            scratch = rest[2:]
        else:
            r_hbm, b_hbm = rest[0], None
            scratch = rest[1:]
        if with_xlo:
            simg, sxh, sxl, sim, sr, sems = scratch
            sb = None
        elif emit_b:
            simg, sim, sr, sb, sems = scratch
            sxh = sxl = None
        else:
            simg, sim, sr, sems = scratch
            sxh = sxl = sb = None

        def coords(t):
            ci = t // jnp.int32(per_chan)
            rem = t % jnp.int32(per_chan)
            r0 = (rem // jnp.int32(n_ctiles)) * jnp.int32(strip)
            c0 = (rem % jnp.int32(n_ctiles)) * jnp.int32(ctile)
            return ci, r0, c0

        def in_copies(t, sel):
            ci, r0, c0 = coords(t)
            cps = [
                pltpu.make_async_copy(
                    img_hbm.at[ci, pl.ds(r0, winr), pl.ds(c0, winc)],
                    simg.at[sel],
                    sems.at[sel, jnp.int32(0)],
                ),
                pltpu.make_async_copy(
                    im_hbm.at[pl.ds(r0, winr), pl.ds(c0, winc)],
                    sim.at[sel],
                    sems.at[sel, jnp.int32(1)],
                ),
            ]
            if with_xlo:
                cps.append(
                    pltpu.make_async_copy(
                        xhi_hbm.at[ci, pl.ds(r0, winr), pl.ds(c0, winc)],
                        sxh.at[sel],
                        sems.at[sel, jnp.int32(2)],
                    )
                )
                cps.append(
                    pltpu.make_async_copy(
                        xlo_hbm.at[ci, pl.ds(r0, winr), pl.ds(c0, winc)],
                        sxl.at[sel],
                        sems.at[sel, jnp.int32(3)],
                    )
                )
            return cps

        def out_copies(t, sel):
            ci, r0, c0 = coords(t)
            cps = [
                pltpu.make_async_copy(
                    sr.at[sel],
                    r_hbm.at[ci, pl.ds(r0, strip), pl.ds(c0, ctile)],
                    sems.at[sel, jnp.int32(4)],
                )
            ]
            if emit_b:
                cps.append(
                    pltpu.make_async_copy(
                        sb.at[sel],
                        b_hbm.at[ci, pl.ds(r0, strip), pl.ds(c0, ctile)],
                        sems.at[sel, jnp.int32(5)],
                    )
                )
            return cps

        def taps(v):
            # (up, down, left, right) in shift_sum/_shift_taps order; raw
            # rolls, NOT masked — the XLA cascade taps y/x_lo unmasked, and
            # wrap-around garbage lands in the discarded window rim only
            return (
                pltpu.roll(v, one, 0),
                pltpu.roll(v, jnp.int32(winr - 1), 0),
                pltpu.roll(v, one, 1),
                pltpu.roll(v, jnp.int32(winc - 1), 1),
            )

        def two_sum(a, b):
            s = a + b
            bb = s - a
            e = (a - (s - bb)) + (b - bb)
            return s, e

        for cp in in_copies(jnp.int32(0), jnp.int32(0)):
            cp.start()

        def body(t, carry):
            sel = lax.rem(t, jnp.int32(2))
            for cp in in_copies(t, sel):
                cp.wait()

            @pl.when(t + 1 < n_tiles)
            def _():
                for cp in in_copies(t + 1, jnp.int32(1) - sel):
                    cp.start()

            @pl.when(t >= 2)
            def _():
                for cp in out_copies(t - 2, sel):
                    cp.wait()

            invm = sim[sel].astype(jnp.float32)
            unknown = invm > 0
            # exact degree reconstruction (see _kernel_factory: 1/(1/d)
            # roundtrips bit-perfectly in f32; the round restores bf16
            # operands' exact degree)
            deg = jnp.where(
                unknown, jnp.round(1.0 / jnp.where(unknown, invm, 1.0)), 1.0
            )
            kf = jnp.where(unknown, 4.0 - deg, 0.0)
            img = simg[sel].astype(jnp.float32)
            if with_xlo:
                xh = sxh[sel].astype(jnp.float32)
                # y = known + x_hi: disjoint supports make the sum a select
                y = jnp.where(unknown, xh, img)
            else:
                y = img
                xh = jnp.where(unknown, y, 0.0)

            t1, t2, t3, t4 = taps(y)
            s, c = two_sum(t1, t2)
            for term in (t3, t4, -4.0 * xh, kf * xh):
                s, e = two_sum(s, term)
                c = c + e
            if with_xlo:
                xl = sxl[sel].astype(jnp.float32)
                l1, l2, l3, l4 = taps(xl)
                lo = l1 + l2 + l3 + l4 - 4.0 * xl + kf * xl
                r = jnp.where(unknown, s + (c + lo), 0.0)
            else:
                r = jnp.where(unknown, s + c, 0.0)
            sr[sel] = r[HALO_R : HALO_R + strip, HALO_C : HALO_C + ctile]
            if emit_b:
                known = jnp.where(unknown, 0.0, y)
                k1, k2, k3, k4 = taps(known)
                bv = jnp.where(unknown, ((k1 + k2) + k3) + k4, 0.0)
                sb[sel] = bv[HALO_R : HALO_R + strip, HALO_C : HALO_C + ctile]
            for cp in out_copies(t, sel):
                cp.start()
            return carry

        lax.fori_loop(jnp.int32(0), jnp.int32(n_tiles), body, jnp.int32(0))
        for dt in (2, 1):
            if n_tiles >= dt:
                t_last = n_tiles - dt
                sel_last = jnp.int32(t_last % 2)
                for cp in out_copies(jnp.int32(t_last), sel_last):
                    cp.wait()

    return kernel


def _residual_call(imgp, xhip, xlop, invmp, h, w, emit_b):
    """Shared pallas_call plumbing for the residual-cascade kernels. All
    operands in pad_for_kernel layout; img/xhi/xlo f32, invm any dtype
    (cast + exact-degree-rounded in-kernel). Outputs rim-free (C, hp, wp)
    f32 with exact-zero tile pads."""
    strip, ctile = kernel_tiles(h, w)
    winr = strip + 2 * HALO_R
    winc = ctile + 2 * HALO_C
    c, hpad, wpad = imgp.shape
    hp = hpad - 2 * HALO_R
    wp = wpad - 2 * HALO_C
    assert hp == -(-h // strip) * strip and wp == -(-w // ctile) * ctile, (
        "padded operands do not match pad_for_kernel's layout for (h, w)",
        (hpad, wpad), (h, w), (strip, ctile),
    )
    with_xlo = xhip is not None
    assert not (with_xlo and emit_b), "b emission is an entry-only fold"
    out_shape = jax.ShapeDtypeStruct((c, hp, wp), jnp.float32)
    scratch = [pltpu.VMEM((2, winr, winc), jnp.float32)]  # img
    if with_xlo:
        scratch.append(pltpu.VMEM((2, winr, winc), jnp.float32))  # x_hi
        scratch.append(pltpu.VMEM((2, winr, winc), jnp.float32))  # x_lo
    scratch.append(pltpu.VMEM((2, winr, winc), invmp.dtype))  # invm
    scratch.append(pltpu.VMEM((2, strip, ctile), jnp.float32))  # r out
    if emit_b:
        scratch.append(pltpu.VMEM((2, strip, ctile), jnp.float32))  # b out
    scratch.append(pltpu.SemaphoreType.DMA((2, 6)))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    n_in = 4 if with_xlo else 2
    n_out = 2 if emit_b else 1
    operands = (
        (imgp, xhip, xlop, invmp) if with_xlo else (imgp, invmp)
    )
    return pl.pallas_call(
        _residual_factory(
            strip, ctile, hp // strip, wp // ctile, c,
            with_xlo=with_xlo, emit_b=emit_b,
        ),
        out_shape=(out_shape,) * n_out if n_out > 1 else out_shape,
        in_specs=[any_spec] * n_in,
        out_specs=(any_spec,) * n_out if n_out > 1 else any_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT
        ),
    )(*operands)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def residual_entry_tpu_padded(imgp, invmp, h: int, w: int):
    """(r, b) for the laplace ENTRY state (x_hi = img*mask, x_lo = 0):
    r = (b - A x0) * mask via the exact TwoSum cascade, b = the Dirichlet
    RHS — both rim-free (C, hp, wp) f32 with exact-zero pads. Bit-equal to
    fill.py's XLA route (to the sign of zero); reference semantics
    laplace.cpp:71-106 (RHS) + the Eigen residual it stops on."""
    return _residual_call(imgp, None, None, invmp, h, w, emit_b=True)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def residual_pair_tpu_padded(imgp, xhip, xlop, invmp, h: int, w: int):
    """r = (b - A(x_hi + x_lo)) * mask for the refinement loop's
    double-float iterate — the exact cascade over the hi terms plus the
    plain-f32 lo terms, rim-free (C, hp, wp) f32."""
    return _residual_call(imgp, xhip, xlop, invmp, h, w, emit_b=False)


def pallas_available() -> bool:
    """True when the default backend can lower Pallas TPU kernels."""
    return jax.default_backend() == "tpu"
