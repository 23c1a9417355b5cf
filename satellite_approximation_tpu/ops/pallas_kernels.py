"""Pallas TPU kernels for the solver hot loops.

``fused_jacobi_tpu``: K damped-Jacobi sweeps of the masked 5-point system in
one kernel. XLA executes each sweep as a separate HBM round trip (~3 arrays
of traffic per sweep); this kernel streams (row-strip x column-tile) windows
with a halo rim through VMEM, runs all K sweeps on-chip — the halo keeps the
window interior exact, since stencil information travels one cell per
sweep — and DMAs only the interior back. ~K-fold less HBM traffic on the
smoother, which dominates every multigrid V-cycle.

Implementation notes for this environment:
* windows are (STRIP+2*HALO_R) x (CTILE+2*HALO_C) with HALO_C=64 so every
  DMA slice and start offset is 128-aligned in the lane dimension (Mosaic
  requirement); column tiling keeps VMEM bounded for arbitrarily wide
  images (a full-width 10980-strip window would need 26MB of VMEM);
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

STRIP = 112  # interior rows per strip (divisible by 8)
HALO_R = 8
WINR = STRIP + 2 * HALO_R  # 128 rows per VMEM window
HALO_C = 64  # column halo: keeps every DMA offset/extent 128-aligned
CTILE = 2048  # interior columns per tile (multiple of 128)


def _kernel_factory(
    sweeps: int,
    omega,
    winc: int,
    n_strips: int,
    n_ctiles: int,
    channels: int,
    emit_residual: bool = False,
):
    # scalar omega = classic damped Jacobi; a tuple gives each sweep its
    # own weight (Chebyshev polynomial smoothing, models/multigrid)
    omegas = omega if isinstance(omega, tuple) else (float(omega),) * sweeps
    assert len(omegas) == sweeps
    def kernel(u_hbm, b_hbm, m_hbm, d_hbm, *outs_and_scratch):
        if emit_residual:
            out_hbm, res_hbm, su, sb, sm, sd, so, sr, sems = outs_and_scratch
        else:
            out_hbm, su, sb, sm, sd, so, sems = outs_and_scratch
            res_hbm = sr = None
        one = jnp.int32(1)

        def tile_body(ci, i, j, carry):
            r0 = i * jnp.int32(STRIP)
            c0 = j * jnp.int32(CTILE)

            idx = [jnp.int32(t) for t in range(6)]
            copies = [
                pltpu.make_async_copy(
                    u_hbm.at[ci, pl.ds(r0, WINR), pl.ds(c0, winc)], su, sems.at[idx[0]]
                ),
                pltpu.make_async_copy(
                    b_hbm.at[ci, pl.ds(r0, WINR), pl.ds(c0, winc)], sb, sems.at[idx[1]]
                ),
                pltpu.make_async_copy(
                    m_hbm.at[pl.ds(r0, WINR), pl.ds(c0, winc)], sm, sems.at[idx[2]]
                ),
                pltpu.make_async_copy(
                    d_hbm.at[pl.ds(r0, WINR), pl.ds(c0, winc)], sd, sems.at[idx[3]]
                ),
            ]
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
            inv = jnp.where(deg > 0, 1.0 / deg, 0.0) * m

            def neighbor_sum(u):
                um = u * m
                return (
                    pltpu.roll(um, one, 0)
                    + pltpu.roll(um, jnp.int32(WINR - 1), 0)
                    + pltpu.roll(um, one, 1)
                    + pltpu.roll(um, jnp.int32(winc - 1), 1)
                )

            # unrolled so each sweep can carry its own weight (Chebyshev
            # smoothing); sweeps <= HALO_R keeps this a handful of steps
            u = su[:, :].astype(jnp.float32)
            for om in omegas:
                au = deg * u - neighbor_sum(u)
                u = u + om * (b - au) * inv
            so[:, :] = u[HALO_R : HALO_R + STRIP, HALO_C : HALO_C + CTILE].astype(
                so.dtype
            )
            out_cp = pltpu.make_async_copy(
                so, out_hbm.at[ci, pl.ds(r0, STRIP), pl.ds(c0, CTILE)], sems.at[idx[4]]
            )
            out_cp.start()
            if emit_residual:
                # the post-smooth residual r = (b - A u) * m in the same
                # window — interior needs one more exact ring, so
                # sweeps + 1 <= HALO_R (asserted by the caller)
                au = deg * u - neighbor_sum(u)
                res = (b - au) * m
                sr[:, :] = res[
                    HALO_R : HALO_R + STRIP, HALO_C : HALO_C + CTILE
                ].astype(sr.dtype)
                res_cp = pltpu.make_async_copy(
                    sr, res_hbm.at[ci, pl.ds(r0, STRIP), pl.ds(c0, CTILE)], sems.at[idx[5]]
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
    hp = -(-h // STRIP) * STRIP
    wp = -(-w // CTILE) * CTILE
    winc = CTILE + 2 * HALO_C

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

    n_strips = hp // STRIP
    n_ctiles = wp // CTILE
    out_shape = jax.ShapeDtypeStruct((c, hp, wp), dtype)
    scratch = [
        pltpu.VMEM((WINR, winc), dtype),
        pltpu.VMEM((WINR, winc), dtype),
        pltpu.VMEM((WINR, winc), dtype),
        pltpu.VMEM((WINR, winc), dtype),
        pltpu.VMEM((STRIP, CTILE), dtype),
    ]
    if emit_residual:
        scratch.append(pltpu.VMEM((STRIP, CTILE), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((6,)))
    out = pl.pallas_call(
        _kernel_factory(
            sweeps,
            omega if isinstance(omega, tuple) else float(omega),
            winc, n_strips, n_ctiles, c, emit_residual,
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
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(up, bp, mp, dp)
    if emit_residual:
        return out[0][:, :h, :w], out[1][:, :h, :w]
    return out[:, :h, :w]


def pallas_available() -> bool:
    """True when the default backend can lower Pallas TPU kernels."""
    return jax.default_backend() == "tpu"
