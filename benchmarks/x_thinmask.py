"""EXPERIMENT: coarsening robustness on THIN masks.

x_coarsen_ab showed all-pool coarsening beats any-pool on the bench mask
(clustered ellipses): 5 vs 7 PCG iters @1e-4. But all-pool ERASES any
structure thinner than 2^level cells from coarse grids — a 2-3 px wide
crack/scanline gap/river shadow gets no coarse correction at all, so the
preconditioner degenerates to the smoother and iterations should scale with
the structure's LENGTH. Galerkin aggregation keeps every structure on every
level (weights encode the anchoring exactly).

Masks tested (at --size, default 2048):
  ellipses   — the bench mask (control)
  cracks     — 8 random 3-px-wide full-width diagonal bands (~1-2% unknown)
  scanlines  — every 64th row band of height 2, full width (Landsat-7
               SLC-off analog)

Variants: anypool (production), allpool, galerkin omega_c=1.5.

Run: python benchmarks/x_thinmask.py [--size 2048]
"""

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_cracks(n, rng):
    m = np.zeros((n, n), bool)
    for _ in range(8):
        x0 = rng.integers(0, n)
        slope = rng.uniform(-0.5, 0.5)
        ii = np.arange(n)
        jj = (x0 + slope * ii).astype(int)
        for d in range(3):
            j = np.clip(jj + d, 0, n - 1)
            m[ii, j] = True
    return m


def make_scanlines(n):
    m = np.zeros((n, n), bool)
    for r in range(32, n - 2, 64):
        m[r : r + 2, :] = True
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    args = ap.parse_args()

    import satellite_approximation_tpu  # noqa: F401
    import bench
    from satellite_approximation_tpu.models import multigrid
    from satellite_approximation_tpu.models.cg import (
        masked_laplacian, neighbor_degree, shift_sum,
    )

    import jax
    import jax.numpy as jnp
    from jax import lax

    n = args.size
    rng = np.random.default_rng(7)
    masks = {
        "ellipses": bench.make_mask(n, n),
        "cracks": make_cracks(n, rng),
        "scanlines": make_scanlines(n),
    }
    deg = neighbor_degree((n, n))
    img = bench.smooth(n, n, 0)

    # ---- shared machinery (mirrors x_galerkin, levels as jit args) -------
    def pad_even(a, fill=0):
        h, w = a.shape
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        if (ph, pw) == (h, w):
            return a
        return jnp.pad(a, ((0, ph - h), (0, pw - w)), constant_values=fill)

    def blocksum(a):
        a = pad_even(a)
        return a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]

    def aggregate(mask, diag, wE, wS):
        mask_p = pad_even(mask)
        diag_p = pad_even(jnp.where(mask, diag, 0.0))
        wE_p = pad_even(wE)
        wS_p = pad_even(wS)
        mask_c = (
            mask_p[0::2, 0::2] | mask_p[0::2, 1::2]
            | mask_p[1::2, 0::2] | mask_p[1::2, 1::2]
        )
        wE_c = wE_p[0::2, 1::2] + wE_p[1::2, 1::2]
        wS_c = wS_p[1::2, 0::2] + wS_p[1::2, 1::2]
        intra = (
            wE_p[0::2, 0::2] + wE_p[1::2, 0::2]
            + wS_p[0::2, 0::2] + wS_p[0::2, 1::2]
        )
        diag_c = jnp.where(mask_c, blocksum(diag_p) - 2.0 * intra, 1.0)
        return mask_c, diag_c, wE_c, wS_c

    def fine_weights(mask, dg):
        m = mask
        wE = jnp.zeros(m.shape, jnp.float32)
        wE = wE.at[:, :-1].set((m[:, :-1] & m[:, 1:]).astype(jnp.float32))
        wS = jnp.zeros(m.shape, jnp.float32)
        wS = wS.at[:-1, :].set((m[:-1, :] & m[1:, :]).astype(jnp.float32))
        return m, dg.astype(jnp.float32), wE, wS

    def weighted_apply(u, diag, wE, wS):
        nb = [(0, 0)] * (u.ndim - 2)
        au = diag * u
        au = au - jnp.pad(wE[:, :-1] * u[..., :, 1:], nb + [(0, 0), (0, 1)])
        au = au - jnp.pad(wE[:, :-1] * u[..., :, :-1], nb + [(0, 0), (1, 0)])
        au = au - jnp.pad(wS[:-1, :] * u[..., 1:, :], nb + [(0, 1), (0, 0)])
        au = au - jnp.pad(wS[:-1, :] * u[..., :-1, :], nb + [(1, 0), (0, 0)])
        return au

    def weighted_smooth(u, bb, mask, diag, wE, wS, omegas):
        mf = mask.astype(u.dtype)
        inv_d = jnp.where(diag > 0, 1.0 / diag, 0.0)
        for om in omegas:
            u = u + om * (bb - weighted_apply(u, diag, wE, wS)) * inv_d * mf
        return u

    def restrict_bs(r):
        h, w = r.shape[-2], r.shape[-1]
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        rp = jnp.pad(r, [(0, 0)] * (r.ndim - 2) + [(0, ph - h), (0, pw - w)])
        return (
            rp[..., 0::2, 0::2] + rp[..., 0::2, 1::2]
            + rp[..., 1::2, 0::2] + rp[..., 1::2, 1::2]
        )

    def prolong_bc(e, fine_shape):
        up = jnp.repeat(jnp.repeat(e, 2, axis=-2), 2, axis=-1)
        return up[..., : fine_shape[-2], : fine_shape[-1]]

    def dense_inv_weighted(mask, diag, wE, wS):
        hc, wc = mask.shape
        nn = hc * wc
        d = jnp.where(mask.ravel(), diag.ravel(), 1.0)
        rng_ = jnp.arange(nn, dtype=jnp.int32)
        a = jnp.zeros((nn, nn), jnp.float32).at[rng_, rng_].set(d)
        idx = rng_.reshape(hc, wc)

        def link(a, p, q, w_):
            a = a.at[p, q].add(-w_)
            return a.at[q, p].add(-w_)

        a = link(a, idx[:, :-1].ravel(), idx[:, 1:].ravel(), wE[:, :-1].ravel())
        a = link(a, idx[:-1, :].ravel(), idx[1:, :].ravel(), wS[:-1, :].ravel())
        return jnp.linalg.inv(a)

    K = multigrid._PRE_SMOOTH

    def v_cycle_agg(levels, coarse_inv, bb, u, lvl, omega_c):
        mask, diag, wE, wS = levels[lvl]
        mf = mask.astype(bb.dtype)
        pre = multigrid._smoother_omegas(K)
        if lvl == len(levels) - 1:
            r = (bb - weighted_apply(u, diag, wE, wS)) * mf
            nn = mask.shape[-2] * mask.shape[-1]
            rb = r.reshape(*r.shape[:-2], nn)
            e = (rb @ coarse_inv.T).reshape(r.shape)
            return u + e * mf
        u = weighted_smooth(u, bb, mask, diag, wE, wS, pre)
        r = (bb - weighted_apply(u, diag, wE, wS)) * mf
        r_c = restrict_bs(r) * levels[lvl + 1][0].astype(r.dtype)
        e_c = v_cycle_agg(levels, coarse_inv, r_c, jnp.zeros_like(r_c), lvl + 1, omega_c)
        u = u + omega_c * prolong_bc(e_c, u.shape) * mf
        u = weighted_smooth(u, bb, mask, diag, wE, wS, tuple(reversed(pre)))
        return u

    @functools.partial(jax.jit, static_argnames=("max_iterations", "omega_c"))
    def pcg_agg(bb, levels, cinv, tol, max_iterations, omega_c):
        um, dg = levels[0][0], levels[0][1]
        umf = um.astype(bb.dtype)
        bb = bb * umf
        x = jnp.zeros_like(bb)
        r = bb
        z = v_cycle_agg(levels, cinv, r, jnp.zeros_like(r), 0, omega_c)
        p = z
        rz = jnp.sum(r * z)
        bs = jnp.sum(bb * bb)
        threshold = jnp.maximum(tol * tol * bs, jnp.finfo(bb.dtype).tiny)

        def cond(state):
            _, r, _, _, _, it = state
            return jnp.logical_and(jnp.sum(r * r) > threshold, it < max_iterations)

        def body(state):
            x, r, p, z, rz, it = state
            ap = masked_laplacian(p, um, dg)
            pap = jnp.sum(p * ap)
            alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
            x = x + alpha * p
            r_new = r - alpha * ap
            z_new = v_cycle_agg(levels, cinv, r_new, jnp.zeros_like(r_new), 0, omega_c)
            rz_new = jnp.sum(r_new * z_new)
            beta = jnp.where(
                rz > 0, (rz_new - jnp.sum(r * z_new)) / jnp.where(rz > 0, rz, 1.0), 0.0
            )
            p = z_new + beta * p
            return x, r_new, p, z_new, rz_new, it + 1

        x, r, *_, it = lax.while_loop(cond, body, (x, r, p, z, rz, jnp.int32(0)))
        return it

    @functools.partial(jax.jit, static_argnames=("max_iterations",))
    def pcg_prod(bb, hier_levels, cinv, tol, max_iterations):
        _, it, _ = multigrid._pcg_core(
            bb, jnp.zeros_like(bb), tol, multigrid.Hierarchy(hier_levels, cinv),
            max_iterations=max_iterations,
        )
        return it

    def build_redisc(umask_np, pool):
        """(mask, deg) rediscretized levels with any/all pooling + dense inv."""
        levels = [(jnp.asarray(umask_np), jnp.asarray(deg, jnp.float32))]
        m = jnp.asarray(umask_np)
        while min(m.shape) > multigrid._MIN_SIZE:
            mp = pad_even(m)
            if pool == "any":
                m = (mp[0::2, 0::2] | mp[0::2, 1::2]) | (mp[1::2, 0::2] | mp[1::2, 1::2])
            else:
                m = (mp[0::2, 0::2] & mp[0::2, 1::2]) & (mp[1::2, 0::2] & mp[1::2, 1::2])
            h2, w2 = m.shape
            levels.append((m, multigrid._neighbor_degree_traced(h2, w2)))
        m_c, d_c = levels[-1]
        cinv = (
            multigrid._dense_coarse_inverse(m_c, d_c)
            if m_c.size <= multigrid._DENSE_COARSE_MAX
            else None
        )
        return tuple(levels), cinv

    for mname, umask in masks.items():
        known = img * (~umask)
        b = (shift_sum(jnp.asarray(known)) * umask).astype(jnp.float32)[None]
        jax.block_until_ready(b)
        row = [f"{mname:10s} ({umask.mean() * 100:4.1f}% unknown)"]

        for pool in ("any", "all"):
            levels, cinv = build_redisc(umask, pool)
            it4 = int(pcg_prod(b, levels, cinv, jnp.float32(1e-4), max_iterations=300))
            it6 = int(pcg_prod(b, levels, cinv, jnp.float32(3e-7), max_iterations=300))
            row.append(f"{pool}pool {it4:3d}/{it6:3d}")

        um_j = jnp.asarray(umask)
        lvl = fine_weights(um_j, jnp.asarray(deg, jnp.float32))
        agg = []
        while min(lvl[0].shape) > multigrid._MIN_SIZE:
            lvl = aggregate(*lvl)
            agg.append(lvl)
        cinv = jax.jit(dense_inv_weighted)(*agg[-1])
        levels_all = (fine_weights(um_j, jnp.asarray(deg, jnp.float32)),) + tuple(agg)
        it4 = int(pcg_agg(b, levels_all, cinv, jnp.float32(1e-4),
                          max_iterations=300, omega_c=1.5))
        it6 = int(pcg_agg(b, levels_all, cinv, jnp.float32(3e-7),
                          max_iterations=300, omega_c=1.5))
        row.append(f"galerkin1.5 {it4:3d}/{it6:3d}")
        print("   ".join(row), flush=True)


if __name__ == "__main__":
    main()
