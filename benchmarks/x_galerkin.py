"""EXPERIMENT: Galerkin 2x2-aggregation multigrid vs the rediscretized cycle.

x_vcontraction showed the production V-cycle DIVERGES as a stationary
iteration even at depth 2 (ratios ->1.61): any-pool coarsening grows every
blob by ~1 cell per level, so the rediscretized coarse operator under-anchors
the Dirichlet boundary and the correction overshoots small blobs by
(1+2/rho)^2 > 2.  Fix under test: GALERKIN coarse operators via
piecewise-constant (2x2 block) transfers:

  * A_c = P^T A P is then EXACTLY a 5-point stencil with integer edge
    weights (crossing unknown-edge counts) and diagonal
    sum(block diag) - 2*(intra-block edges) — compact and recursively
    aggregatable with strided slices;
  * the coarse correction becomes an A-orthogonal projection (eigenvalues
    {0,1}): the stationary cycle cannot diverge;
  * restrict = 2x2 block sum, prolong = block broadcast — replaces the
    47 ms/iter separable bilinear glue measured at full tile.

Plain aggregation underestimates smooth corrections, so we also sweep an
overcorrection factor omega on the coarse-grid correction (safe: correction
eigenvalues become {0, omega}, convergent for omega < 2).

All jitted programs take the hierarchy as ARGUMENTS (baking the planes in as
closure constants made the remote compile service hang on ~90 MB HLOs).

Run: python benchmarks/x_galerkin.py [--size 2048] [--iters 8]
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--min-size", type=int, default=24)
    ap.add_argument("--omegas", type=str, default="1.0,1.5,1.8")
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
    umask = bench.make_mask(n, n)
    deg = neighbor_degree((n, n))
    img = bench.smooth(n, n, 0)
    known = img * (~umask)
    b = (shift_sum(jnp.asarray(known)) * umask).astype(jnp.float32)[None]
    jax.block_until_ready(b)

    # ---- aggregation hierarchy -------------------------------------------
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
        diag_c = blocksum(diag_p) - 2.0 * intra
        diag_c = jnp.where(mask_c, diag_c, 1.0)
        return mask_c, diag_c, wE_c, wS_c

    def fine_weights(mask, deg):
        m = mask
        wE = jnp.zeros(m.shape, jnp.float32)
        wE = wE.at[:, :-1].set((m[:, :-1] & m[:, 1:]).astype(jnp.float32))
        wS = jnp.zeros(m.shape, jnp.float32)
        wS = wS.at[:-1, :].set((m[:-1, :] & m[1:, :]).astype(jnp.float32))
        return m, deg.astype(jnp.float32), wE, wS

    @jax.jit
    def build_agg_levels(mask0, deg0):
        lvl = fine_weights(mask0, deg0)
        out = []
        while min(lvl[0].shape) > args.min_size:
            lvl = aggregate(*lvl)
            out.append(lvl)
        return tuple(out)

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
            au = weighted_apply(u, diag, wE, wS)
            u = u + om * (bb - au) * inv_d * mf
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
        mflat = mask.ravel()
        d = jnp.where(mflat, diag.ravel(), 1.0)
        rng = jnp.arange(nn, dtype=jnp.int32)
        a = jnp.zeros((nn, nn), jnp.float32).at[rng, rng].set(d)
        idx = rng.reshape(hc, wc)

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

    um_j = jnp.asarray(umask)
    deg_j = jnp.asarray(deg, jnp.float32)
    agg_levels = build_agg_levels(um_j, deg_j)
    cinv = jax.jit(dense_inv_weighted)(*agg_levels[-1])
    jax.block_until_ready(cinv)

    fine_lvl = fine_weights(um_j, deg_j)
    levels_all = (fine_lvl,) + tuple(agg_levels)
    m_c = agg_levels[-1][0]
    print(
        f"mask {n}^2 {umask.mean() * 100:.1f}% unknown; {len(levels_all)} levels; "
        f"coarsest {m_c.shape} unknowns={int(np.asarray(m_c.sum()))}",
        flush=True,
    )

    @functools.partial(jax.jit, static_argnames=("iters", "omega_c"))
    def stationary(bb, levels, cinv, iters, omega_c):
        um, dg = levels[0][0], levels[0][1]
        u0 = jnp.zeros_like(bb)

        def body(_, state):
            u, norms, i = state
            r = (bb - masked_laplacian(u, um, dg)) * um.astype(bb.dtype)
            u = u + v_cycle_agg(levels, cinv, r, jnp.zeros_like(r), 0, omega_c)
            norms = norms.at[i].set(jnp.sqrt(jnp.sum(r * r)))
            return u, norms, i + 1

        u, norms, _ = lax.fori_loop(
            0, iters, body, (u0, jnp.zeros((iters,), jnp.float32), 0)
        )
        rf = (bb - masked_laplacian(u, um, dg)) * um.astype(bb.dtype)
        return jnp.concatenate([norms, jnp.sqrt(jnp.sum(rf * rf))[None]])

    @functools.partial(jax.jit, static_argnames=("max_iterations", "omega_c", "fixed_iters"))
    def pcg(bb, levels, cinv, tol, max_iterations, omega_c, fixed_iters=None):
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

        def body_fn(state):
            x, r, p, z, rz, it = state
            ap = masked_laplacian(p, um, dg)
            pap = jnp.sum(p * ap)
            alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
            x = x + alpha * p
            r_new = r - alpha * ap
            z_new = v_cycle_agg(levels, cinv, r_new, jnp.zeros_like(r_new), 0, omega_c)
            rz_new = jnp.sum(r_new * z_new)
            beta_num = rz_new - jnp.sum(r * z_new)
            beta = jnp.where(rz > 0, beta_num / jnp.where(rz > 0, rz, 1.0), 0.0)
            p = z_new + beta * p
            return x, r_new, p, z_new, rz_new, it + 1

        if fixed_iters is not None:
            def body(i, state):
                return body_fn(state)
            x, r, *_ = lax.fori_loop(0, fixed_iters, body, (x, r, p, z, rz, jnp.int32(0)))
            return x, jnp.int32(fixed_iters), jnp.sum(r * r) / bs

        def cond(state):
            _, r, _, _, _, it = state
            return jnp.logical_and(jnp.sum(r * r) > threshold, it < max_iterations)

        x, r, p, z, rz, it = lax.while_loop(
            cond, body_fn, (x, r, p, z, rz, jnp.int32(0))
        )
        return x, it, jnp.sum(r * r) / bs

    for omega_c in [float(s) for s in args.omegas.split(",")]:
        norms = np.asarray(
            stationary(b, levels_all, cinv, iters=args.iters, omega_c=omega_c)
        )
        ratios = norms[1:] / np.maximum(norms[:-1], 1e-30)
        _, it4, _ = pcg(b, levels_all, cinv, jnp.float32(1e-4),
                        max_iterations=100, omega_c=omega_c)
        _, it6, res6 = pcg(b, levels_all, cinv, jnp.float32(3e-7),
                           max_iterations=100, omega_c=omega_c)
        it4, it6 = int(it4), int(it6)
        for it in (2, 12):
            jax.block_until_ready(
                pcg(b, levels_all, cinv, jnp.float32(0.0), max_iterations=100,
                    omega_c=omega_c, fixed_iters=it)[0]
            )
        t0 = time.perf_counter()
        jax.block_until_ready(
            pcg(b, levels_all, cinv, jnp.float32(0.0), max_iterations=100,
                omega_c=omega_c, fixed_iters=2)[0]
        )
        t1 = time.perf_counter()
        jax.block_until_ready(
            pcg(b, levels_all, cinv, jnp.float32(0.0), max_iterations=100,
                omega_c=omega_c, fixed_iters=12)[0]
        )
        t2 = time.perf_counter()
        marg_us = ((t2 - t1) - (t1 - t0)) / 10 * 1e6
        print(
            f"omega_c={omega_c:.1f} stationary: "
            + " ".join(f"{r:.3f}" for r in ratios[:6])
            + f"   PCG@1e-4: {it4:3d} it   PCG@3e-7: {it6:3d} it"
            + f"   marginal {marg_us:7.0f} us/it",
            flush=True,
        )


if __name__ == "__main__":
    main()
