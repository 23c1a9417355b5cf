"""EXPERIMENT: block-sum/broadcast transfers with rediscretized operators.

x_thinmask settled coarsening: all-pool wins on blob masks (5/7 PCG iters vs
any-pool's 7/12 at 2048^2) and thin masks are smoother-dominated (2-3 iters
for every variant). Remaining question: can the bilinear/full-weighting
transfers (measured 47 ms of a 183 ms full-tile PCG iteration — 15x their
traffic bound, XLA lane-strided relayouts) be replaced by piecewise-constant
block transfers (restrict = 2x2 sum, prolong = broadcast) WITHOUT giving
back the iteration win?  Smooth-mode scaling still cancels: R amplifies by
4, the rediscretized coarse symbol is 4*theta^2.

Variants (all rediscretized (mask, deg) levels, production smoother weights):
  all+bilinear — x_coarsen_ab winner (control)
  all+block    — candidate: trivial transfers everywhere
  any+block    — isolates pooling vs transfer effects

Run: python benchmarks/x_blocktransfer.py [--size 2048]
"""

import argparse
import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


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
    umask = bench.make_mask(n, n)
    deg = neighbor_degree((n, n))
    img = bench.smooth(n, n, 0)
    known = img * (~umask)
    b = (shift_sum(jnp.asarray(known)) * umask).astype(jnp.float32)[None]
    jax.block_until_ready(b)

    def pad_even(a):
        h, w = a.shape
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        if (ph, pw) == (h, w):
            return a
        return jnp.pad(a, ((0, ph - h), (0, pw - w)))

    def build_redisc(pool):
        levels = [(jnp.asarray(umask), jnp.asarray(deg, jnp.float32))]
        m = jnp.asarray(umask)
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

    def v_cycle_block(levels, cinv, bb, u, lvl):
        um, dg = levels[lvl]
        mf = um.astype(bb.dtype)
        pre = multigrid._smoother_omegas(multigrid._PRE_SMOOTH)
        if lvl == len(levels) - 1:
            if cinv is not None:
                r = (bb - masked_laplacian(u, um, dg)) * mf
                nn = um.shape[-2] * um.shape[-1]
                rb = r.reshape(*r.shape[:-2], nn)
                e = (rb @ cinv.T).reshape(r.shape)
                return u + e * mf
            return u
        u = multigrid._smooth(u, bb, um, dg, pre)
        r = (bb - masked_laplacian(u, um, dg)) * mf
        r_c = restrict_bs(r) * levels[lvl + 1][0].astype(r.dtype)
        e_c = v_cycle_block(levels, cinv, r_c, jnp.zeros_like(r_c), lvl + 1)
        u = u + prolong_bc(e_c, u.shape) * mf
        u = multigrid._smooth(
            u, bb, um, dg, tuple(reversed(multigrid._smoother_omegas(multigrid._POST_SMOOTH)))
        )
        return u

    @functools.partial(jax.jit, static_argnames=("max_iterations", "transfers"))
    def pcg(bb, levels, cinv, tol, max_iterations, transfers):
        um, dg = levels[0]
        umf = um.astype(bb.dtype)
        bb = bb * umf

        if transfers == "block":
            def precond(r):
                return v_cycle_block(levels, cinv, r, jnp.zeros_like(r), 0)
        else:
            def precond(r):
                return multigrid._v_cycle(levels, r, jnp.zeros_like(r), 0, cinv)

        x = jnp.zeros_like(bb)
        r = bb
        z = precond(r)
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
            z_new = precond(r_new)
            rz_new = jnp.sum(r_new * z_new)
            beta = jnp.where(
                rz > 0, (rz_new - jnp.sum(r * z_new)) / jnp.where(rz > 0, rz, 1.0), 0.0
            )
            p = z_new + beta * p
            return x, r_new, p, z_new, rz_new, it + 1

        x, r, *_, it = lax.while_loop(cond, body, (x, r, p, z, rz, jnp.int32(0)))
        return it

    for pool, transfers in (("all", "bilinear"), ("all", "block"), ("any", "block")):
        levels, cinv = build_redisc(pool)
        it4 = int(pcg(b, levels, cinv, jnp.float32(1e-4), max_iterations=300,
                      transfers=transfers))
        it6 = int(pcg(b, levels, cinv, jnp.float32(3e-7), max_iterations=300,
                      transfers=transfers))
        print(f"{pool}pool + {transfers:8s}: PCG@1e-4 {it4:3d}   PCG@3e-7 {it6:3d}",
              flush=True)


if __name__ == "__main__":
    main()
