"""Sharded geometric multigrid: the multi-chip form of models/multigrid.py.

Image rows shard over the mesh's 'x' axis; bands over 'b'. Fine levels run
*distributed*: Jacobi smoothing and residual stencils consume one ghost row
from each neighbouring shard (``ppermute`` over ICI); the piecewise-constant
block transfers are halo-FREE — every 2x2 block lives inside one shard
because per-level row counts stay divisible by the shard count, so
restriction and prolongation are purely local (vs. the previous bilinear
transfers, which exchanged a ghost row each way per level).
Once a level's per-shard row count gets too small
for useful parallelism, the remaining coarse levels are *replicated*: one
``all_gather`` pulls the coarse residual onto every shard, the coarse
V-cycle tail runs redundantly (cheap — the arrays are tiny), and each shard
slices its own rows of the correction back out with no further
communication. This distributed-fine/replicated-coarse split is the
standard structure of production parallel multigrid.

The whole PCG loop compiles into one shard_map-ped while_loop; the only
cross-shard traffic is halo rows, dot-product psums, and the one
coarse-level all_gather per V-cycle.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import multigrid as M
from ..models.cg import neighbor_degree
from .halo import halo_pad_cols, halo_pad_rows

_MIN_LOCAL_ROWS = 8  # below this, switch to replicated coarse levels


def build_sharded_hierarchy(umask: np.ndarray, deg: np.ndarray, xdim: int):
    """Global hierarchy split into a distributed prefix and replicated tail.

    Returns (padded_shape, dist_levels, repl_levels): dist_levels' row
    counts are divisible by xdim (each shard owns an aligned block);
    repl_levels continue coarsening on the full (small) grid.
    """
    m = np.asarray(umask, bool)
    h, w = m.shape
    # pad rows so every distributed level splits evenly across shards
    depth = 0
    probe = m
    while min(probe.shape) > M._MIN_SIZE:
        ph = (probe.shape[0] + 1) // 2
        pw = (probe.shape[1] + 1) // 2
        if ph // xdim < _MIN_LOCAL_ROWS:
            break
        probe = probe[:ph, :pw]  # shape probe only
        depth += 1
    align = xdim * (1 << max(depth, 0))
    hp = -(-h // align) * align
    mp = np.zeros((hp, w), dtype=bool)
    mp[:h] = m
    dp = np.full((hp, w), 0.0, dtype=np.float32)
    dp[:h] = deg
    dp[h:] = 1.0  # padded rows: inert unknowns=False cells

    dist_levels = [(mp, dp)]
    cur = mp
    for _ in range(depth):
        ch, cw = cur.shape
        pw = (cw + 1) // 2 * 2
        tmp = np.zeros((ch, pw), dtype=bool)
        tmp[:, :cw] = cur
        # 2x2 ALL-pooling, matching models/multigrid.build_hierarchy (see
        # its module docstring: any-pooling makes the V-cycle divergent)
        pooled = tmp.reshape(ch // 2, 2, pw // 2, 2).all(axis=(1, 3))
        if pooled.all():
            break
        cur = pooled
        dist_levels.append((cur, neighbor_degree(cur.shape)))

    repl_levels = M.build_hierarchy(cur, neighbor_degree(cur.shape))
    return (hp, w), dist_levels, repl_levels


def _restrict_rows_sharded(r):
    """Piecewise-constant row restriction: out[i] = f[2i] + f[2i+1]. Every
    2-row block lives inside one shard (per-level rows divide evenly across
    shards), so this is halo-free and bit-identical to the single-device
    block sum's row pass."""
    hl = r.shape[-2]
    return r[..., 0:hl:2, :] + r[..., 1:hl:2, :]


def _prolong_rows_sharded(e):
    """Transpose of :func:`_restrict_rows_sharded`: block broadcast of each
    coarse row to its two fine rows — local, no ghost rows."""
    hc = e.shape[-2]
    stacked = jnp.stack([e, e], axis=-2)  # (..., Hc, 2, W)
    return stacked.reshape(*e.shape[:-2], 2 * hc, e.shape[-1])


def _stencil_sharded(u, um, deg, axis_name):
    masked = u * um
    padded = halo_pad_rows(masked, axis_name)
    h = u.shape[-2]
    w = u.shape[-1]
    wpad = jnp.pad(masked, [(0, 0)] * (u.ndim - 2) + [(0, 0), (1, 1)])
    s = (
        padded[..., 0:h, :]
        + padded[..., 2 : h + 2, :]
        + wpad[..., :, 0:w]
        + wpad[..., :, 2 : w + 2]
    )
    return (deg * u - s) * um


def _smooth_sharded(u, b, um, deg, omegas, axis_name):
    """Weighted-Jacobi sweeps with ghost-row exchange per sweep — the same
    Chebyshev weights as the single-device smoother (M._smoother_omegas),
    so sharded and single-device preconditioners are numerically the same
    operator (iteration-parity-tested in tests/test_parallel.py)."""
    inv = jnp.where(deg > 0, 1.0 / deg, 0.0) * um

    for om in omegas:
        au = _stencil_sharded(u, um, deg, axis_name)
        u = u + om * (b - au) * inv
    return u


def _v_cycle_sharded(
    dist_local, repl_levels_j, b, u, lvl, axis_name, xdim, coarse_inv=None
):
    um, deg = dist_local[lvl]
    pre = M._smoother_omegas(M._PRE_SMOOTH)
    post = tuple(reversed(M._smoother_omegas(M._POST_SMOOTH)))
    if lvl == len(dist_local) - 1:
        # replicated tail: gather the residual rows onto every shard, run
        # the single-device V-cycle redundantly, slice our rows back out
        u = _smooth_sharded(u, b, um, deg, pre, axis_name)
        r = (b - _stencil_sharded(u, um, deg, axis_name)) * um
        r_full = lax.all_gather(r, axis_name, axis=-2, tiled=True)
        e_full = M._v_cycle(
            repl_levels_j, r_full, jnp.zeros_like(r_full), 0, coarse_inv
        )
        hl = u.shape[-2]
        idx = lax.axis_index(axis_name)
        e_local = lax.dynamic_slice_in_dim(e_full, idx * hl, hl, axis=-2)
        u = u + e_local * um
        return _smooth_sharded(u, b, um, deg, post, axis_name)

    u = _smooth_sharded(u, b, um, deg, pre, axis_name)
    r = (b - _stencil_sharded(u, um, deg, axis_name)) * um
    r_c = _restrict_rows_sharded(r)
    if r_c.shape[-1] % 2:  # odd widths pad to even, like M._restrict
        r_c = jnp.pad(r_c, [(0, 0)] * (r_c.ndim - 1) + [(0, 1)])
    r_c = r_c[..., :, 0::2] + r_c[..., :, 1::2]  # column block sum
    um_c, _ = dist_local[lvl + 1]
    r_c = r_c * um_c
    e_c = _v_cycle_sharded(
        dist_local, repl_levels_j, r_c, jnp.zeros_like(r_c), lvl + 1, axis_name,
        xdim, coarse_inv,
    )
    e_f = _prolong_rows_sharded(e_c)
    e_f = jnp.repeat(e_f, 2, axis=-1)[..., :, : u.shape[-1]]
    u = u + e_f * um
    return _smooth_sharded(u, b, um, deg, post, axis_name)


def sharded_mg_solve(
    b: np.ndarray,
    x0: np.ndarray,
    umask: np.ndarray,
    deg: np.ndarray | None,
    mesh: Mesh,
    tolerance: float = 1e-6,
    max_iterations: int = 100,
):
    """MG-preconditioned CG over a ('b', 'x') mesh.

    ``b``/``x0`` are (C, H, W); ``umask`` (H, W). Rows are padded so every
    distributed level splits evenly across the 'x' shards. Returns
    (x (C,H,W) device array with the original shape, iterations, |r|^2).
    """
    c, h, w = b.shape
    xdim = mesh.shape["x"]
    if deg is None:
        deg = neighbor_degree((h, w))
    (hp, wp), dist_levels, repl_levels = build_sharded_hierarchy(umask, deg, xdim)

    def pad(a):
        return jnp.pad(jnp.asarray(a, jnp.float32), [(0, 0)] * (a.ndim - 2) + [(0, hp - h), (0, 0)])

    b_p = jax.device_put(pad(np.asarray(b, np.float32)), NamedSharding(mesh, P("b", "x", None)))
    x0_p = jax.device_put(pad(np.asarray(x0, np.float32)), NamedSharding(mesh, P("b", "x", None)))

    # per-level masks/degrees as row-sharded device arrays (f32)
    dist_j = tuple(
        (
            jax.device_put(jnp.asarray(m_, jnp.float32), NamedSharding(mesh, P("x", None))),
            jax.device_put(jnp.asarray(d_, jnp.float32), NamedSharding(mesh, P("x", None))),
        )
        for m_, d_ in dist_levels
    )
    repl_j = tuple(
        (
            jax.device_put(jnp.asarray(m_), NamedSharding(mesh, P())),
            jax.device_put(jnp.asarray(d_), NamedSharding(mesh, P())),
        )
        for m_, d_ in repl_levels
    )
    # dense coarse inverse for the replicated tail — the same exact coarse
    # solve as the single-device path (models/multigrid._dense_coarse_inverse)
    m_c, d_c = repl_levels[-1]
    coarse_inv = (
        jax.device_put(
            M._dense_coarse_inverse(jnp.asarray(m_c), jnp.asarray(d_c, jnp.float32)),
            NamedSharding(mesh, P()),
        )
        if m_c.size <= M._DENSE_COARSE_MAX
        else None
    )

    tol = jnp.asarray(tolerance, jnp.float32)
    n_dist = len(dist_j)

    in_specs = (
        P("b", "x", None),
        P("b", "x", None),
        tuple((P("x", None), P("x", None)) for _ in range(n_dist)),
        tuple((P(), P()) for _ in range(len(repl_j))),
        None if coarse_inv is None else P(),
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P("b", "x", None), P(), P("b")),
    )
    def run(b_l, x0_l, dist_local, repl_local, cinv):
        um0, deg0 = dist_local[0]

        def dots(p, q):
            return lax.psum(jnp.sum(p * q, axis=(-2, -1)), "x")

        def precond(r):
            return _v_cycle_sharded(
                dist_local, repl_local, r, jnp.zeros_like(r), 0, "x", xdim, cinv
            )

        bb = b_l * um0
        x = x0_l * um0
        r = (bb - _stencil_sharded(x, um0, deg0, "x")) * um0
        z = precond(r)
        p = z
        rz = dots(r, z)
        bs = dots(bb, bb)
        threshold = jnp.maximum(tol * tol * bs, jnp.finfo(jnp.float32).tiny)

        def cond(state):
            _, r_c, _, _, _, it = state
            rr = dots(r_c, r_c)
            flag = lax.psum(jnp.any(rr > threshold).astype(jnp.int32), "b")
            return jnp.logical_and(flag > 0, it < max_iterations)

        def body(state):
            x, r, p, z, rz, it = state
            ap = _stencil_sharded(p, um0, deg0, "x")
            pap = dots(p, ap)
            alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
            a = alpha[..., None, None]
            x = x + a * p
            r_new = r - a * ap
            z_new = precond(r_new)
            rz_new = dots(r_new, z_new)
            beta_num = rz_new - dots(r, z_new)
            beta = jnp.where(rz > 0, beta_num / jnp.where(rz > 0, rz, 1.0), 0.0)
            p = z_new + beta[..., None, None] * p
            return x, r_new, p, z_new, rz_new, it + 1

        x, r, p, z, rz, it = lax.while_loop(cond, body, (x, r, p, z, rz, jnp.int32(0)))
        return x, it, dots(r, r)

    solver = jax.jit(run)

    # f64 iterative refinement: the f32 PCG recurrence drifts by ~eps*kappa,
    # so the true residual is re-measured (in f64, with real halo exchange —
    # GSPMD cannot partition jnp.pad on a sharded dim) and the correction
    # system re-solved until the tolerance genuinely holds.
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("b", "x", None), P("b", "x", None), P("x", None), P("x", None)),
        out_specs=(P("b", "x", None), P("b")),
    )
    def residual64(b64_l, x64_l, um_l, deg_l):
        um = um_l.astype(jnp.float64)
        r = (b64_l * um - _stencil_sharded(x64_l * um, um, deg_l.astype(jnp.float64), "x"))
        r = r * um
        return r, lax.psum(jnp.sum(r * r, axis=(-2, -1)), "x")

    umask_p = dist_j[0][0]
    deg_p = dist_j[0][1]
    b64 = b_p.astype(jnp.float64)
    x64 = x0_p.astype(jnp.float64) * umask_p.astype(jnp.float64)
    bnorm = np.asarray(
        jnp.sqrt(jnp.sum((b64 * umask_p.astype(jnp.float64)) ** 2, axis=(-2, -1)))
    )
    target = tolerance * np.maximum(bnorm, 1e-300)

    total_iters = 0
    r64, rsq = jax.jit(residual64)(b64, x64, umask_p, deg_p)
    rnorm = np.sqrt(np.asarray(rsq))
    for _ in range(3):
        if np.all(rnorm <= target):
            break
        d, it, _ = solver(
            r64.astype(jnp.float32), jnp.zeros_like(b_p), dist_j, repl_j, coarse_inv
        )
        total_iters += int(it)
        x64 = x64 + d.astype(jnp.float64) * umask_p.astype(jnp.float64)
        r64, rsq = jax.jit(residual64)(b64, x64, umask_p, deg_p)
        rnorm = np.sqrt(np.asarray(rsq))

    if hp != h:
        # the partitioner cannot slice a row-sharded dim to a non-divisible
        # extent: reshard rows to replicated (all-gather), then slice
        x64 = jax.device_put(x64, NamedSharding(mesh, P("b", None, None)))
    x64 = x64[:, :h, :]
    return x64, total_iters, (rnorm / np.maximum(bnorm, 1e-300))


# ---------------------------------------------------------------------------
# 2-D spatial mesh (('b', 'y', 'x'), SURVEY §2.5 P6): rows shard over 'y',
# columns over 'x'. The 5-point stencil needs no corner ghosts, so the halo
# is one independent row exchange + one column exchange (halo.py). Block
# transfers stay halo-free in BOTH dims: rows and columns are padded so every
# distributed level splits evenly across both mesh axes, keeping each 2x2
# block inside one shard. The replicated tail gathers rows then columns.
# ---------------------------------------------------------------------------

_MIN_LOCAL_COLS = 8  # correctness floor; for perf keep local widths >= 256


def build_sharded_hierarchy_2d(
    umask: np.ndarray, deg: np.ndarray, ydim: int, xdim: int
):
    """2-D analog of :func:`build_sharded_hierarchy`: pad rows AND columns
    so every distributed level splits evenly over the (ydim, xdim) spatial
    mesh. Padded cells are inert (unknown=False, degree=1) so the operator
    on real cells is unchanged. Returns ((hp, wp), dist_levels, repl_levels).
    """
    m = np.asarray(umask, bool)
    h, w = m.shape
    depth = 0
    ph, pw = h, w
    while min(ph, pw) > M._MIN_SIZE:
        nh, nw = (ph + 1) // 2, (pw + 1) // 2
        if nh // ydim < _MIN_LOCAL_ROWS or nw // xdim < _MIN_LOCAL_COLS:
            break
        ph, pw = nh, nw
        depth += 1
    align_y = ydim * (1 << depth)
    align_x = xdim * (1 << depth)
    hp = -(-h // align_y) * align_y
    wp = -(-w // align_x) * align_x
    mp = np.zeros((hp, wp), dtype=bool)
    mp[:h, :w] = m
    dp = np.full((hp, wp), 1.0, dtype=np.float32)
    dp[:h, :w] = deg

    dist_levels = [(mp, dp)]
    cur = mp
    for _ in range(depth):
        ch, cw = cur.shape
        pooled = cur.reshape(ch // 2, 2, cw // 2, 2).all(axis=(1, 3))
        if pooled.all():
            break
        cur = pooled
        dist_levels.append((cur, neighbor_degree(cur.shape)))

    repl_levels = M.build_hierarchy(cur, neighbor_degree(cur.shape))
    return (hp, wp), dist_levels, repl_levels


def _stencil_sharded_2d(u, um, deg, ynm, xnm):
    """A(u) over a (row, col) tile: ghost rows from the 'y' neighbours plus
    ghost columns from the 'x' neighbours — two independent exchanges (no
    corner traffic for a 5-point stencil)."""
    masked = u * um
    h = u.shape[-2]
    w = u.shape[-1]
    rpad = halo_pad_rows(masked, ynm)
    cpad = halo_pad_cols(masked, xnm)
    s = (
        rpad[..., 0:h, :]
        + rpad[..., 2 : h + 2, :]
        + cpad[..., :, 0:w]
        + cpad[..., :, 2 : w + 2]
    )
    return (deg * u - s) * um


def _smooth_sharded_2d(u, b, um, deg, omegas, ynm, xnm):
    inv = jnp.where(deg > 0, 1.0 / deg, 0.0) * um
    for om in omegas:
        au = _stencil_sharded_2d(u, um, deg, ynm, xnm)
        u = u + om * (b - au) * inv
    return u


def _v_cycle_sharded_2d(dist_local, repl_levels_j, b, u, lvl, ynm, xnm, coarse_inv=None):
    um, deg = dist_local[lvl]
    pre = M._smoother_omegas(M._PRE_SMOOTH)
    post = tuple(reversed(M._smoother_omegas(M._POST_SMOOTH)))
    if lvl == len(dist_local) - 1:
        u = _smooth_sharded_2d(u, b, um, deg, pre, ynm, xnm)
        r = (b - _stencil_sharded_2d(u, um, deg, ynm, xnm)) * um
        r_full = lax.all_gather(r, ynm, axis=-2, tiled=True)
        r_full = lax.all_gather(r_full, xnm, axis=-1, tiled=True)
        e_full = M._v_cycle(
            repl_levels_j, r_full, jnp.zeros_like(r_full), 0, coarse_inv
        )
        hl, wl = u.shape[-2], u.shape[-1]
        yidx = lax.axis_index(ynm)
        xidx = lax.axis_index(xnm)
        e_local = lax.dynamic_slice_in_dim(e_full, yidx * hl, hl, axis=-2)
        e_local = lax.dynamic_slice_in_dim(e_local, xidx * wl, wl, axis=-1)
        u = u + e_local * um
        return _smooth_sharded_2d(u, b, um, deg, post, ynm, xnm)

    u = _smooth_sharded_2d(u, b, um, deg, pre, ynm, xnm)
    r = (b - _stencil_sharded_2d(u, um, deg, ynm, xnm)) * um
    # block restriction: per-level rows AND cols stay divisible by 2 inside
    # each shard (both dims padded to dim * 2^depth), so both passes are
    # local — no halo, bit-identical to the single-device block sum
    r_c = _restrict_rows_sharded(r)
    r_c = r_c[..., :, 0::2] + r_c[..., :, 1::2]
    um_c, _ = dist_local[lvl + 1]
    r_c = r_c * um_c
    e_c = _v_cycle_sharded_2d(
        dist_local, repl_levels_j, r_c, jnp.zeros_like(r_c), lvl + 1, ynm, xnm,
        coarse_inv,
    )
    e_f = _prolong_rows_sharded(e_c)
    e_f = jnp.repeat(e_f, 2, axis=-1)
    u = u + e_f * um
    return _smooth_sharded_2d(u, b, um, deg, post, ynm, xnm)


def sharded_mg_solve_2d(
    b: np.ndarray,
    x0: np.ndarray,
    umask: np.ndarray,
    deg: np.ndarray | None,
    mesh: Mesh,
    tolerance: float = 1e-6,
    max_iterations: int = 100,
):
    """MG-preconditioned CG over a ('b', 'y', 'x') mesh — the 2-D-tiled form
    of :func:`sharded_mg_solve`. Halves each shard's halo perimeter vs
    rows-only at equal device count and rides both ICI axes of a 2-D torus.
    """
    c, h, w = b.shape
    ydim = mesh.shape["y"]
    xdim = mesh.shape["x"]
    if deg is None:
        deg = neighbor_degree((h, w))
    (hp, wp), dist_levels, repl_levels = build_sharded_hierarchy_2d(
        umask, deg, ydim, xdim
    )

    def pad(a):
        return jnp.pad(
            jnp.asarray(a, jnp.float32),
            [(0, 0)] * (a.ndim - 2) + [(0, hp - h), (0, wp - w)],
        )

    spec = P("b", "y", "x")
    mspec = P("y", "x")
    b_p = jax.device_put(pad(np.asarray(b, np.float32)), NamedSharding(mesh, spec))
    x0_p = jax.device_put(pad(np.asarray(x0, np.float32)), NamedSharding(mesh, spec))

    dist_j = tuple(
        (
            jax.device_put(jnp.asarray(m_, jnp.float32), NamedSharding(mesh, mspec)),
            jax.device_put(jnp.asarray(d_, jnp.float32), NamedSharding(mesh, mspec)),
        )
        for m_, d_ in dist_levels
    )
    repl_j = tuple(
        (
            jax.device_put(jnp.asarray(m_), NamedSharding(mesh, P())),
            jax.device_put(jnp.asarray(d_), NamedSharding(mesh, P())),
        )
        for m_, d_ in repl_levels
    )
    m_c, d_c = repl_levels[-1]
    coarse_inv = (
        jax.device_put(
            M._dense_coarse_inverse(jnp.asarray(m_c), jnp.asarray(d_c, jnp.float32)),
            NamedSharding(mesh, P()),
        )
        if m_c.size <= M._DENSE_COARSE_MAX
        else None
    )

    tol = jnp.asarray(tolerance, jnp.float32)
    n_dist = len(dist_j)

    in_specs = (
        spec,
        spec,
        tuple((mspec, mspec) for _ in range(n_dist)),
        tuple((P(), P()) for _ in range(len(repl_j))),
        None if coarse_inv is None else P(),
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(spec, P(), P("b")),
    )
    def run(b_l, x0_l, dist_local, repl_local, cinv):
        um0, deg0 = dist_local[0]

        def dots(p, q):
            return lax.psum(jnp.sum(p * q, axis=(-2, -1)), ("y", "x"))

        def precond(r):
            return _v_cycle_sharded_2d(
                dist_local, repl_local, r, jnp.zeros_like(r), 0, "y", "x", cinv
            )

        bb = b_l * um0
        x = x0_l * um0
        r = (bb - _stencil_sharded_2d(x, um0, deg0, "y", "x")) * um0
        z = precond(r)
        p = z
        rz = dots(r, z)
        bs = dots(bb, bb)
        threshold = jnp.maximum(tol * tol * bs, jnp.finfo(jnp.float32).tiny)

        def cond(state):
            _, r_c, _, _, _, it = state
            rr = dots(r_c, r_c)
            flag = lax.psum(jnp.any(rr > threshold).astype(jnp.int32), "b")
            return jnp.logical_and(flag > 0, it < max_iterations)

        def body(state):
            x, r, p, z, rz, it = state
            ap = _stencil_sharded_2d(p, um0, deg0, "y", "x")
            pap = dots(p, ap)
            alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
            a = alpha[..., None, None]
            x = x + a * p
            r_new = r - a * ap
            z_new = precond(r_new)
            rz_new = dots(r_new, z_new)
            beta_num = rz_new - dots(r, z_new)
            beta = jnp.where(rz > 0, beta_num / jnp.where(rz > 0, rz, 1.0), 0.0)
            p = z_new + beta[..., None, None] * p
            return x, r_new, p, z_new, rz_new, it + 1

        x, r, p, z, rz, it = lax.while_loop(cond, body, (x, r, p, z, rz, jnp.int32(0)))
        return x, it, dots(r, r)

    solver = jax.jit(run)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, mspec, mspec),
        out_specs=(spec, P("b")),
    )
    def residual64(b64_l, x64_l, um_l, deg_l):
        um = um_l.astype(jnp.float64)
        r = b64_l * um - _stencil_sharded_2d(
            x64_l * um, um, deg_l.astype(jnp.float64), "y", "x"
        )
        r = r * um
        return r, lax.psum(jnp.sum(r * r, axis=(-2, -1)), ("y", "x"))

    umask_p = dist_j[0][0]
    deg_p = dist_j[0][1]
    b64 = b_p.astype(jnp.float64)
    x64 = x0_p.astype(jnp.float64) * umask_p.astype(jnp.float64)
    bnorm = np.asarray(
        jnp.sqrt(jnp.sum((b64 * umask_p.astype(jnp.float64)) ** 2, axis=(-2, -1)))
    )
    target = tolerance * np.maximum(bnorm, 1e-300)

    total_iters = 0
    r64, rsq = jax.jit(residual64)(b64, x64, umask_p, deg_p)
    rnorm = np.sqrt(np.asarray(rsq))
    for _ in range(3):
        if np.all(rnorm <= target):
            break
        d, it, _ = solver(
            r64.astype(jnp.float32), jnp.zeros_like(b_p), dist_j, repl_j, coarse_inv
        )
        total_iters += int(it)
        x64 = x64 + d.astype(jnp.float64) * umask_p.astype(jnp.float64)
        r64, rsq = jax.jit(residual64)(b64, x64, umask_p, deg_p)
        rnorm = np.sqrt(np.asarray(rsq))

    if hp != h or wp != w:
        x64 = jax.device_put(x64, NamedSharding(mesh, P("b", None, None)))
        x64 = x64[:, :h, :w]
    return x64, total_iters, (rnorm / np.maximum(bnorm, 1e-300))


def comm_volume_report_2d(
    h: int, w: int, c: int, ydim: int, xdim: int, umask: np.ndarray | None = None
) -> dict:
    """2-D counterpart of :func:`comm_volume_report`: per-shard halo bytes
    per PCG iteration for a ('b', 'y', 'x') mesh. Each exchange delivers 2
    ghost rows of the shard's LOCAL width (over 'y') plus 2 ghost columns of
    its LOCAL height (over 'x') — this is the per-shard accounting the 1-D
    report uses (there, local width == global width). Rows-only perimeter is
    2W regardless of device count; 2-D is 2W/xd + 2H/yd ~ 4W/sqrt(N), the
    scaling argument for the 2-D mesh."""
    if umask is None:
        m = np.ones((h, w), bool)
    else:
        m = np.asarray(umask, bool)
    deg = neighbor_degree(m.shape)
    (hp, wp), dist_levels, repl_levels = build_sharded_hierarchy_2d(m, deg, ydim, xdim)

    sweeps = M._PRE_SMOOTH + M._POST_SMOOTH
    per_level = []
    total_halo_bytes = 0
    for ml, _ in dist_levels:
        hl, wl = ml.shape
        exchanges = sweeps + 1
        halo_bytes = exchanges * (2 * (wl // xdim) + 2 * (hl // ydim)) * 4 * c
        per_level.append(
            {
                "level_shape": [int(hl), int(wl)],
                "halo_exchanges": int(exchanges),
                "halo_bytes": int(halo_bytes),
            }
        )
        total_halo_bytes += halo_bytes
    tail_h, tail_w = dist_levels[-1][0].shape
    n_spatial = ydim * xdim
    allgather_bytes = c * tail_h * tail_w * 4 * (n_spatial - 1) // max(n_spatial, 1)
    pcg_body_bytes = (2 * (w // xdim) + 2 * (h // ydim)) * 4 * c + 3 * 4 * c
    total = total_halo_bytes + allgather_bytes + pcg_body_bytes
    return {
        "grid": [int(hp), int(wp)],
        "bands": int(c),
        "ydim": int(ydim),
        "xdim": int(xdim),
        "distributed_levels": len(dist_levels),
        "replicated_levels": len(repl_levels),
        "local_tile_per_level": [
            [int(ml.shape[0]) // ydim, int(ml.shape[1]) // xdim]
            for ml, _ in dist_levels
        ],
        "per_level": per_level,
        "tail_allgather_bytes": int(allgather_bytes),
        "bytes_per_pcg_iteration": int(total),
    }


def comm_volume_report(
    h: int, w: int, c: int, xdim: int, umask: np.ndarray | None = None
) -> dict:
    """Analytic ICI communication volume of one sharded MG-PCG iteration —
    the comm-side telemetry for SURVEY §2.5 P6/P7 (the artifact VERDICT r2
    asked for alongside the iteration-parity check).

    Counts, per V-cycle level: one 2-ghost-row ppermute per smoother sweep
    (pre + post) and one for the residual stencil; the piecewise-constant
    block transfers are halo-free (each 2x2 block lives inside one shard).
    Plus the replicated tail's all_gather and the PCG body's A-apply
    exchange + 3 scalar psums. Bytes are f32.
    """
    if umask is None:
        m = np.ones((h, w), bool)
    else:
        m = np.asarray(umask, bool)
    deg = neighbor_degree(m.shape)
    (hp, wp), dist_levels, repl_levels = build_sharded_hierarchy(m, deg, xdim)

    sweeps = M._PRE_SMOOTH + M._POST_SMOOTH
    per_level = []
    total_halo_bytes = 0
    for lvl, (ml, _) in enumerate(dist_levels):
        hl, wl = ml.shape
        exchanges = sweeps + 1  # smoother sweeps + residual stencil
        # (block restriction/prolongation are local — no exchanges)
        halo_bytes = exchanges * 2 * wl * 4 * c  # 2 ghost rows per exchange
        per_level.append(
            {
                "level_shape": [int(hl), int(wl)],
                "halo_exchanges": int(exchanges),
                "halo_bytes": int(halo_bytes),
            }
        )
        total_halo_bytes += halo_bytes
    tail_h, tail_w = dist_levels[-1][0].shape
    allgather_bytes = c * tail_h * tail_w * 4 * (xdim - 1) // max(xdim, 1)
    pcg_body_bytes = 2 * w * 4 * c + 3 * 4 * c  # A-apply halo + 3 psums
    total = total_halo_bytes + allgather_bytes + pcg_body_bytes
    local_rows = [int(ml.shape[0]) // xdim for ml, _ in dist_levels]
    return {
        "grid": [int(hp), int(wp)],
        "bands": int(c),
        "xdim": int(xdim),
        "distributed_levels": len(dist_levels),
        "replicated_levels": len(repl_levels),
        "local_rows_per_level": local_rows,
        "per_level": per_level,
        "tail_allgather_bytes": int(allgather_bytes),
        "bytes_per_pcg_iteration": int(total),
        "compute_bytes_per_iteration_per_shard": int(
            # every level's smoother reads/writes ~5 arrays per sweep
            sum(5 * 4 * c * (ml.size // xdim) * sweeps for ml, _ in dist_levels)
        ),
    }
