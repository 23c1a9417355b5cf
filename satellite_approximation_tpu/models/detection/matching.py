"""Cloud-shadow matching by ray casting — the pipeline's hot loop.

Rebuild of lib/cloud_shadow_detection/source/CloudShadowMatching.cpp. The
reference triple-nests: per cloud, per hypothesis height (0.2..12 km in
0.025 steps → 473 candidates, CloudShadowMatching.cpp:139), per pixel of the
projected bbox — all single-threaded CPU. Here:

* the projective geometry (two perspectives + affine quad fit + inverse) is
  batched over (cloud × height) in one f64 einsum on the host — thousands of
  4x4 ops, microseconds;
* the per-pixel similarity scan becomes a device kernel over a statically
  sized window (dynamic_slice anchored at the projected bbox, masked to its
  true extent), scanned over heights with clouds vmapped — no host
  round-trips inside the sweep;
* clouds are bucketed by window size so each bucket compiles once.

Semantics match the reference pixel-for-pixel: candidate pixels are
non-cloud pixels inside the projected-quad bbox whose inverse-mapped
position (trunc-toward-zero, like glm's float→ivec2) lands on the cloud's
own id; similarity = |candidates ∩ potential-shadow| / |candidates|, with
<5-pixel support rejected (CloudShadowMatching.cpp:70-95) and a 0.3
similarity floor (CloudShadowMatching.cpp:154).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ...config import MatchingConfig
from ...ops import geometry
from ...ops.stats import trimmed_average
from .cloud_mask import CloudObject

_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
# device-sweep dispatch budgets (see match_clouds_shadows): cell-heights per
# dispatched program (bounds runtime under the ~60 s tunnel watchdog at the
# measured ~10 ms per height per cloud per 1024^2 window cells ≈ 14 s) and
# window cells per vmapped cloud group (bounds live VMEM/HBM intermediates)
_SWEEP_CELL_BUDGET = 1_500_000_000
_SWEEP_GROUP_CELLS = 1 << 27
# the separable shift-decomposed sweep does rx+ry+2 cheap select passes per
# cell-height instead of a per-pixel gather — measured ~50x faster, so its
# programs can pack far more cell-heights under the same watchdog bound
_SWEEP_CELL_BUDGET_SEP = 16 * _SWEEP_CELL_BUDGET
# max integer span of (qi - px) / (qj - py) over a window the decomposed
# kernel enumerates; spans beyond this (would need a >12 km cloud at a ~700
# km view distance) fall back to the gather kernel
_SEP_SPAN_CAP = 128
# static-shape quantization of the enumerated span (bounds recompiles)
_SEP_SPANS = (2, 4, 8, 16, 32, 64, _SEP_SPAN_CAP)


def height_sweep(config: MatchingConfig) -> np.ndarray:
    """The f32-accumulated height ladder, replicating the reference's
    ``for (z = .2f; z <= 12.f; z += .025f)`` float loop exactly
    (CloudShadowMatching.cpp:139)."""
    out = []
    z = np.float32(config.height_min_km)
    step = np.float32(config.height_step_km)
    while z <= np.float32(config.height_max_km):
        out.append(float(z))
        z = np.float32(z + step)
    return np.asarray(out, dtype=np.float64)


@dataclasses.dataclass
class OptimalSolution:
    """Best match per cloud (CloudShadowMatching.h OptimalSolution)."""

    height: float
    similarity: float
    M: np.ndarray  # 4x4 world→world shadow-cast transform
    id: int


@dataclasses.dataclass
class ShadowObject:
    """Matched shadow pixels of one cloud, stored as a window + anchor
    instead of the reference's pixel list (types.h Pixels)."""

    id: int
    # bbox of hit pixels in (x, y-from-bottom) coordinates; None if no match
    bounds: tuple[int, int, int, int] | None
    area: int
    # bool window; window[v, u] covers pixel (anchor_x + u, anchor_y + v)
    window: np.ndarray | None
    anchor: tuple[int, int] | None


@dataclasses.dataclass
class MatchCloudsShadowsResults:
    solutions: dict[int, OptimalSolution]
    shadows: dict[int, ShadowObject]
    trimmed_mean_height: float
    shadow_mask: np.ndarray  # (H, W) bool, top-left convention


def _cast_transforms(
    clouds: list[CloudObject],
    heights: np.ndarray,
    shape_hw: tuple[int, int],
    diagonal: float,
    sun_pos: np.ndarray,
    view_pos: np.ndarray,
):
    """Batched geometry for all (cloud, height) pairs.

    Returns A2 (Nc,Nh,2,2), delta (Nc,Nh,2), window bounds (Nc,Nh,4) and the
    full M (Nc,Nh,4,4) — the vectorization of __MatchCloudShadow__'s
    per-height perspective/affineTransform block (CloudShadowMatching.cpp:139-143).
    """
    h, w = shape_hw
    corners = np.stack([c.quad.corners() for c in clouds])  # (Nc,4,3)
    c = corners[:, None, :, :]  # (Nc,1,4,3)
    z = heights[None, :, None]  # (1,Nh,1)

    # perspective through the height plane toward the satellite
    d1 = view_pos[None, None, None, :] - c
    t1 = (z[..., None] * np.ones_like(c[..., :1]) - c[..., 2:3]) / d1[..., 2:3]
    p1 = c + d1 * t1
    # then through the ground plane toward the sun
    d2 = sun_pos[None, None, None, :] - p1
    t2 = -p1[..., 2:3] / d2[..., 2:3]
    p2 = p1 + d2 * t2  # (Nc,Nh,4,3)

    ones = np.ones((*p2.shape[:-1], 1))
    x2 = np.concatenate([p2, ones], axis=-1)  # rows are corners
    x2 = np.swapaxes(x2, -1, -2)  # corners as columns (4,4)
    x1 = np.concatenate([corners, np.ones((corners.shape[0], 4, 1))], axis=-1)
    x1 = np.swapaxes(x1, -1, -2)
    # The quad corners all lie in z=0, so x1 is rank-3 singular. The
    # reference feeds it to Eigen's FullPivHouseholderQr inverse anyway
    # (Functions.cpp:84) — an ill-defined operation on a singular matrix.
    # The well-defined equivalent is the minimum-norm least-squares affine
    # fit M = x2 @ pinv(x1); for the near-affine sun/view projections the
    # fit residual is negligible.
    x1inv = np.linalg.pinv(x1)  # (Nc,4,4)
    m = np.einsum("cnij,cjk->cnik", x2, x1inv)
    m[..., 2, 2] = 1.0  # make invertible (CloudShadowMatching.cpp:144)
    minv = np.linalg.inv(m)

    ratio_r = np.sqrt(float(w) * w + float(h) * h) / diagonal
    a2 = minv[..., :2, :2]
    delta = np.einsum(
        "cnij,j->cni", minv, np.array([0.5, 0.5, 0.0, ratio_r])
    )[..., :2]

    # projected-quad window bounds (CloudShadowMatching.cpp:33-55)
    hom = np.concatenate([corners, np.ones((corners.shape[0], 4, 1))], axis=-1)
    cast = np.einsum("cnij,ckj->cnki", m, hom)[..., :3]  # (Nc,Nh,4,3)
    idx = geometry.world_to_index(shape_hw, diagonal, cast)  # (Nc,Nh,4,2)
    min_x = np.clip(idx[..., 0].min(axis=-1), 0, w - 1)
    max_x = np.clip(idx[..., 0].max(axis=-1), 0, w - 1)
    min_y = np.clip(idx[..., 1].min(axis=-1), 0, h - 1)
    max_y = np.clip(idx[..., 1].max(axis=-1), 0, h - 1)
    return a2, delta, (min_x, max_x, min_y, max_y), m


@functools.partial(
    jax.jit,
    static_argnames=("wb", "hb", "width", "height", "pf", "min_support"),
)
def _bucket_sweep(
    cmask_f, psm_f, cmap_f, ids, min_x, min_y, max_x, max_y, a2, delta,
    wb: int, hb: int, width: int, height: int, pf: int = 0,
    min_support: int = 5,
):
    """Similarity of every (height, cloud) pair in one bucket.

    Scans the height axis sequentially (bounded memory) with all clouds of
    the bucket evaluated together; each step is one fused window pass.
    ``pf``: front padding of the shared device arrays (logical index 0 sits
    at padded index pf).
    """
    u = jnp.arange(wb, dtype=jnp.int32)[None, :]
    v = jnp.arange(hb, dtype=jnp.int32)[:, None]

    def one_cloud(cid, mnx, mny, mxx, mxy, a2c, dc):
        cm = lax.dynamic_slice(cmask_f, (pf + mny, pf + mnx), (hb, wb))
        ps = lax.dynamic_slice(psm_f, (pf + mny, pf + mnx), (hb, wb))
        px = mnx + u
        py = mny + v
        in_win = (px <= mxx) & (py <= mxy)
        fx = px.astype(jnp.float32)
        fy = py.astype(jnp.float32)
        qx = a2c[0, 0] * fx + a2c[0, 1] * fy + dc[0]
        qy = a2c[1, 0] * fx + a2c[1, 1] * fy + dc[1]
        qi = qx.astype(jnp.int32)  # trunc toward zero, like glm ivec2
        qj = qy.astype(jnp.int32)
        validq = (qi >= 0) & (qi < width) & (qj >= 0) & (qj < height)
        at_cloud = cmap_f[
            pf + jnp.clip(qj, 0, height - 1), pf + jnp.clip(qi, 0, width - 1)
        ]
        cand = in_win & (~cm) & validq & (at_cloud == cid)
        hit = cand & ps
        return jnp.sum(cand, dtype=jnp.int32), jnp.sum(hit, dtype=jnp.int32)

    def step(_, args):
        mnx, mny, mxx, mxy, a2h, dh = args
        t, c = jax.vmap(one_cloud)(ids, mnx, mny, mxx, mxy, a2h, dh)
        sim = jnp.where(
            t >= min_support,
            c.astype(jnp.float32) / t.astype(jnp.float32),
            jnp.float32(-1.1),
        )
        return None, sim

    # height-major scan: args arrays are (Nh, Nc, ...)
    _, sims = lax.scan(step, None, (min_x, min_y, max_x, max_y, a2, delta))
    return sims  # (Nh, Nc)


def _quantize_span(span: int) -> int | None:
    for s in _SEP_SPANS:
        if span <= s:
            return s
    return None


def _sep_metadata(a2f, dlf, mnx, mny, wb, hb, width, height):
    """Separability metadata for one (bucket, height-chunk) group.

    The matching affine is the composition of two point-projections between
    parallel planes — a homothety, so its linear part is (scale)*I and the
    off-diagonal terms are pure least-squares-fit noise (~1e-14; see
    benchmarks/x_affine_probe.py). In the f32 arithmetic of the device
    kernel the cross terms are then absorbed below the ULP of the diagonal
    terms, making qi a function of the column alone and qj of the row
    alone. This PROVES that bit-wise per group, with a monotone pinch
    check: f32 ops are monotone, so if the window's two extreme rows yield
    bit-identical qx for every column, every row in between does too
    (same op order as `_bucket_sweep`'s qx/qy; HLO has no FMA op, so
    XLA's f32 mul/add are the same correctly-rounded two-step sums numpy
    computes here).

    Returns (ok, sx, sy, rx, ry): per-(cloud, height) pinch verdicts and
    int32 source anchors (min valid qi/qj), plus the group's worst integer
    shift spans. All inputs are the f32-cast values the device receives.
    """
    a00 = a2f[..., 0, 0][..., None]
    a01 = a2f[..., 0, 1][..., None]
    a10 = a2f[..., 1, 0][..., None]
    a11 = a2f[..., 1, 1][..., None]
    d0 = dlf[..., 0][..., None]
    d1 = dlf[..., 1][..., None]

    fx = (mnx[..., None] + np.arange(wb, dtype=np.int64)).astype(np.float32)
    fy = (mny[..., None] + np.arange(hb, dtype=np.int64)).astype(np.float32)
    x_col = a00 * fx  # (..., wb) f32
    v_row = a11 * fy  # (..., hb) f32

    y_lo = (a01 * mny[..., None].astype(np.float32)).astype(np.float32)
    y_hi = (a01 * (mny[..., None] + (hb - 1)).astype(np.float32)).astype(
        np.float32
    )
    u_lo = (a10 * mnx[..., None].astype(np.float32)).astype(np.float32)
    u_hi = (a10 * (mnx[..., None] + (wb - 1)).astype(np.float32)).astype(
        np.float32
    )

    qx = (x_col + y_lo) + d0
    ok_x = (qx == ((x_col + y_hi) + d0)).all(axis=-1)
    qy = (u_lo + v_row) + d1
    ok_y = (qy == ((u_hi + v_row) + d1)).all(axis=-1)
    ok = ok_x & ok_y

    def anchor_span(q, limit, n):
        """Anchor/span of the RELATIVE shift qi - p over valid pixels:
        q - p =~ (scale-1)*p + translation spans only a few integers even
        though q itself spans the whole window."""
        qi = q.astype(np.int32)
        valid = (q > np.float32(-1.0)) & (q < np.float32(limit)) & (qi >= 0) & (
            qi < limit
        )
        rel = qi - np.arange(n, dtype=np.int32)
        lo = np.where(valid, rel, 2**30).min(axis=-1)
        hi = np.where(valid, rel, -(2**30)).max(axis=-1)
        any_valid = valid.any(axis=-1)
        # +-1 guard band: covers host/device cast edge cases at no cost
        lo = np.where(any_valid, lo - 1, 0)
        hi = np.where(any_valid, hi + 1, 0)
        return lo.astype(np.int32), int(np.maximum(hi - lo, 0).max())

    sx, rx = anchor_span(qx, width, wb)
    sy, ry = anchor_span(qy, height, hb)
    return ok, sx, sy, rx, ry


@functools.partial(
    jax.jit,
    static_argnames=(
        "rx", "ry", "wb", "hb", "width", "height", "pf", "min_support"
    ),
)
def _bucket_sweep_sep(
    cmask_f, psm_f, cmap_f, ids, min_x, min_y, max_x, max_y, a2, delta,
    src_x, src_y,
    rx: int, ry: int, wb: int, hb: int, width: int, height: int, pf: int,
    min_support: int = 5,
):
    """Gather-free similarity sweep for separable (pure-homothety) casts.

    Bit-equal to `_bucket_sweep` whenever `_sep_metadata` vouches for the
    group (tests/test_detection.py::TestSeparableSweep): the irregular
    per-pixel gather ``cmap[qj, qi]`` factors into one dynamic_slice at the
    source anchor plus (rx+1) column-shift and (ry+1) row-shift select
    passes — pure VPU work, no gather. This is what makes the all-device
    matching route fast at full-tile scale (the gather runs ~10 ms per
    height per 1024^2 window; this runs the same window in ~tens of us).

    ``pf``: front padding of the shared device arrays — the source anchor
    (min of qi - px over the window) is negative whenever the shadow is
    cast toward lower indices, bounded by the window size which the pads
    cover by construction.
    """
    u = jnp.arange(wb, dtype=jnp.int32)
    v = jnp.arange(hb, dtype=jnp.int32)

    def one_cloud(cid, mnx, mny, mxx, mxy, a2c, dc, sx, sy):
        fx = (mnx + u).astype(jnp.float32)
        fy = (mny + v).astype(jnp.float32)
        # same op order as _bucket_sweep's qx/qy with the cross term pinned
        # at the window corner (any row/column gives the identical f32
        # value per the host pinch check)
        y0 = a2c[0, 1] * mny.astype(jnp.float32)
        u0 = a2c[1, 0] * mnx.astype(jnp.float32)
        qx = (a2c[0, 0] * fx + y0) + dc[0]  # (wb,)
        qy = (u0 + a2c[1, 1] * fy) + dc[1]  # (hb,)
        qi = qx.astype(jnp.int32)
        qj = qy.astype(jnp.int32)
        validc = (qi >= 0) & (qi < width)
        validr = (qj >= 0) & (qj < height)
        dxs = qi - u - sx  # relative shift, in [0, rx] wherever valid
        dys = qj - v - sy

        # slice rows r cover source rows sy+mny'+... : S[r, c] =
        # cmap[sy + r - pf', ...]; composing the two shift stages reads
        # S[v + dys[v], u + dxs[u]] = cmap[qj(v), qi(u)] exactly
        seq = (
            lax.dynamic_slice(
                cmap_f, (pf + sy, pf + sx), (hb + ry, wb + rx)
            )
            == cid
        )
        w_acc = jnp.zeros((hb + ry, wb), dtype=bool)
        for dx in range(rx + 1):
            w_acc = w_acc | ((dxs == dx)[None, :] & seq[:, dx : dx + wb])
        at_cloud = jnp.zeros((hb, wb), dtype=bool)
        for dy in range(ry + 1):
            at_cloud = at_cloud | ((dys == dy)[:, None] & w_acc[dy : dy + hb, :])

        cm = lax.dynamic_slice(cmask_f, (pf + mny, pf + mnx), (hb, wb))
        ps = lax.dynamic_slice(psm_f, (pf + mny, pf + mnx), (hb, wb))
        px = mnx + u[None, :]
        py = mny + v[:, None]
        in_win = (px <= mxx) & (py <= mxy)
        cand = in_win & (~cm) & validr[:, None] & validc[None, :] & at_cloud
        hit = cand & ps
        return jnp.sum(cand, dtype=jnp.int32), jnp.sum(hit, dtype=jnp.int32)

    def step(_, args):
        mnx, mny, mxx, mxy, a2h, dh, sxh, syh = args
        t, c = jax.vmap(one_cloud)(ids, mnx, mny, mxx, mxy, a2h, dh, sxh, syh)
        sim = jnp.where(
            t >= min_support,
            c.astype(jnp.float32) / t.astype(jnp.float32),
            jnp.float32(-1.1),
        )
        return None, sim

    _, sims = lax.scan(
        step, None, (min_x, min_y, max_x, max_y, a2, delta, src_x, src_y)
    )
    return sims  # (Nh, Nc)


@functools.partial(
    jax.jit, static_argnames=("wb", "hb", "width", "height", "pf")
)
def _bucket_detail(
    cmask_f, psm_f, cmap_f, ids, min_x, min_y, max_x, max_y, a2, delta,
    wb: int, hb: int, width: int, height: int, pf: int = 0,
):
    """Hit windows + hit-pixel bounds at each cloud's best height."""
    u = jnp.arange(wb, dtype=jnp.int32)[None, :]
    v = jnp.arange(hb, dtype=jnp.int32)[:, None]
    big = jnp.int32(2**30)

    def one_cloud(cid, mnx, mny, mxx, mxy, a2c, dc):
        cm = lax.dynamic_slice(cmask_f, (pf + mny, pf + mnx), (hb, wb))
        ps = lax.dynamic_slice(psm_f, (pf + mny, pf + mnx), (hb, wb))
        px = mnx + u
        py = mny + v
        in_win = (px <= mxx) & (py <= mxy)
        fx = px.astype(jnp.float32)
        fy = py.astype(jnp.float32)
        qx = a2c[0, 0] * fx + a2c[0, 1] * fy + dc[0]
        qy = a2c[1, 0] * fx + a2c[1, 1] * fy + dc[1]
        qi = qx.astype(jnp.int32)
        qj = qy.astype(jnp.int32)
        validq = (qi >= 0) & (qi < width) & (qj >= 0) & (qj < height)
        at_cloud = cmap_f[
            pf + jnp.clip(qj, 0, height - 1), pf + jnp.clip(qi, 0, width - 1)
        ]
        cand = in_win & (~cm) & validq & (at_cloud == cid)
        hit = cand & ps
        t = jnp.sum(cand, dtype=jnp.int32)
        c = jnp.sum(hit, dtype=jnp.int32)
        bx0 = jnp.min(jnp.where(hit, px, big))
        by0 = jnp.min(jnp.where(hit, py, big))
        bx1 = jnp.max(jnp.where(hit, px, -big))
        by1 = jnp.max(jnp.where(hit, py, -big))
        # hit windows cross the link bit-packed (big-endian per 8-column
        # block, np.unpackbits(axis=-1)-compatible; wb is a power of two
        # >= 8) — the windows dominate the detail fetch bytes
        shifts = jnp.asarray([7, 6, 5, 4, 3, 2, 1, 0], jnp.uint8)
        packed = (
            (hit.reshape(hb, wb // 8, 8).astype(jnp.uint8) << shifts)
            .sum(axis=-1)
            .astype(jnp.uint8)
        )
        return t, c, packed, bx0, by0, bx1, by1

    return jax.vmap(one_cloud)(ids, min_x, min_y, max_x, max_y, a2, delta)


def _bucket_size(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return _BUCKETS[-1]


def _match_native(
    clouds, cloud_map, cloud_mask, potential_shadow, config,
    a2, delta, mnx, mxx, mny, mxy, m_all,
    heights, solutions, shadows, shadow_mask_flipped,
):
    """Per-cloud 473-height scan on the native backend (exact per-height
    bounding boxes — no bucket padding)."""
    from ... import native

    hgt, wdt = cloud_mask.shape
    from ...ops.masks import fetch_mask

    cmask_f = np.ascontiguousarray(np.flipud(fetch_mask(cloud_mask)))
    psm_f = np.ascontiguousarray(np.flipud(fetch_mask(potential_shadow)))
    cmap_f = np.ascontiguousarray(np.flipud(np.asarray(cloud_map, np.int32)))

    for k, cloud in enumerate(clouds):
        cid = cloud.id
        sims = native.cloud_sweep(
            cmask_f, psm_f, cmap_f, wdt, hgt, cid,
            mnx[k], mny[k], mxx[k], mxy[k], a2[k], delta[k],
            config.min_support_pixels,
        )
        hsel = int(np.argmax(sims))  # first max, like `>` keeps first
        best = float(sims[hsel])
        if best < config.min_similarity:
            solutions[cid] = OptimalSolution(
                height=0.0, similarity=-1.0, M=np.eye(4), id=cid
            )
            shadows[cid] = ShadowObject(
                id=cid, bounds=None, area=0, window=None, anchor=None
            )
            continue
        x0, y0 = int(mnx[k, hsel]), int(mny[k, hsel])
        wb = int(mxx[k, hsel]) - x0 + 1
        hb = int(mxy[k, hsel]) - y0 + 1
        t, c, win, bx0, by0, bx1, by1 = native.cloud_detail(
            cmask_f, psm_f, cmap_f, wdt, hgt, cid,
            (x0, y0, int(mxx[k, hsel]), int(mxy[k, hsel])),
            a2[k, hsel], delta[k, hsel], hb, wb,
        )
        solutions[cid] = OptimalSolution(
            height=float(heights[hsel]), similarity=best, M=m_all[k, hsel], id=cid
        )
        shadows[cid] = ShadowObject(
            id=cid, bounds=(bx0, by0, bx1, by1), area=c, window=win,
            anchor=(x0, y0),
        )
        h_keep = min(hb, hgt - y0)
        w_keep = min(wb, wdt - x0)
        shadow_mask_flipped[y0 : y0 + h_keep, x0 : x0 + w_keep] |= win[
            :h_keep, :w_keep
        ]


def match_clouds_shadows(
    clouds: list[CloudObject],
    cloud_map: np.ndarray,
    cloud_mask: np.ndarray,
    potential_shadow: np.ndarray,
    diagonal: float,
    sun_pos: np.ndarray,
    view_pos: np.ndarray,
    config: MatchingConfig = MatchingConfig(),
    timer=None,
    use_native: bool | None = None,
    sweep_fn=None,
) -> MatchCloudsShadowsResults:
    """Match every cloud to its shadow (CloudShadowMatching.cpp:168-197).

    Two equivalent backends (equality-tested in tests/test_detection.py):
    the batched XLA bucket sweep, and the native C++ scan. The device
    sweep routes separable (pure-homothety) casts — structurally, all of
    them — to the gather-free shift-decomposed kernel; measured at full
    tile it beats the single-core native scan ~50x (results_r03 config 6:
    4.75 s warm at 4096^2 vs ~290 s native at 10980^2), so "auto" takes
    the device sweep for big scenes on a real TPU and the native scan
    otherwise (small scenes are dispatch-latency-bound on a tunneled
    host). ``use_native=False`` forces the device path.

    ``sweep_fn``: optional replacement for the similarity-sweep kernel
    (same call contract as :func:`_bucket_sweep`) — the hook
    :mod:`parallel.detect` uses to run the sweep sharded over a device
    mesh while sharing ALL of this function's orchestration (bucketing,
    chunking, detail extraction, mask compositing). Forces the jax route.
    """
    if timer is None:
        from ...utils.profiling import StageTimer

        timer = StageTimer()
    if sweep_fn is not None:
        use_native = False
    if use_native is None:
        from ... import native

        if config.backend == "native":
            use_native = True
        elif config.backend == "jax":
            use_native = False
        else:
            from ...config import BIG_SCENE_PIXELS

            big_scene = cloud_mask.size >= BIG_SCENE_PIXELS
            use_native = native.available() and not (
                big_scene and jax.default_backend() == "tpu"
            )
    hgt, wdt = cloud_mask.shape
    heights = height_sweep(config)

    shadow_mask_flipped = np.zeros((hgt, wdt), dtype=bool)
    solutions: dict[int, OptimalSolution] = {}
    shadows: dict[int, ShadowObject] = {}

    if clouds and use_native:
        with timer.stage("matching/cast transforms"):
            a2, delta, (mnx, mxx, mny, mxy), m_all = _cast_transforms(
                clouds, heights, (hgt, wdt), diagonal, sun_pos, view_pos
            )
        with timer.stage("matching/native scan"):
            _match_native(
                clouds, cloud_map, cloud_mask, potential_shadow, config,
                a2, delta, mnx, mxx, mny, mxy, m_all,
                heights, solutions, shadows, shadow_mask_flipped,
            )
    elif clouds:
        with timer.stage("matching/cast transforms"):
            a2, delta, (mnx, mxx, mny, mxy), m_all = _cast_transforms(
                clouds, heights, (hgt, wdt), diagonal, sun_pos, view_pos
            )

        # windows wider than the largest bucket would be silently truncated
        # by the padded device sweep (in_win never reaches past the bucket);
        # such giant-cloud windows are rare — scan them exactly on the
        # native backend (exact per-height bboxes, no padding)
        ext_x_all = (mxx - mnx + 1).max(axis=1)
        ext_y_all = (mxy - mny + 1).max(axis=1)
        oversized = (ext_x_all > _BUCKETS[-1]) | (ext_y_all > _BUCKETS[-1])
        if oversized.any():
            from ... import native

            over = [k for k in range(len(clouds)) if oversized[k]]
            if native.available():
                with timer.stage("matching/native scan (oversized windows)"):
                    _match_native(
                        [clouds[k] for k in over], cloud_map, cloud_mask,
                        potential_shadow, config,
                        a2[over], delta[over], mnx[over], mxx[over],
                        mny[over], mxy[over], m_all[over],
                        heights, solutions, shadows, shadow_mask_flipped,
                    )
                keep = [k for k in range(len(clouds)) if not oversized[k]]
                clouds = [clouds[k] for k in keep]
                a2, delta, m_all = a2[keep], delta[keep], m_all[keep]
                mnx, mxx = mnx[keep], mxx[keep]
                mny, mxy = mny[keep], mxy[keep]
            else:
                import warnings

                warnings.warn(
                    f"{len(over)} cloud window(s) exceed the {_BUCKETS[-1]}px "
                    "device bucket cap and the native library is unavailable; "
                    "their scan windows are truncated to the cap",
                    RuntimeWarning,
                    stacklevel=2,
                )

    if clouds and not use_native:
        # flipped (bottom-origin-row) arrays, padded so dynamic_slice never
        # clamps — flip/pad ON DEVICE: host inputs upload their raw bytes
        # once, device-resident inputs (the all-device pipeline route) never
        # round-trip the link at all
        ext_x = (mxx - mnx + 1).max(axis=1)  # (Nc,)
        ext_y = (mxy - mny + 1).max(axis=1)
        # back pads: target slices reach wdt-1 + wb, plus rx span slack for
        # the separable sweep's source slice. Front pads (pf): the source
        # anchor min(qi - px) is negative whenever the shadow is cast
        # toward lower indices, bounded by the window size.
        base_w = int(min(_bucket_size(int(ext_x.max())), _BUCKETS[-1]))
        base_h = int(min(_bucket_size(int(ext_y.max())), _BUCKETS[-1]))
        pad_w = base_w + _SEP_SPAN_CAP
        pad_h = base_h + _SEP_SPAN_CAP
        pf = max(base_w, base_h) + _SEP_SPAN_CAP
        # host rasters cross the link compact: bool masks bit-packed (8x),
        # the id map narrowed to i16 when ids fit (2x) — at full tile this
        # is ~660 MB -> ~270 MB of H2D
        from ...ops.masks import push_mask

        cmap_host = cloud_map
        if isinstance(cmap_host, np.ndarray) and len(clouds) < 2**15 - 1:
            cmap_host = cmap_host.astype(np.int16)
        cmask_j = jnp.pad(
            jnp.flipud(push_mask(cloud_mask)), ((pf, pad_h), (pf, pad_w))
        )
        psm_j = jnp.pad(
            jnp.flipud(push_mask(potential_shadow)),
            ((pf, pad_h), (pf, pad_w)),
        )
        cmap_j = jnp.pad(
            jnp.flipud(jnp.asarray(cmap_host).astype(jnp.int32)),
            ((pf, pad_h), (pf, pad_w)),
            constant_values=-2,
        )

        buckets: dict[tuple[int, int], list[int]] = {}
        for k in range(len(clouds)):
            key = (_bucket_size(int(ext_x[k])), _bucket_size(int(ext_y[k])))
            buckets.setdefault(key, []).append(k)

        heights_f32 = height_sweep(config)
        nh = len(heights_f32)
        bucket_groups = []
        for (wb, hb), members in buckets.items():
            # cloud groups bound the vmap's live memory (each member holds
            # ~6 window-sized intermediates per scan step)
            grp = max(1, int(_SWEEP_GROUP_CELLS // (wb * hb)))
            for g0 in range(0, len(members), grp):
                bucket_groups.append(((wb, hb), members[g0 : g0 + grp]))
        # Pipelined schedule over bucket groups. The device runs programs
        # in dispatch order on one stream; the old loop blocked on each
        # bucket's sims D2H before dispatching the next bucket, so the
        # device idled through every host argmax / detail stream /
        # window composite (~25 ms RTT + the packed-window fetch per
        # bucket). Here a 2-deep lookahead keeps sweep programs queued
        # ahead while the host drains earlier buckets — detail programs
        # slot in behind at most two buckets of sweeps, and their D2H
        # streams overlap later sweeps. Same programs, same results.
        import collections

        pending = collections.deque()
        group_iter = iter(bucket_groups)

        def _dispatch_group():
            try:
                (wb, hb), members = next(group_iter)
            except StopIteration:
                return False
            sel = np.asarray(members)
            ids = jnp.asarray([clouds[k].id for k in sel], jnp.int32)
            with timer.stage(f"matching/sweep {wb}x{hb} n={len(sel)}"):
                # the height scan is chunked into separately dispatched
                # programs: one program scanning all 473 heights over a
                # big-window bucket can exceed accelerator watchdog limits
                # (tunneled runtimes kill ~60 s programs), and chunking
                # costs only a host concat. The chunk size scales inversely
                # with the group's window cells — the gather-dominated
                # sweep runs ~10 ms per height per cloud per 1024^2 window
                # cells, so a fixed 128-height chunk over a 4096^2 bucket
                # was minutes per dispatch (observed as a watchdog-killed
                # "TPU worker crashed" at full-tile scale)
                cells = max(len(sel) * wb * hb, 1)
                ch_gather = max(
                    1,
                    min(int(config.jax_height_chunk), int(_SWEEP_CELL_BUDGET // cells)),
                )
                ch_sep = max(1, int(_SWEEP_CELL_BUDGET_SEP // cells))
                parts = []
                h0 = 0
                while h0 < nh:
                    h1 = min(h0 + ch_sep, nh)

                    def chunk_args(g0, g1):
                        return dict(
                            min_x=jnp.asarray(mnx[sel].T[g0:g1], jnp.int32),
                            min_y=jnp.asarray(mny[sel].T[g0:g1], jnp.int32),
                            max_x=jnp.asarray(mxx[sel].T[g0:g1], jnp.int32),
                            max_y=jnp.asarray(mxy[sel].T[g0:g1], jnp.int32),
                            a2=jnp.asarray(
                                np.swapaxes(a2[sel], 0, 1)[g0:g1], jnp.float32
                            ),
                            delta=jnp.asarray(
                                np.swapaxes(delta[sel], 0, 1)[g0:g1], jnp.float32
                            ),
                        )

                    # separability metadata on the exact f32 values the
                    # device sees; routes this chunk to the gather-free
                    # kernel whenever the pinch check vouches for it
                    use_sep = False
                    if sweep_fn is None:
                        ok, sx, sy, rx_span, ry_span = _sep_metadata(
                            np.swapaxes(a2[sel], 0, 1)[h0:h1].astype(np.float32),
                            np.swapaxes(delta[sel], 0, 1)[h0:h1].astype(np.float32),
                            mnx[sel].T[h0:h1], mny[sel].T[h0:h1],
                            wb, hb, wdt, hgt,
                        )
                        rx = _quantize_span(rx_span)
                        ry = _quantize_span(ry_span)
                        use_sep = (
                            bool(ok.all()) and rx is not None and ry is not None
                        )
                    # async dispatch: chunks queue on the device back-to-back;
                    # ONE batched fetch below instead of a blocking D2H (a
                    # link RTT) per chunk
                    if sweep_fn is not None:
                        for g0 in range(h0, h1, ch_gather):
                            g1 = min(g0 + ch_gather, h1)
                            parts.append(
                                sweep_fn(
                                    cmask_j, psm_j, cmap_j, ids,
                                    **chunk_args(g0, g1),
                                    wb=wb, hb=hb, width=wdt, height=hgt,
                                    pf=pf, min_support=config.min_support_pixels,
                                )
                            )
                    elif use_sep:
                        parts.append(
                            _bucket_sweep_sep(
                                cmask_j, psm_j, cmap_j, ids, **chunk_args(h0, h1),
                                src_x=jnp.asarray(sx, jnp.int32),
                                src_y=jnp.asarray(sy, jnp.int32),
                                rx=rx, ry=ry, wb=wb, hb=hb, width=wdt, height=hgt,
                                pf=pf, min_support=config.min_support_pixels,
                            )
                        )
                    else:
                        for g0 in range(h0, h1, ch_gather):
                            g1 = min(g0 + ch_gather, h1)
                            parts.append(
                                _bucket_sweep(
                                    cmask_j, psm_j, cmap_j, ids,
                                    **chunk_args(g0, g1),
                                    wb=wb, hb=hb, width=wdt, height=hgt,
                                    pf=pf, min_support=config.min_support_pixels,
                                )
                            )
                    h0 = h1
            pending.append(((wb, hb), sel, ids, parts))
            return True

        _LOOKAHEAD = 2
        for _ in range(_LOOKAHEAD + 1):
            _dispatch_group()
        while pending:
            (wb, hb), sel, ids, parts = pending.popleft()
            with timer.stage(f"matching/sweep wait {wb}x{hb} n={len(sel)}"):
                sims = np.concatenate(jax.device_get(parts), axis=0)  # (Nh, Nsel)
            best_idx = np.argmax(sims, axis=0)  # first max, like `>` keeps first
            best_sim = sims[best_idx, np.arange(len(sel))]

            with timer.stage(f"matching/detail {wb}x{hb} n={len(sel)}"):
                detail = _bucket_detail(
                    cmask_j, psm_j, cmap_j, ids,
                    min_x=jnp.asarray(mnx[sel, best_idx], jnp.int32),
                    min_y=jnp.asarray(mny[sel, best_idx], jnp.int32),
                    max_x=jnp.asarray(mxx[sel, best_idx], jnp.int32),
                    max_y=jnp.asarray(mxy[sel, best_idx], jnp.int32),
                    a2=jnp.asarray(a2[sel, best_idx], jnp.float32),
                    delta=jnp.asarray(delta[sel, best_idx], jnp.float32),
                    wb=wb, hb=hb, width=wdt, height=hgt, pf=pf,
                )
            # feed the device before blocking on the detail stream
            _dispatch_group()
            with timer.stage(f"matching/detail fetch {wb}x{hb}"):
                # one batched D2H: per-array fetches each pay a tunnel RTT;
                # hit windows arrive bit-packed, unpack at memory speed
                t_arr, c_arr, hits_u8, bx0, by0, bx1, by1 = jax.device_get(detail)
                hits = np.unpackbits(hits_u8, axis=-1).astype(bool)

            for n, k in enumerate(sel):
                cid = clouds[k].id
                if best_sim[n] < config.min_similarity:
                    solutions[cid] = OptimalSolution(
                        height=0.0, similarity=-1.0, M=np.eye(4), id=cid
                    )
                    shadows[cid] = ShadowObject(
                        id=cid, bounds=None, area=0, window=None, anchor=None
                    )
                    continue
                hsel = int(best_idx[n])
                solutions[cid] = OptimalSolution(
                    height=float(heights_f32[hsel]),
                    similarity=float(best_sim[n]),
                    M=m_all[k, hsel],
                    id=cid,
                )
                anchor = (int(mnx[k, hsel]), int(mny[k, hsel]))
                win = hits[n]
                shadows[cid] = ShadowObject(
                    id=cid,
                    bounds=(int(bx0[n]), int(by0[n]), int(bx1[n]), int(by1[n])),
                    area=int(c_arr[n]),
                    window=win,
                    anchor=anchor,
                )
                # composite into the object-based shadow mask
                ax, ay = anchor
                h_keep = min(hb, hgt - ay)
                w_keep = min(wb, wdt - ax)
                shadow_mask_flipped[ay : ay + h_keep, ax : ax + w_keep] |= win[
                    :h_keep, :w_keep
                ]

    accepted_heights = [
        s.height for s in solutions.values() if s.height >= config.height_min_km
    ]
    trimmed = trimmed_average(np.asarray(accepted_heights), config.trim_lo, config.trim_hi)

    return MatchCloudsShadowsResults(
        solutions=solutions,
        shadows=shadows,
        trimmed_mean_height=trimmed,
        shadow_mask=np.flipud(shadow_mask_flipped).copy(),
    )
