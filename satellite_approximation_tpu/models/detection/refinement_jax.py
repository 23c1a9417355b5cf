"""Device (jit) backend for the probability-refinement stages.

The host backend in :mod:`refinement` replicates the reference's numerics
(ProbabilityRefinement.cpp) with numpy/scipy; this module provides the same
stages as XLA programs — equality-tested against the host backend in
tests/test_refinement_jax.py:

* :func:`alpha_map_jax` — the logistic remap, elementwise on device;
* :func:`beta_map_jax` — the per-shadow radial falloff, bucketed into
  statically-shaped influence windows (the same bucket strategy as
  matching) and evaluated by ONE fused program per bucket: an exact
  integer Euclidean distance transform (column scan + row min-plus
  reduction, BANDED to the bucket's influence radius — no data-dependent
  control flow), the quadratic radial falloff, the f64 inverse-cast
  back-projection of the blurred CLP, and a max-composite carried
  through ``lax.scan``;
* :func:`probability_map_jax` — the raster-sized histogram accumulation
  (ProbabilityRefinement.cpp:137-151) as device scatter-adds; the TINY
  (d<=128 squared) sequential hole-fill and surface composite stay on the
  host, where the reference's in-round update order is natural — only
  d*d-cell grids cross the tunnel, not rasters;
* :func:`improved_shadow_mask_jax` — the per-pixel surface sampling +
  final mask logic (:226-241, :264-283) as one fused gather program over
  the precomputed extended surface table.

Like matching, the pipeline default is chosen by measurement: the back-
projection gather is XLA-hostile on TPU (irregular gathers lower to slow
scatter/gather loops) and the tunneled-host D2H makes device rasters
expensive to fetch, so the host path remains the pipeline default; this
backend is the pure-jit alternative for TPU-resident deployments.

Exactness notes (why host and device agree):
* the EDT is computed in integer arithmetic (squared distances are exact
  in i32 for any bucket size used here), then rooted in f64 — the same
  correctly-rounded value scipy's EDT produces;
* the back-projection runs in f64 with the host's operation order
  (pixel_to_world -> M^-1 -> world_to_index floor semantics);
* the falloff factor is f32 like Functions.cpp:151-162; XLA's FMA fusion
  may differ from numpy by ulps, so the equality tests assert exact mask
  agreement on real data plus 1e-6-level closeness on the float surfaces.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ...config import RefinementConfig
from ...ops.masks import fetch_mask, push_mask
from ...ops import geometry
from .matching import OptimalSolution, ShadowObject, _bucket_size
from .refinement import _border_mask

_EDT_CHUNK = 16  # columns per min-plus step: (hb, wb, 16) i32 intermediates
_NO_SEED = np.int32(1 << 15)  # farther than any window diagonal; square fits i32


@jax.jit
def alpha_map_jax(nir_difference, alpha_a: float = 17.0, alpha_b: float = 0.007):
    """Device alpha map: F(x) = f(x-.5) - f(-.5), f(x)=1/(1+b e^{-ax}), f32
    (ProbabilityRefinement.cpp:13-27)."""
    a = jnp.float32(alpha_a)
    b = jnp.float32(alpha_b)
    x = jnp.asarray(nir_difference, jnp.float32)

    def f(v):
        return jnp.float32(1.0) / (jnp.float32(1.0) + b * jnp.exp(-a * v))

    return f(x - jnp.float32(0.5)) - f(jnp.float32(-0.5))


def _edt_sq(seeds, extent_h, extent_w, band: int | None = None):
    """Squared Euclidean distance to the nearest seed, i32 — exact up to
    ``band`` (exact everywhere when band is None).

    Two-phase separable EDT without data-dependent control flow:
    phase 1 scans each column for the nearest seed row (cummax of seed row
    indices, both directions); phase 2 is a min-plus reduction over column
    OFFSETS in chunks, banded to |offset| <= band. Any pixel whose true
    distance exceeds ``band`` gets SOME value > band^2 (the banded min is
    over a candidate subset, so it only over-estimates); callers that
    threshold at a distance <= band (beta's influence radius is clipped to
    beta_max_distance) therefore see exact results. Cost drops from
    O(hb * wb^2) to O(hb * wb * band) — ~12x at 2048-wide buckets for the
    default 80 px radius."""
    hb, wb = seeds.shape
    rows = lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
    in_ext = (rows < extent_h) & (
        lax.broadcasted_iota(jnp.int32, (hb, wb), 1) < extent_w
    )
    seeds = seeds & in_ext

    neg_big = jnp.int32(-(1 << 20))
    pos_big = jnp.int32(1 << 20)
    seed_rows = jnp.where(seeds, rows, neg_big)
    above = rows - lax.cummax(seed_rows, axis=0)  # dist to seed at <= row
    seed_rows_r = jnp.where(seeds, rows, pos_big)
    below = lax.cummin(seed_rows_r, axis=0, reverse=True) - rows
    g = jnp.minimum(jnp.minimum(above, below), _NO_SEED)  # (hb, wb) i32
    g2 = g * g

    big = jnp.int32(2**30)
    b_eff = wb - 1 if band is None else min(int(band), wb - 1)
    n_off = 2 * b_eff + 1  # offsets -b_eff..+b_eff
    chunk = min(_EDT_CHUNK, n_off)
    n_steps = -(-n_off // chunk)
    # pad so offset slabs (and the chunk tail) never leave the buffer;
    # padded candidates carry `big` (no overflow: big + band^2 < 2^31)
    g2p = jnp.pad(
        g2, ((0, 0), (b_eff, b_eff + n_steps * chunk - n_off)),
        constant_values=big,
    )
    offs = jnp.arange(chunk, dtype=jnp.int32)

    def step(k, acc):
        i0 = k * chunk
        sl = lax.dynamic_slice(g2p, (0, i0), (hb, wb + chunk - 1))
        # slab c is g2 shifted by offset (i0 + c - b_eff); static slices
        cand = jnp.stack([sl[:, c : c + wb] for c in range(chunk)], axis=-1)
        d = i0 + offs - jnp.int32(b_eff)
        return jnp.minimum(acc, (cand + d * d).min(axis=-1))

    acc0 = jnp.full((hb, wb), big)
    return lax.fori_loop(0, n_steps, step, acc0)


@functools.partial(
    jax.jit, static_argnames=("hb", "wb", "height", "width", "band")
)
def _beta_bucket(
    clp_f,  # (H, W) f32, flipped rows (bottom-origin), shared
    ret_f,  # (H + hb, W + wb) f32 carry, flipped + padded
    in_shadow,  # (Ns, hb, wb) bool
    border,  # (Ns, hb, wb) bool
    anchor,  # (Ns, 2) i32: (ib_x0, ib_y0)
    extent,  # (Ns, 2) i32: (ih, iw) true influence size
    inf_f,  # (Ns,) f32
    lo,  # (Ns,) f32 — inf * beta_min_factor
    mid,  # () f32 — beta_mid_percentile
    minv,  # (Ns, 4, 4) f64
    sx,  # () f64
    sy,  # () f64
    hb: int,
    wb: int,
    height: int,
    width: int,
    band: int | None = None,  # EDT exactness horizon >= max influence radius
):
    """Max-composite the radial-falloff contributions of one bucket of
    shadows into ``ret_f`` (ProbabilityRefinement.cpp:29-106), sequentially
    via scan (bounded memory), each step one fused window pass."""
    u = jnp.arange(wb, dtype=jnp.int32)[None, :]
    v = jnp.arange(hb, dtype=jnp.int32)[:, None]

    def one(ret_f, args):
        shadow, bord, anc, ext, inf, lo_s, minv_s = args
        ix0, iy0 = anc[0], anc[1]
        ih, iw = ext[0], ext[1]

        d2 = _edt_sq(bord, ih, iw, band=band)
        dist = jnp.sqrt(d2.astype(jnp.float64)).astype(jnp.float32)
        dist = jnp.where(shadow, jnp.float32(0.0), dist)
        within = dist <= inf

        # quadratic radial basis, f32 (Functions.cpp:151-162)
        hi = inf
        a = mid * hi + (1 - mid) * lo_s
        span2 = (hi - lo_s) * (hi - lo_s)
        falling = 1 - (dist - lo_s) * (dist - lo_s) / (span2 * mid)
        rising = (dist - hi) * (dist - hi) / (span2 * (1 - mid))
        factor = jnp.where(
            dist <= lo_s,
            jnp.float32(1.0),
            jnp.where(dist <= a, falling, jnp.where(dist <= hi, rising, jnp.float32(0.0))),
        )

        # f64 back-projection with the host's op order: pixel centre ->
        # world -> M^-1 -> floor index (ImageOperations.h pos/index)
        gx = (ix0 + u).astype(jnp.float64)
        gy = (iy0 + v).astype(jnp.float64)
        px = sx * (gx + 0.5) / width
        py = sy * (gy + 0.5) / height
        back0 = minv_s[0, 0] * px + minv_s[0, 1] * py + minv_s[0, 3]
        back1 = minv_s[1, 0] * px + minv_s[1, 1] * py + minv_s[1, 3]
        ci = jnp.floor(width * back0 / sx).astype(jnp.int32)
        cj = jnp.floor(height * back1 / sy).astype(jnp.int32)
        valid = (ci >= 0) & (ci < width) & (cj >= 0) & (cj < height)
        clp_v = clp_f[jnp.clip(cj, 0, height - 1), jnp.clip(ci, 0, width - 1)]

        in_ext = (v < ih) & (u < iw)
        contrib = jnp.where(
            within & valid & in_ext, clp_v * factor, jnp.float32(0.0)
        )
        region = lax.dynamic_slice(ret_f, (iy0, ix0), (hb, wb))
        ret_f = lax.dynamic_update_slice(
            ret_f, jnp.maximum(region, contrib), (iy0, ix0)
        )
        return ret_f, None

    ret_f, _ = lax.scan(
        one, ret_f, (in_shadow, border, anchor, extent, inf_f, lo, minv)
    )
    return ret_f


def _beta_prep(
    shadows: dict[int, ShadowObject],
    solutions: dict[int, OptimalSolution],
    h: int,
    w: int,
    config: RefinementConfig,
):
    """Host prep shared by the single-device and sharded beta maps: per
    accepted shadow, the influence window geometry and the (tiny)
    bbox-border stencil — pure indexing, no floating-point compute.
    Returns (items, buckets, max_b)."""
    items = []
    for sid, shadow in shadows.items():
        if shadow.window is None or shadow.area == 0 or shadow.bounds is None:
            continue
        sol = solutions[sid]
        m_inv = np.linalg.inv(sol.M)
        inf_f = float(
            np.clip(
                np.float32(config.beta_area_correction) * np.sqrt(np.float32(shadow.area)),
                config.beta_min_distance,
                config.beta_max_distance,
            )
        )
        inf_i = int(np.floor(inf_f))
        bx0, by0, bx1, by1 = shadow.bounds
        ib_x0 = int(np.clip(bx0 - inf_i, 0, w - 1))
        ib_y0 = int(np.clip(by0 - inf_i, 0, h - 1))
        ib_x1 = int(np.clip(bx1 + inf_i, 0, w - 1))
        ib_y1 = int(np.clip(by1 + inf_i, 0, h - 1))
        iw_t, ih_t = ib_x1 - ib_x0 + 1, ib_y1 - ib_y0 + 1

        ax, ay = shadow.anchor
        win = shadow.window
        bbox = np.zeros((by1 - by0 + 1, bx1 - bx0 + 1), dtype=bool)
        bbox[:, :] = win[by0 - ay : by1 - ay + 1, bx0 - ax : bx1 - ax + 1]
        border = _border_mask(bbox)

        in_shadow = np.zeros((ih_t, iw_t), bool)
        bord_g = np.zeros((ih_t, iw_t), bool)
        oy0, ox0 = by0 - ib_y0, bx0 - ib_x0
        in_shadow[oy0 : oy0 + bbox.shape[0], ox0 : ox0 + bbox.shape[1]] = bbox
        bord_g[oy0 : oy0 + bbox.shape[0], ox0 : ox0 + bbox.shape[1]] = border
        items.append(
            dict(
                anchor=(ib_x0, ib_y0), extent=(ih_t, iw_t), inf=inf_f,
                lo=inf_f * config.beta_min_factor, minv=m_inv,
                in_shadow=in_shadow, border=bord_g,
            )
        )

    max_b = _bucket_size(max((max(it["extent"]) for it in items), default=8))
    buckets: dict[tuple[int, int], list[dict]] = {}
    for it in items:
        key = (_bucket_size(it["extent"][0]), _bucket_size(it["extent"][1]))
        buckets.setdefault(key, []).append(it)
    return items, buckets, max_b


def _bucket_band(members: list[dict]) -> int:
    """EDT band for one bucket: the largest influence radius in the bucket,
    rounded up to a power of two so distinct scenes share compiled programs.
    Distances beyond the radius contribute factor 0, so banding is exact
    (see _edt_sq) — with the default config this is 128 vs bucket widths up
    to 4096."""
    need = int(np.ceil(max(it["inf"] for it in members))) + 1
    return max(_bucket_size(need), need)  # never under-band (exactness)


def _bucket_operands(members: list[dict], hb: int, wb: int):
    """Stacked per-shadow device operands for one bucket (shared by the
    single-device scan and the sharded compositor)."""
    pad = lambda a: np.pad(a, ((0, hb - a.shape[0]), (0, wb - a.shape[1])))
    return dict(
        in_shadow=jnp.asarray(np.stack([pad(it["in_shadow"]) for it in members])),
        border=jnp.asarray(np.stack([pad(it["border"]) for it in members])),
        anchor=jnp.asarray([it["anchor"] for it in members], jnp.int32),
        extent=jnp.asarray([it["extent"] for it in members], jnp.int32),
        inf_f=jnp.asarray([it["inf"] for it in members], jnp.float32),
        lo=jnp.asarray([it["lo"] for it in members], jnp.float32),
        minv=jnp.asarray(np.stack([it["minv"] for it in members]), jnp.float64),
    )


def beta_map_jax(
    shadows: dict[int, ShadowObject],
    solutions: dict[int, OptimalSolution],
    clp_blended: np.ndarray,
    diagonal: float,
    config: RefinementConfig = RefinementConfig(),
    device_output: bool = False,
) -> np.ndarray:
    """Device beta map: same contract as :func:`refinement.beta_map`,
    evaluated as one fused XLA program per window-size bucket.

    ``device_output=True`` keeps the result on device (its only consumers
    — histogram scatter-adds and final-mask sampling — are device programs;
    a full-tile f32 beta raster is ~482 MB, a D2H + re-upload round-trip
    the all-device pipeline route must never pay)."""
    h, w = clp_blended.shape
    sx, sy = geometry.sides((h, w), diagonal)
    # flip on device: a device-resident CLP (the all-device pipeline route)
    # must not round-trip the link for a row reversal
    clp_j = jnp.flipud(jnp.asarray(clp_blended, jnp.float32))

    items, buckets, max_b = _beta_prep(shadows, solutions, h, w, config)
    ret = jnp.zeros((h + max_b, w + max_b), jnp.float32)

    for (hb, wb), members in buckets.items():
        ops = _bucket_operands(members, hb, wb)
        ret = _beta_bucket(
            clp_j,
            ret,
            ops["in_shadow"],
            ops["border"],
            ops["anchor"],
            ops["extent"],
            ops["inf_f"],
            ops["lo"],
            jnp.float32(config.beta_mid_percentile),
            ops["minv"],
            jnp.float64(sx),
            jnp.float64(sy),
            hb=hb, wb=wb, height=h, width=w, band=_bucket_band(members),
        )
    if device_output:
        return jnp.flipud(ret[:h, :w])
    return np.flipud(np.asarray(ret[:h, :w])).copy()


@functools.partial(jax.jit, static_argnames=("divisions",))
def _histograms_jax(alpha, beta, shadow_f32, divisions: tuple[int, ...], valid=None):
    """Per-resolution (counts, sums) histograms of the shadow indicator over
    (alpha, beta) cells (ProbabilityRefinement.cpp:137-151) as device
    scatter-adds. Both counts AND indicator sums accumulate as int32 so they
    stay exact for any cell population up to 2^31 (a full 10980^2 tile can
    put >2^24 shadow pixels in one coarse cell, where an f32 accumulator
    would silently saturate); element_from_histogram converts to f32 only at
    the final division, matching the host's f64-bincount-then-f32 path
    bit-for-bit.

    ``valid`` (optional bool, broadcastable to alpha's shape): pixels whose
    count/sum contribution is masked out entirely — the row-padding hook
    for the sharded route (parallel/detect.sharded_histograms), where pad
    rows must not pollute any cell. None = every pixel counts (the
    single-device path, bit-identical to before)."""
    a = jnp.asarray(alpha, jnp.float32).ravel()
    b = jnp.asarray(beta, jnp.float32).ravel()
    s = jnp.asarray(shadow_f32, jnp.float32).ravel().astype(jnp.int32)
    if valid is not None:
        v = jnp.broadcast_to(
            jnp.asarray(valid, bool), jnp.asarray(alpha).shape
        ).ravel().astype(jnp.int32)
        s = s * v
    else:
        v = None

    def agg(h, k):  # exact (d*k, d*k) -> (d, d) block sum, stays i32
        d = h.shape[0] // k
        return h.reshape(d, k, d, k).sum(axis=(1, 3))

    # Raster-scale scatter-adds are the expensive op here (~2 s each at
    # full tile on TPU); the default divisions are nested, and
    # clip(floor(a*dk), 0, dk-1) // k == clip(floor(a*d), 0, d-1) for any
    # integer k >= 1 (floor-division identity; clipping maps the a >= 1
    # and a < 0 tails consistently at every level) — so each division
    # whose value divides an already-computed finer one is derived by an
    # exact tiny block-sum instead of another pass over the raster.
    computed: dict[int, tuple] = {}
    for d in sorted(set(divisions), reverse=True):
        src = next((p for p in computed if p % d == 0), None)
        if src is not None:
            k = src // d
            computed[d] = tuple(agg(h, k) for h in computed[src])
        else:
            i = jnp.clip(jnp.floor(a * d).astype(jnp.int32), 0, d - 1)
            j = jnp.clip(jnp.floor(b * d).astype(jnp.int32), 0, d - 1)
            cell = i + d * j
            counts = jnp.zeros((d * d,), jnp.int32).at[cell].add(
                1 if v is None else v
            )
            sums = jnp.zeros((d * d,), jnp.int32).at[cell].add(s)
            computed[d] = (counts.reshape(d, d), sums.reshape(d, d))
    return tuple(computed[d] for d in divisions)


def probability_map_jax(
    shadow_mask: np.ndarray,
    alpha: np.ndarray,
    beta: np.ndarray,
    config: RefinementConfig = RefinementConfig(),
):
    """Device-histogram variant of :func:`refinement.probability_map`.

    The raster-sized accumulation runs on device; the d*d hole-fill (whose
    reference-exact sequential in-round update order is inherently serial,
    ProbabilityRefinement.cpp:162-183) and the 256x256 composite run on the
    host via the shared helpers — tiny grids, negligible transfer."""
    from . import refinement

    hists = _histograms_jax(
        jnp.asarray(alpha).astype(jnp.float32),
        jnp.asarray(beta).astype(jnp.float32),
        # host bool masks cross the link bit-packed (120 MB -> 15 MB at
        # full tile); device arrays pass through untouched
        push_mask(shadow_mask).astype(jnp.float32),
        tuple(config.histogram_divisions),
    )
    elements = [
        refinement.element_from_histogram(np.asarray(c), np.asarray(s))
        for (c, s) in hists
    ]
    return refinement.composite_surface(elements, config)


@jax.jit
def _sample_final_jax(ext, alpha, beta, object_mask, cloud_mask, threshold):
    """final = (bilinear-sample(P; alpha, beta) >= threshold OR object)
    AND NOT cloud, gathering from the extended surface table
    (ProbabilityRefinement.cpp:226-241 with operator() :264-283).

    ``ext`` is the (n+2, n+2) table of surface.at(i, j) for i, j in
    [-1, n] — every cell the sampler can touch for inputs in [0, 1], which
    alpha/beta satisfy by construction (both are probabilities)."""
    hgt = ext.shape[0] - 2
    wdt = ext.shape[1] - 2
    cellx = jnp.asarray(alpha, jnp.float32) * jnp.float32(wdt)
    celly = jnp.asarray(beta, jnp.float32) * jnp.float32(hgt)

    def roundf(x):  # half away from zero, like C roundf (:269-272)
        return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5)).astype(jnp.int32)

    x_max = roundf(cellx)
    y_max = roundf(celly)
    x_min = x_max - 1
    y_min = y_max - 1
    p0 = ext[y_min + 1, x_min + 1]
    p1 = ext[y_min + 1, x_max + 1]
    p2 = ext[y_max + 1, x_min + 1]
    p3 = ext[y_max + 1, x_max + 1]
    u = cellx - (x_min.astype(jnp.float32) + jnp.float32(0.5))
    v = celly - (y_min.astype(jnp.float32) + jnp.float32(0.5))
    bottom = (1 - u) * p0 + u * p1
    top = (1 - u) * p2 + u * p3
    prob = (1 - v) * bottom + v * top
    ret = prob >= threshold
    return (ret | object_mask) & ~cloud_mask


def improved_shadow_mask_jax(
    object_shadow_mask: np.ndarray,
    cloud_mask: np.ndarray,
    alpha: np.ndarray,
    beta: np.ndarray,
    surface,
    threshold: float,
    device_output: bool = False,
) -> np.ndarray:
    """Device variant of :func:`refinement.improved_shadow_mask`: the
    raster-sized sampling + mask logic runs as one fused XLA program over
    the host-precomputed extended surface table.

    ``device_output`` keeps the result in HBM — the pipeline's consumers
    (percent reductions, the OR with the device cloud mask, the bit-packed
    TIFF write) are all device ops, and a host round-trip here costs a
    packed D2H plus a full-width bool H2D re-upload at full tile."""
    ext = surface._extended()
    out = _sample_final_jax(
        jnp.asarray(ext),
        jnp.asarray(alpha).astype(jnp.float32),
        jnp.asarray(beta).astype(jnp.float32),
        push_mask(object_shadow_mask),  # bit-packed H2D for host masks
        push_mask(cloud_mask),
        jnp.float32(threshold),
    )
    return out if device_output else fetch_mask(out)
