"""Sharded detection stages: multi-chip forms of the detect() device
programs beyond blur/pit-fill (VERDICT r3 item 3; SURVEY §2.5 P6 applied
to the whole pipeline — the reference runs everything on one OpenCL
device, ComputeEnvironment.cpp:9-14).

Each stage shards the axis that is embarrassingly parallel for it and
reuses the SAME single-device kernel inside ``jax.shard_map``, so results
are bit-equal to the single-device route by construction:

* :func:`sharded_sweep` — the ray-cast similarity sweep with the HEIGHT
  axis sharded: every (height, cloud) cell is an independent masked
  reduction, so each shard scans its local heights over replicated
  rasters (matching._bucket_sweep verbatim). Plugs into
  ``match_clouds_shadows(sweep_fn=...)`` so all orchestration
  (bucketing, chunking, detail extraction, compositing) is shared.
* :func:`sharded_alpha_map` — elementwise logistic remap over row shards.
* :func:`sharded_beta_map` — the per-shadow radial falloff with the
  SHADOW axis sharded: each shard max-composites its local shadows into
  its own raster (refinement_jax._beta_bucket verbatim), then one
  ``lax.pmax`` merges shards — max is associative and commutative, so
  the composite is bit-equal to the sequential scan.
* :func:`sharded_histograms` — the (alpha, beta) scatter-add histograms
  with raster ROWS sharded and int32 ``psum`` merges (integer addition:
  exact under any reduction order).
* :func:`sharded_improved_shadow_mask` — the final-mask surface sampling
  over row shards (refinement_jax._sample_final_jax verbatim, surface
  table replicated).

:func:`mini_detect_sharded` chains them into a full in-memory detect()
on a synthetic scene and asserts every mask bit-equal to the
single-device jax route — the multi-chip pipeline certification the
driver's dryrun runs on the virtual CPU mesh.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RefinementConfig
from ..models.detection import refinement_jax
from ..models.detection.matching import _bucket_sweep
from ..models.detection.refinement_jax import (
    _beta_bucket,
    _beta_prep,
    _bucket_band,
    _bucket_operands,
    _histograms_jax,
    _sample_final_jax,
)
from ..ops import geometry


def _flat_axes(mesh: Mesh) -> tuple[str, ...]:
    """All mesh axis names — detection stages shard over every device."""
    return tuple(mesh.axis_names)


def _n_shards(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


def sharded_sweep(mesh: Mesh):
    """A ``sweep_fn`` for :func:`matching.match_clouds_shadows`: the bucket
    similarity sweep with the height-chunk axis sharded over ALL of
    ``mesh``'s devices. Heights pad up to the shard count by repeating the
    last entry (dropped after), rasters are replicated, and each shard
    runs matching._bucket_sweep on its local heights — bit-equal per
    (height, cloud) cell."""
    axes = _flat_axes(mesh)
    n = _n_shards(mesh)

    def sweep(
        cmask_f, psm_f, cmap_f, ids, min_x, min_y, max_x, max_y, a2, delta,
        wb: int, hb: int, width: int, height: int, pf: int = 0,
        min_support: int = 5,
    ):
        nh = int(min_x.shape[0])
        pad = -nh % n

        def padh(x):
            if pad == 0:
                return x
            reps = jnp.repeat(x[-1:], pad, axis=0)
            return jnp.concatenate([x, reps], axis=0)

        args = tuple(padh(x) for x in (min_x, min_y, max_x, max_y, a2, delta))
        hspec = [P(axes) for _ in range(4)] + [P(axes), P(axes)]
        rspec = P()  # replicated rasters

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(rspec, rspec, rspec, rspec, *hspec),
            out_specs=P(axes),
            check_vma=False,
        )
        def run(cm, ps, cp, idv, mnx, mny, mxx, mxy, a2l, dl):
            return _bucket_sweep(
                cm, ps, cp, idv, mnx, mny, mxx, mxy, a2l, dl,
                wb=wb, hb=hb, width=width, height=height, pf=pf,
                min_support=min_support,
            )

        sims = jax.jit(run)(cmask_f, psm_f, cmap_f, ids, *args)
        # replicate before dropping the pad rows: 473 heights don't split
        # evenly over the shards, so a sharded slice is ambiguous; the sims
        # matrix is tiny (Nh x Nc f32)
        sims = jax.device_put(sims, NamedSharding(mesh, P()))
        return sims[:nh]

    return sweep


def _row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(_flat_axes(mesh), None))


@functools.lru_cache(maxsize=64)
def _row_padder(mesh: Mesh, pad: int):
    """Jitted row pad with an explicit output sharding: eager pads/slices
    of unevenly-sharded operands are ambiguous to the partitioner."""
    return jax.jit(
        lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)),
        out_shardings=_row_sharding(mesh),
    )


def _pad_rows(x, n: int, mesh: Mesh):
    """(row-sharded padded array, original row count): the leading axis
    pads up to a multiple of ``n`` with zeros — real tiles (10980 rows) and
    the test scene (1284) don't divide evenly over arbitrary shard counts,
    and this JAX's explicit shardings cannot represent uneven row splits,
    so every row-sharded stage pads internally. Pad rows never influence
    valid outputs: elementwise stage results are cut back to the logical
    rows, and the histogram stage masks pads out of its scatter-adds via
    the ``valid`` weight. Host arrays pad on the host before upload;
    device arrays (replicated or already evenly sharded) pad in a jitted
    program (see _row_padder)."""
    h = int(x.shape[0])
    pad = -h % n
    sh = _row_sharding(mesh)
    if isinstance(x, np.ndarray):
        if pad:
            x = np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        return jax.device_put(jnp.asarray(x), sh), h
    x = jnp.asarray(x)
    if pad == 0:
        return jax.device_put(x, sh), h
    return _row_padder(mesh, pad)(x), h


def _exact_rows(y, h: int, mesh: Mesh):
    """Cut a row-padded stage output back to its logical ``h`` rows.

    An uneven row sharding is unrepresentable (explicit-sharding JAX), so
    the array replicates first (one all-gather) and slices on the
    replicated layout. Stages that chain into other sharded stages should
    pass padded arrays + ``rows`` instead and never pay this; the pipeline
    only takes this path for the FINAL bool mask (bit-sized, and exact on
    a single real device)."""
    if y.shape[0] == h:
        return y
    y = jax.device_put(y, NamedSharding(mesh, P()))
    return y[:h]


def sharded_alpha_map(
    nir_difference,
    mesh: Mesh,
    alpha_a: float = 17.0,
    alpha_b: float = 0.007,
    padded_output: bool = False,
):
    """Row-sharded alpha map (refinement_jax.alpha_map_jax per shard);
    rows pad internally to the shard count.

    ``padded_output``: return ``(padded_alpha, rows)`` with the row-padded,
    evenly-sharded raster — the form the downstream sharded stages consume
    directly (pass ``rows`` through to them). Default returns the exact
    (h, w) raster (replicating if the rows padded — see _exact_rows)."""
    axes = _flat_axes(mesh)
    n = _n_shards(mesh)
    if isinstance(nir_difference, np.ndarray):
        x, h = _pad_rows(nir_difference.astype(np.float32, copy=False), n, mesh)
    else:
        x, h = _pad_rows(jnp.asarray(nir_difference, jnp.float32), n, mesh)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(axes, None),
        out_specs=P(axes, None), check_vma=False,
    )
    def run(xl):
        return refinement_jax.alpha_map_jax(xl, alpha_a, alpha_b)

    out = jax.jit(run)(x)
    if padded_output:
        return out, h
    return _exact_rows(out, h, mesh)


def sharded_beta_map(
    shadows,
    solutions,
    clp_blended,
    diagonal: float,
    mesh: Mesh,
    config: RefinementConfig = RefinementConfig(),
    device_output: bool = False,
):
    """Shadow-axis-sharded beta map: same contract as
    :func:`refinement_jax.beta_map_jax`. Each bucket's shadows split over
    the mesh (padded with zero-extent dummies whose contribution is
    identically 0); shards composite locally with the single-device
    ``_beta_bucket`` and merge with one exact ``lax.pmax``."""
    n = _n_shards(mesh)
    h, w = clp_blended.shape
    sx, sy = geometry.sides((h, w), diagonal)
    clp_j = jnp.flipud(jnp.asarray(clp_blended, jnp.float32))

    items, buckets, max_b = _beta_prep(shadows, solutions, h, w, config)
    ret = jnp.zeros((h + max_b, w + max_b), jnp.float32)

    for (hb, wb), members in buckets.items():
        band = _bucket_band(members)
        # pad the shadow axis to a multiple of the shard count with inert
        # dummies: no border seeds -> EDT distance ~ 2^15 everywhere ->
        # outside every influence radius -> contribution exactly 0, and
        # max(ret, 0) is the identity (contributions are >= 0: CLP in [0,1])
        n_pad = -len(members) % n
        dummy = dict(
            anchor=(0, 0), extent=(0, 0), inf=1.0, lo=0.0,
            minv=np.eye(4), in_shadow=np.zeros((1, 1), bool),
            border=np.zeros((1, 1), bool),
        )
        ops = _bucket_operands(members + [dummy] * n_pad, hb, wb)

        # executable cache (module-level LRU): the previous per-call closure
        # re-traced + re-jitted every bucket shape on every call — repeated
        # detects on same-class scenes now reuse the compiled composites
        composite = _beta_composite_jit(
            mesh, hb, wb, h, w, band, max_b,
            float(sx), float(sy), float(config.beta_mid_percentile),
        )
        part = composite(
            clp_j,
            ops["in_shadow"], ops["border"], ops["anchor"], ops["extent"],
            ops["inf_f"], ops["lo"], ops["minv"],
        )
        ret = jnp.maximum(ret, part)
    if device_output:
        return jnp.flipud(ret[:h, :w])
    return np.flipud(np.asarray(ret[:h, :w])).copy()


@functools.lru_cache(maxsize=32)
def _beta_composite_jit(
    mesh: Mesh, hb: int, wb: int, h: int, w: int, band: int, max_b: int,
    sx: float, sy: float, mid: float,
):
    """Compiled shadow-sharded beta composite for one bucket geometry.

    The CLP raster stays REPLICATED by design: each shadow's contribution
    gathers a window of CLP through its inverse cast transform — windows
    straddle any row partition, so sharding CLP would need data-dependent
    halo exchange. The sharded axis is the SHADOW list (embarrassingly
    parallel), merged with one exact ``pmax``."""
    axes = _flat_axes(mesh)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # clp (replicated: windowed gathers, see docstring)
            P(axes), P(axes), P(axes), P(axes), P(axes), P(axes), P(axes),
        ),
        out_specs=P(),
        check_vma=False,
    )
    def composite(clp_l, in_sh, bord, anc, ext, inf_f, lo, minv):
        local = _beta_bucket(
            clp_l,
            jnp.zeros((h + max_b, w + max_b), jnp.float32),
            in_sh, bord, anc, ext, inf_f, lo,
            jnp.float32(mid),
            minv,
            jnp.float64(sx), jnp.float64(sy),
            hb=hb, wb=wb, height=h, width=w, band=band,
        )
        return lax.pmax(local, axes)

    return jax.jit(composite)


def sharded_histograms(alpha, beta, shadow_f32, divisions, mesh: Mesh,
                       rows: int | None = None):
    """Row-sharded (counts, sums) histograms: each shard scatter-adds its
    row slab with the single-device ``_histograms_jax``, then int32
    ``psum`` merges — exact for any population (integer addition). Rows
    pad internally; pad rows carry valid=0 so they touch no cell.

    ``rows``: the logical row count when inputs arrive ALREADY padded
    (e.g. alpha from ``sharded_alpha_map(padded_output=True)``); shorter
    inputs still pad up individually."""
    axes = _flat_axes(mesh)
    n = _n_shards(mesh)
    h = int(alpha.shape[0]) if rows is None else rows
    spec = P(axes, None)

    def put(x):
        if not isinstance(x, np.ndarray):
            x = jnp.asarray(x, jnp.float32)
        xp, _ = _pad_rows(x, n, mesh)
        return xp

    hp = h + (-h % n)
    valid = np.zeros((hp, 1), bool)
    valid[:h] = True
    valid = jax.device_put(jnp.asarray(valid), NamedSharding(mesh, spec))

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec, spec),
        out_specs=P(), check_vma=False,
    )
    def run(al, bl, sl, vl):
        hists = _histograms_jax(al, bl, sl, tuple(divisions), valid=vl)
        return jax.tree.map(lambda x: lax.psum(x, axes), hists)

    return jax.jit(run)(put(alpha), put(beta), put(shadow_f32), valid)


def sharded_probability_map(
    shadow_mask, alpha, beta, mesh: Mesh,
    config: RefinementConfig = RefinementConfig(),
    rows: int | None = None,
):
    """Sharded-histogram variant of refinement_jax.probability_map_jax:
    raster accumulation sharded over the mesh, the tiny hole-fill +
    composite on the host (inherently serial, ProbabilityRefinement.cpp:162-183).
    ``rows``: logical row count when ``alpha`` arrives row-padded."""
    from ..models.detection import refinement
    from ..ops.masks import push_mask

    hists = sharded_histograms(
        alpha if isinstance(alpha, np.ndarray) else jnp.asarray(alpha, jnp.float32),
        jnp.asarray(beta).astype(jnp.float32),
        push_mask(shadow_mask).astype(jnp.float32),
        tuple(config.histogram_divisions),
        mesh,
        rows=rows,
    )
    elements = [
        refinement.element_from_histogram(np.asarray(c), np.asarray(s))
        for (c, s) in hists
    ]
    return refinement.composite_surface(elements, config)


def sharded_improved_shadow_mask(
    object_shadow_mask, cloud_mask, alpha, beta, surface, threshold: float,
    mesh: Mesh, device_output: bool = False, rows: int | None = None,
):
    """Row-sharded final-mask sampling (refinement_jax._sample_final_jax
    per shard; the 258x258 surface table is the only replicated operand).
    Rows pad internally with zeros; sampling is elementwise, so pads never
    influence valid rows, and the bool result cuts back to the logical
    rows (replicate+slice — bit-sized, see _exact_rows). ``rows``: logical
    row count when ``alpha`` arrives row-padded."""
    from ..ops.masks import fetch_mask, push_mask

    axes = _flat_axes(mesh)
    n = _n_shards(mesh)
    ext = jnp.asarray(surface._extended())
    a = alpha if isinstance(alpha, np.ndarray) else jnp.asarray(alpha, jnp.float32)
    h = int(a.shape[0]) if rows is None else rows
    spec = P(axes, None)

    def put(x):
        if not isinstance(x, np.ndarray):
            x = jnp.asarray(x)
        xp, _ = _pad_rows(x, n, mesh)
        return xp

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), spec, spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    def run(ext_l, al, bl, ob, cl):
        return _sample_final_jax(ext_l, al, bl, ob, cl, jnp.float32(threshold))

    out = _exact_rows(
        jax.jit(run)(
            ext, put(a), put(jnp.asarray(beta).astype(jnp.float32)),
            put(push_mask(object_shadow_mask)), put(push_mask(cloud_mask)),
        ),
        h,
        mesh,
    )
    return out if device_output else fetch_mask(out)


def _mini_scene(n: int, seed: int = 7):
    """Tiny synthetic Sentinel-2-style scene (clouds + displaced NIR
    shadows + smooth angle rasters) — the dryrun-scale analog of
    benchmarks/bench_detect_fulltile.synthesize."""
    rng = np.random.default_rng(seed)
    base = np.zeros((n, n), np.float32)
    yy, xx = np.ogrid[:n, :n]
    for _ in range(10):
        cy, cx = rng.integers(n // 8, 7 * n // 8, 2)
        ry = int(rng.integers(n // 32 + 2, n // 12 + 4))
        rx = int(rng.integers(n // 32 + 2, n // 12 + 4))
        d2 = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        np.maximum(base, np.exp(-0.5 * d2.astype(np.float32)), out=base)
    clp = np.clip(base * 255 * 1.2, 0, 255).astype(np.uint8)
    cld = np.clip(base * 100 * 1.1, 0, 100).astype(np.uint8)
    cloud = base > 0.55

    scl = np.full((n, n), 4, np.uint8)
    scl[base > 0.75] = 9
    scl[(base > 0.65) & (base <= 0.75)] = 8

    dy, dx = -max(n // 24, 2), -max(n // 32, 2)
    shadow = np.zeros_like(cloud)
    src = cloud[max(-dy, 0) : n - max(dy, 0), max(-dx, 0) : n - max(dx, 0)]
    shadow[max(dy, 0) : n - max(-dy, 0), max(dx, 0) : n - max(-dx, 0)] = src
    g = rng.standard_normal((n, n)).astype(np.float32)
    for _ in range(6):
        g = 0.25 * (
            np.roll(g, 1, 0) + np.roll(g, -1, 0) + np.roll(g, 1, 1) + np.roll(g, -1, 1)
        )
    g = g / max(float(g.std()), 1e-6)
    nir = (6000 + 1500 * g).clip(500, 10000)
    nir[shadow] *= 0.35

    grad = (yy / n + xx / n).astype(np.float32)
    return dict(
        clp=clp.astype(np.float32) / 255.0,
        cld=cld.astype(np.float32) / 100.0,
        scl=scl,
        nir=nir.astype(np.float32) / 65535.0,
        sun_zenith=35.0 + 0.5 * grad,
        sun_azimuth=145.0 + 0.5 * grad,
        view_zenith=5.0 + 0.2 * grad,
        view_azimuth=100.0 + 0.3 * grad,
    )


def mini_detect_sharded(mesh: Mesh, n: int = 256) -> dict:
    """Run the detect() stage chain twice on an in-memory synthetic scene —
    the single-device jax route, and the route with every shardable device
    stage sharded over ``mesh`` (sweep over heights, beta over shadows,
    histograms + alpha + final mask over rows; blur/pit-fill sharding is
    certified separately in parallel.stencils) — and assert the cloud,
    potential-shadow, object-shadow, and final masks are BIT-EQUAL.

    Reference pipeline being sharded: automatic_detection.cpp:80-236.
    Returns the masks for inspection."""
    from ..config import DetectionConfig
    from ..models.detection import cloud_mask as cm
    from ..models.detection import matching
    from ..models.detection import shadow_mask as sm

    config = DetectionConfig()
    scene = _mini_scene(n)
    diagonal = 219.0 * (n / 10980.0)  # ~tile-scaled diagonal, km

    # --- shared host/XLA stages (identical code both routes) ---
    generated = cm.generate_cloud_mask_ignore_low_probability(
        scene["clp"], scene["cld"], scene["scl"], config.cloud_mask
    )
    cloud_map, clouds = cm.partition_cloud_mask(
        generated.cloud_mask_no_processing, diagonal,
        config.min_cloud_size_for_ray_casting,
    )
    psm = sm.generate_potential_shadow_mask(
        scene["nir"], generated.cloud_mask_no_processing, scene["scl"],
        config.shadow_mask,
    )
    shape = scene["clp"].shape
    sun_pos = geometry.ls_point_equal_to_chunked(
        scene["sun_zenith"], scene["sun_azimuth"], shape, diagonal,
        config.distance_to_sun_km,
    )
    view_pos = geometry.ls_point_equal_to_chunked(
        scene["view_zenith"], scene["view_azimuth"], shape, diagonal,
        config.distance_to_view_km,
    )

    def run_route(sweep_fn, sharded: bool):
        match = matching.match_clouds_shadows(
            clouds, cloud_map, generated.cloud_mask_no_processing, psm.mask,
            diagonal, sun_pos, view_pos, config.matching,
            use_native=False, sweep_fn=sweep_fn,
        )
        if sharded:
            alpha = np.asarray(
                sharded_alpha_map(
                    psm.difference_of_pitfill_nir, mesh,
                    config.refinement.alpha_a, config.refinement.alpha_b,
                )
            )
            beta = sharded_beta_map(
                match.shadows, match.solutions,
                generated.blended_cloud_probability, diagonal, mesh,
                config.refinement,
            )
            surface = sharded_probability_map(
                match.shadow_mask, alpha, beta, mesh, config.refinement
            )
            final = sharded_improved_shadow_mask(
                match.shadow_mask, generated.cloud_mask, alpha, beta,
                surface, config.probability_threshold, mesh,
            )
        else:
            alpha = np.asarray(
                refinement_jax.alpha_map_jax(
                    psm.difference_of_pitfill_nir,
                    config.refinement.alpha_a, config.refinement.alpha_b,
                )
            )
            beta = refinement_jax.beta_map_jax(
                match.shadows, match.solutions,
                generated.blended_cloud_probability, diagonal,
                config.refinement,
            )
            surface = refinement_jax.probability_map_jax(
                match.shadow_mask, alpha, beta, config.refinement
            )
            final = refinement_jax.improved_shadow_mask_jax(
                match.shadow_mask, generated.cloud_mask, alpha, beta,
                surface, config.probability_threshold,
            )
        return dict(
            object=np.asarray(match.shadow_mask),
            alpha=np.asarray(alpha),
            beta=np.asarray(beta),
            final=np.asarray(final),
            n_matched=sum(
                1 for s in match.solutions.values() if s.similarity >= 0
            ),
        )

    want = run_route(None, sharded=False)
    got = run_route(sharded_sweep(mesh), sharded=True)

    assert want["n_matched"] > 0, "mini scene produced no cloud-shadow matches"
    for key in ("object", "alpha", "beta", "final"):
        if not np.array_equal(want[key], got[key]):
            raise AssertionError(
                f"sharded detect stage '{key}' differs from single-device"
            )
    return dict(
        cloud=np.asarray(generated.cloud_mask),
        object=got["object"],
        final=got["final"],
        n_matched=got["n_matched"],
    )
