"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(shape: tuple[int, ...], axis_names: tuple[str, ...]) -> Mesh:
    """Mesh over the first prod(shape) available devices."""
    return jax.make_mesh(shape, axis_names)


def spatial_band_mesh(
    n_devices: int | None = None,
    shape: tuple[int, int] | None = None,
) -> Mesh:
    """A ('b', 'x') mesh: band (data-parallel) axis x spatial (row) axis.

    Splits devices favouring the spatial axis — the halo-exchange stencil
    rides ICI while bands are embarrassingly parallel, and a longer spatial
    axis means thinner halos per shard. Policy: the band axis is the largest
    divisor of n_devices that is <= sqrt(n_devices) and <= 4 (bands saturate
    quickly: 13 Sentinel-2 bands don't split past 4 usefully), so the spatial
    axis always gets at least its square-root share. Pass `shape=(b, x)` to
    override the heuristic entirely.
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    if shape is not None:
        b, x = shape
        if b * x != n_devices:
            raise ValueError(
                f"mesh shape {shape} does not cover {n_devices} devices"
            )
        return jax.make_mesh((b, x), ("b", "x"))
    b, x = split_band_spatial(n_devices)
    return jax.make_mesh((b, x), ("b", "x"))


def spatial_mesh_2d(
    n_devices: int | None = None,
    shape: tuple[int, int, int] | None = None,
) -> Mesh:
    """A ('b', 'y', 'x') mesh: band x spatial-rows x spatial-cols.

    The 2-D spatial tiling (SURVEY §2.5 P6) halves each shard's halo
    perimeter vs rows-only at the same device count and rides both ICI
    axes of a 2-D torus. Policy: all devices go to space (b=1 — bands are
    cheap to loop over; spatial extent is what outgrows one chip), split
    as square as possible with rows >= cols (row ghosts move sublane-dim
    slabs, which lower better than lane-dim column slabs — keep the column
    axis the shorter one). Pass ``shape=(b, y, x)`` to override.
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    if shape is not None:
        b, y, x = shape
        if b * y * x != n_devices:
            raise ValueError(
                f"mesh shape {shape} does not cover {n_devices} devices"
            )
        return jax.make_mesh((b, y, x), ("b", "y", "x"))
    y, x = split_rows_cols(n_devices)
    return jax.make_mesh((1, y, x), ("b", "y", "x"))


def split_rows_cols(n_devices: int) -> tuple[int, int]:
    """Most-square (y, x) factorization with y >= x (see spatial_mesh_2d)."""
    x = 1
    f = 2
    while f * f <= n_devices:
        if n_devices % f == 0 and f <= n_devices // f:
            x = max(x, f)
        f += 1
    return n_devices // x, x


def auto_fill_mesh(bands: int = 1) -> Mesh | None:
    """The fill API's automatic mesh: a ('b', 'x') mesh over ALL default-
    backend devices when more than one is visible, else None (single-device
    route). The band axis never exceeds the actual band count — a 1-band
    image on 8 chips gets (1, 8), all devices on rows.

    This is what lets ``blend_images_poisson`` / ``filling_missing_portions_
    smooth_boundaries`` scale out with zero caller changes (reference
    surface: src/main.cpp:46-58 — strictly single-device there)."""
    n = len(jax.devices())
    if n <= 1:
        return None
    b, x = split_band_spatial(n)
    while b > max(bands, 1):
        # fold surplus band shards into the spatial axis
        b, x = b // 2, x * 2
    return jax.make_mesh((b, x), ("b", "x"))


def resolve_fill_mesh(setting, bands: int = 1) -> Mesh | None:
    """SolverConfig.mesh policy -> a Mesh or None. ``setting`` is "auto"
    (mesh over all devices when >1), None/"off" (never shard), or an
    explicit jax.sharding.Mesh (used as-is)."""
    if setting is None or setting == "off":
        return None
    if isinstance(setting, Mesh):
        return setting
    if setting == "auto":
        return auto_fill_mesh(bands)
    raise ValueError(f"unknown mesh setting {setting!r}")


def split_band_spatial(n_devices: int) -> tuple[int, int]:
    """The default (b, x) split: largest band divisor <= min(4, sqrt(n)).

    Pure policy function so odd device counts are testable without
    provisioning that many devices (see spatial_band_mesh docstring).
    """
    for cand in (4, 3, 2):
        if n_devices % cand == 0 and n_devices // cand >= cand:
            return cand, n_devices // cand
    return 1, n_devices
