"""Device-mesh construction helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(shape: tuple[int, ...], axis_names: tuple[str, ...]) -> Mesh:
    """Mesh over the first prod(shape) available devices."""
    return jax.make_mesh(shape, axis_names)


def spatial_band_mesh(n_devices: int | None = None) -> Mesh:
    """A ('b', 'x') mesh: band (data-parallel) axis x spatial (row) axis.

    Splits devices as evenly as possible, favouring the spatial axis — the
    halo-exchange stencil rides ICI while bands are embarrassingly parallel.
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    b = 1
    for cand in (4, 2, 1):
        if n_devices % cand == 0 and n_devices // cand >= cand:
            b = cand
            break
    return jax.make_mesh((b, n_devices // b), ("b", "x"))
