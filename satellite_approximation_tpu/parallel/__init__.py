"""Multi-chip execution: device meshes, halo exchange, sharded solvers.

The reference is strictly single-process/single-device (one OpenCL context,
ComputeEnvironment.cpp:9-14). This package is the new capability that takes
its algorithms to TPU pods: spatial sharding over a ``jax.sharding.Mesh``
with ICI halo exchange (``ppermute``) for stencils and ``psum`` reductions
for solver dot products, plus a band axis for data-parallel channels.
"""

from .mesh import make_mesh, spatial_band_mesh, spatial_mesh_2d
from .halo import halo_pad_cols, halo_pad_rows
from .solver import sharded_masked_cg, sharded_training_step
from .mg import sharded_mg_solve, sharded_mg_solve_2d
from .fill import sharded_fill

__all__ = [
    "make_mesh",
    "spatial_band_mesh",
    "spatial_mesh_2d",
    "halo_pad_rows",
    "halo_pad_cols",
    "sharded_masked_cg",
    "sharded_training_step",
    "sharded_mg_solve",
    "sharded_mg_solve_2d",
    "sharded_fill",
]
