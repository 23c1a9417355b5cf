"""Sharded multigrid at representative scale on the virtual CPU mesh.

VERDICT r2 item 4 asked for sharded_mg_solve at >= 2048^2 over the 8-device
CPU mesh with >= 3 distributed levels and iteration-count parity with
single-device sharding. This runs exactly that and emits one JSON row
(results config 8): iteration counts at xdim=1 vs xdim=4, residuals, the
distributed-level depth actually exercised, and the analytic per-iteration
ICI comm volume.

Must run in a FRESH interpreter with the TPU backend disabled (the virtual
CPU mesh would otherwise not form):

    PALLAS_AXON_POOL_IPS= XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python benchmarks/sharded_scale.py [--size 2048]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--bands", type=int, default=2)
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS") != "cpu":
        # re-exec with the right env so jax initializes CPU-only with 8
        # virtual devices (sitecustomize imports jax before main() runs)
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    import numpy as np
    import jax
    import satellite_approximation_tpu  # noqa: F401
    import bench
    from satellite_approximation_tpu.parallel.mesh import (
        spatial_band_mesh,
        spatial_mesh_2d,
    )
    from satellite_approximation_tpu.parallel.mg import (
        sharded_mg_solve, sharded_mg_solve_2d, build_sharded_hierarchy,
        comm_volume_report, comm_volume_report_2d, _MIN_LOCAL_ROWS,
    )
    from satellite_approximation_tpu.models.cg import neighbor_degree, shift_sum

    assert len(jax.devices()) >= 8, jax.devices()
    n = args.size
    c = args.bands
    umask = bench.make_mask(n, n)
    deg = neighbor_degree((n, n))
    imgs = np.stack([bench.smooth(n, n, s) for s in range(c)])
    known = imgs * (~umask)
    b = np.stack([np.asarray(shift_sum(k)) for k in known]) * umask
    b = b.astype(np.float32)
    x0 = np.zeros_like(b)

    _, dist_levels, repl_levels = build_sharded_hierarchy(umask, deg, 4)
    depth = len(dist_levels)

    rows = {}
    for xdim in (1, 4):
        mesh = spatial_band_mesh(2 * xdim, shape=(2, xdim))
        t0 = time.perf_counter()
        x, iters, rel = sharded_mg_solve(
            b, x0, umask, None, mesh, tolerance=1e-6, max_iterations=200
        )
        dt = time.perf_counter() - t0
        rows[xdim] = {
            "iterations": int(iters),
            "max_rel_residual": float(np.max(np.asarray(rel))),
            "wall_s": round(dt, 2),
        }
        print(f"xdim={xdim}: {rows[xdim]}", flush=True)

    assert rows[1]["iterations"] == rows[4]["iterations"], rows
    assert rows[4]["max_rel_residual"] <= 1e-6, rows

    # 2-D spatial tiling (VERDICT r3 item 2): (2,2) vs (4,1) over the same
    # 4 spatial devices — same solve, both to 1e-6; the (4,1) degenerate
    # column axis runs the 2-D code path on a rows-only partition
    rows2d = {}
    for ydim, xdim in ((2, 2), (4, 1)):
        mesh = spatial_mesh_2d(4 * 1, shape=(1, ydim, xdim))
        t0 = time.perf_counter()
        x, iters, rel = sharded_mg_solve_2d(
            b, x0, umask, None, mesh, tolerance=1e-6, max_iterations=200
        )
        dt = time.perf_counter() - t0
        rows2d[f"{ydim}x{xdim}"] = {
            "iterations": int(iters),
            "max_rel_residual": float(np.max(np.asarray(rel))),
            "wall_s": round(dt, 2),
        }
        print(f"2d {ydim}x{xdim}: {rows2d[f'{ydim}x{xdim}']}", flush=True)
    assert all(r["max_rel_residual"] <= 1e-6 for r in rows2d.values()), rows2d

    comm = comm_volume_report(n, n, c, 4, umask)
    comm2d = comm_volume_report_2d(n, n, c, 2, 2, umask)
    out = {
        "metric": "sharded_mg_parity",
        "size": n,
        "bands": c,
        "distributed_levels_at_xdim4": depth,
        "min_local_rows": _MIN_LOCAL_ROWS,
        "xdim1": rows[1],
        "xdim4": rows[4],
        "iteration_parity": True,
        "mesh2d_2x2": rows2d["2x2"],
        "mesh2d_4x1": rows2d["4x1"],
        "ici_bytes_per_pcg_iteration": comm["bytes_per_pcg_iteration"],
        "ici_bytes_per_pcg_iteration_2d_2x2": comm2d["bytes_per_pcg_iteration"],
        "tail_allgather_bytes": comm["tail_allgather_bytes"],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
