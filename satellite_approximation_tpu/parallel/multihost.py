"""Multi-host (DCN) dryrun: the inter-host leg of SURVEY §2.5 P7.

Everything else in :mod:`parallel` runs single-process (one host, N chips
over ICI). Real pods add a second network tier — hosts connected over DCN,
each owning a slice of the global device mesh, coordinated by
``jax.distributed``. This module proves the sharded MG-PCG solver (and its
ppermute halo exchange) runs unchanged in that regime: N OS processes, each
with its own set of virtual CPU devices, one GLOBAL ('b', 'x') mesh spanning
all of them, XLA inserting the cross-process collectives.

The reference has no analog (single OpenCL device,
ComputeEnvironment.cpp:9-14); this is the blueprint's demand, not parity.

Design notes:

* each worker is a FRESH interpreter (this machine's sitecustomize imports
  jax with the TPU tunnel at startup, so platform env vars must be set
  before launch; workers pin ``JAX_PLATFORMS=cpu`` and neutralize the axon
  pool registration);
* problem data is built identically on every process from a fixed seed, so
  ``jax.device_put`` against the global sharding is well-defined (each
  process contributes its addressable shards of the same logical array);
* only replicated values (iteration count, per-band residual norms) cross
  back to the host — sharded arrays are never fetched, exactly like the
  production full-tile path.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _worker(argv: list[str]) -> None:
    """Entry point for one process of the DCN dryrun (run via
    ``python -m satellite_approximation_tpu.parallel.multihost``)."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--bands", type=int, default=1)
    ap.add_argument("--tolerance", type=float, default=1e-6)
    args = ap.parse_args(argv)

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import numpy as np

    n_global = args.num_processes * args.local_devices
    devs = jax.devices()
    assert len(devs) == n_global, (len(devs), n_global)
    assert len(jax.local_devices()) == args.local_devices

    mesh = jax.make_mesh((1, n_global), ("b", "x"))

    h = w = args.size
    rng = np.random.default_rng(7)
    umask = np.zeros((h, w), bool)
    umask[h // 8 : h - h // 8, w // 8 : w - w // 8] = True
    umask[3, 5 : w // 2] = True  # a thin crack crossing shard boundaries
    b = (rng.random((args.bands, h, w)) * umask).astype(np.float32)

    from .mg import sharded_mg_solve

    x, iters, rel = sharded_mg_solve(
        b, np.zeros_like(b), umask, None, mesh, tolerance=args.tolerance
    )
    rel_max = float(np.max(np.asarray(rel)))
    ok = rel_max <= args.tolerance
    if args.process_id == 0:
        print(
            "DCN_DRYRUN_RESULT "
            + json.dumps(
                {
                    "ok": bool(ok),
                    "process_count": args.num_processes,
                    "devices": n_global,
                    "local_devices_per_process": args.local_devices,
                    "size": args.size,
                    "iterations": int(iters),
                    "rel_residual": rel_max,
                }
            ),
            flush=True,
        )
    if not ok:
        raise SystemExit(2)


def dcn_dryrun(
    n_processes: int = 2,
    devices_per_process: int = 4,
    size: int = 256,
    timeout_s: float = 600.0,
) -> dict:
    """Run the 2-tier (multi-process over a local "DCN") solve and return
    the parsed result dict from process 0. Raises on failure."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # never let a worker claim the TPU tunnel
        XLA_FLAGS=(
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={devices_per_process}"
        ),
    )
    procs = []
    for pid in range(n_processes):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-m",
                    "satellite_approximation_tpu.parallel.multihost",
                    "--coordinator",
                    coordinator,
                    "--num-processes",
                    str(n_processes),
                    "--process-id",
                    str(pid),
                    "--local-devices",
                    str(devices_per_process),
                    "--size",
                    str(size),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout_s)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        if rc != 0:
            raise RuntimeError(
                f"DCN dryrun worker failed (rc={rc}):\n{out}\n{err[-2000:]}"
            )
    for rc, out, err in outs:
        for line in out.splitlines():
            if line.startswith("DCN_DRYRUN_RESULT "):
                return json.loads(line[len("DCN_DRYRUN_RESULT ") :])
    raise RuntimeError(f"DCN dryrun produced no result line: {outs}")


if __name__ == "__main__":
    _worker(sys.argv[1:])
