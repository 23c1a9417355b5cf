"""Test configuration: force JAX onto a virtual 8-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware (the JAX analog
of multi-node testing — see SURVEY.md §4).

Note: this machine's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars set here are too late for
jax.config's env snapshot — we update the config object directly, before any
backend is initialized.
"""

import os
import sys
from pathlib import Path

if os.environ.get("SAT_TPU_TESTS") == "1":
    # opt-out: keep the session's default backend (the real TPU) so the
    # Pallas kernel tests run for real — `SAT_TPU_TESTS=1 pytest tests/test_pallas.py`
    import jax  # noqa: F401
else:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
