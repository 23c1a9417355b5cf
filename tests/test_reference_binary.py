"""Parity vs the COMPILED REFERENCE solver.

tests/reference_build compiles the reference's poisson.cpp (and utils.cpp)
UNMODIFIED from /root/reference against the vendored Eigen, system OpenCV,
and minimal header shims for the offline-unavailable logging/date/range
libraries (all off the numeric path — see tests/reference_build/build.sh).
That makes these tests an INDEPENDENT data point: our JAX solve vs the
genuine Eigen ConjugateGradient running the reference's own assembly
(poisson.cpp:145-290), not vs a reimplemented oracle.

Target: 1e-5 per-pixel agreement (BASELINE.md north-star).
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent
BUILD = ROOT / "tests" / "reference_build" / "build.sh"


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ unavailable")
    out = tmp_path_factory.mktemp("ref_oracle")
    res = subprocess.run(
        ["bash", str(BUILD), str(out)], capture_output=True, text=True,
        timeout=600,
    )
    if res.returncode != 0:
        pytest.skip(f"reference build failed: {res.stderr[-800:]}")
    return out / "ref_poisson_oracle"


def _run_oracle(oracle, tmp, inputs, repl, mask, tol=1e-6, max_iters=0):
    c, h, w = inputs.shape
    (tmp / "in.bin").write_bytes(np.ascontiguousarray(inputs, np.float64).tobytes())
    (tmp / "rep.bin").write_bytes(np.ascontiguousarray(repl, np.float64).tobytes())
    (tmp / "mask.bin").write_bytes(np.ascontiguousarray(mask, np.uint8).tobytes())
    subprocess.run(
        [
            str(oracle), str(tmp / "in.bin"), str(tmp / "rep.bin"),
            str(tmp / "mask.bin"), str(c), str(h), str(w), str(tol),
            str(max_iters), str(tmp / "out.bin"),
        ],
        check=True,
        timeout=600,
    )
    return np.frombuffer((tmp / "out.bin").read_bytes(), np.float64).reshape(
        c, h, w
    )


class TestReferenceBinaryParity:
    def _case(self, seed=5, c=3, h=96, w=120):
        rng = np.random.default_rng(seed)
        inputs = rng.random((c, h, w)) * 200.0
        repl = rng.random((c, h, w)) * 200.0
        mask = np.zeros((h, w), bool)
        mask[18:70, 25:95] = True
        mask[4:8, 60:110] = True  # a second blob touching fewer borders
        return inputs, repl, mask

    def test_poisson_blend_matches_reference_binary(self, oracle, tmp_path):
        from satellite_approximation_tpu.models.poisson import blend_images_poisson

        inputs, repl, mask = self._case()
        want = _run_oracle(oracle, tmp_path, inputs, repl, mask, tol=1e-9)
        got = blend_images_poisson(inputs, repl, mask, tolerance=1e-9)
        # known pixels pass through untouched in both
        np.testing.assert_array_equal(want[:, ~mask], inputs[:, ~mask])
        np.testing.assert_array_equal(got[:, ~mask], inputs[:, ~mask])
        # solved values: 1e-5 per-pixel parity vs genuine Eigen CG on the
        # reference's own assembly (values span ~[0, 200])
        err = np.max(np.abs(want - got))
        assert err <= 1e-5 * 200.0, f"max |ref - ours| = {err}"

    def test_default_tolerance_contract(self, oracle, tmp_path):
        """At the reference's default 1e-6 (and its n/2 max-iteration cap)
        both solvers sit within CG-tolerance distance of each other."""
        from satellite_approximation_tpu.models.poisson import blend_images_poisson

        inputs, repl, mask = self._case(seed=11, h=64, w=80)
        want = _run_oracle(oracle, tmp_path, inputs, repl, mask, tol=1e-6)
        got = blend_images_poisson(inputs, repl, mask, tolerance=1e-6)
        # two DISTINCT solutions at 1e-6 relative residual differ by up to
        # ~kappa * tol in value (measured ~5e-3 on this case, values ~200)
        err = np.max(np.abs(want - got))
        assert err <= 2e-2, f"max |ref - ours| = {err} at tol 1e-6"
