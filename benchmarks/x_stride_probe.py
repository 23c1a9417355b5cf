"""EXPERIMENT: which subsample-by-2 idioms does Mosaic lower on this TPU?

Restriction fusion (writing the coarse residual straight out of the
smoother window) needs an even-index subsample along both axes inside a
Pallas kernel. Candidate idioms, probed independently so one failure
doesn't mask another:

  A. strided slice on the sublane axis:  y = x[0::2, :]
  B. strided slice on the lane axis:     y = x[:, 0::2]
  C. reshape-pair trick on lanes:        x.reshape(r, c//2, 2)[..., 0]

Run: python benchmarks/x_stride_probe.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 128, 512


def probe(name, kernel, out_shape, check):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        x = jnp.asarray(np.random.default_rng(0).random((R, C), np.float32))
        y = np.asarray(jax.jit(fn)(x))
        ok = check(np.asarray(x), y)
        print(f"{name}: LOWERED, correct={ok}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILED ({type(e).__name__}: {msg})")


def main():
    probe(
        "A sublane x[0::2, :]",
        lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:][0::2, :]),
        (R // 2, C),
        lambda x, y: np.array_equal(y, x[0::2, :]),
    )
    probe(
        "B lane x[:, 0::2]",
        lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:][:, 0::2]),
        (R, C // 2),
        lambda x, y: np.array_equal(y, x[:, 0::2]),
    )
    probe(
        "C reshape-pair lanes",
        lambda x_ref, o_ref: o_ref.__setitem__(
            slice(None), x_ref[:].reshape(R, C // 2, 2)[:, :, 0]
        ),
        (R, C // 2),
        lambda x, y: np.array_equal(y, x[:, 0::2]),
    )
    # D: both axes at once (the restrict shape)
    probe(
        "D both x[0::2, 0::2]",
        lambda x_ref, o_ref: o_ref.__setitem__(slice(None), x_ref[:][0::2, 0::2]),
        (R // 2, C // 2),
        lambda x, y: np.array_equal(y, x[0::2, 0::2]),
    )
    # E: interleave (prolong direction): even/odd lanes from two halves
    def interleave_kernel(x_ref, o_ref):
        x = x_ref[:]
        half = x[:, : C // 2]
        out = jnp.stack([half, half + 1.0], axis=-1).reshape(R, C)
        o_ref[:] = out

    probe(
        "E stack-interleave lanes",
        interleave_kernel,
        (R, C),
        lambda x, y: np.array_equal(y[:, 0::2], x[:, : C // 2])
        and np.array_equal(y[:, 1::2], x[:, : C // 2] + 1.0),
    )


if __name__ == "__main__":
    main()
