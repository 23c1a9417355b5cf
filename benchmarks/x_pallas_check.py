"""TPU parity check: tuple-omega fused kernel vs XLA unrolled sweeps."""
import sys; from pathlib import Path; sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np
import jax, jax.numpy as jnp
from satellite_approximation_tpu.ops.pallas_kernels import fused_jacobi_tpu
from satellite_approximation_tpu.models.cg import masked_laplacian, neighbor_degree
from satellite_approximation_tpu.models import multigrid as M

rng = np.random.default_rng(0)
c, h, w = 2, 600, 700
u = jnp.asarray(rng.random((c, h, w)), jnp.float32)
b = jnp.asarray(rng.random((c, h, w)), jnp.float32)
um = jnp.asarray(rng.random((h, w)) > 0.4)
dg = jnp.asarray(neighbor_degree((h, w)))
inv = jnp.where(dg > 0, 1.0 / dg, 0.0)
omegas = M._smoother_omegas(6)
print("omegas:", [round(o, 4) for o in omegas])

@jax.jit
def xla_ref(u):
    uu = u
    for om in omegas:
        au = masked_laplacian(uu, um, dg)
        uu = uu + om * (b - au) * inv * um.astype(uu.dtype)
    r = (b - masked_laplacian(uu, um, dg)) * um.astype(uu.dtype)
    return uu, r

want_u, want_r = jax.block_until_ready(xla_ref(u))
got_u, got_r = jax.block_until_ready(
    fused_jacobi_tpu(u, b, um, dg, sweeps=6, omega=omegas, emit_residual=True))
du = float(jnp.max(jnp.abs(want_u - got_u)))
dr = float(jnp.max(jnp.abs(want_r - got_r)))
print(f"max |du| = {du:.3e}  max |dr| = {dr:.3e}")
assert du < 5e-6 and dr < 5e-5, "MISMATCH"

# dense coarse inverse sanity on TPU: exact coarse solve
mC = np.asarray(rng.random((24, 24)) > 0.35)
dC = neighbor_degree((24, 24))
Ainv = jax.block_until_ready(M._dense_coarse_inverse(jnp.asarray(mC), jnp.asarray(dC)))
rr = jnp.asarray(rng.random((1, 24, 24)), jnp.float32) * jnp.asarray(mC)
e = (rr.reshape(1, -1).astype(jnp.float32) @ Ainv.T).reshape(rr.shape)
ae = masked_laplacian(e * jnp.asarray(mC), jnp.asarray(mC), jnp.asarray(dC)) * jnp.asarray(mC)
res = float(jnp.max(jnp.abs(ae - rr)))
print(f"dense coarse |A e - r|_inf = {res:.3e}")
assert res < 1e-3
print("PALLAS-CHECK-OK")
