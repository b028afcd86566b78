"""Large-mesh distributed paths on a 32-virtual-device CPU mesh.

The main conftest pins an 8-device mesh; the butterfly ICI R-tree's
large-D claim (log2(D) ppermute rounds, parallel/dtsqr.py) deserves a
bigger mesh.  XLA parses the device-count flag once per process, so the
32-device check runs in a subprocess with its own XLA_FLAGS.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import jax, jax.numpy as jnp, numpy as np
from tsqr_tpu.parallel import dtsqr, mesh as mesh_mod

assert len(jax.devices()) >= 32, jax.devices()
mesh = mesh_mod.make_mesh(32)
m, n = 32 * 96, 24
a = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (m, n)).astype(np.float32))
a = jax.device_put(a, mesh_mod.row_sharding(mesh))
for tree in ("allgather", "butterfly"):
    q, r = dtsqr.dtsqr(a, mesh, "bf16x6_cor", tree=tree)
    qn = np.asarray(q, np.float64); rn = np.asarray(r, np.float64)
    an = np.asarray(a, np.float64)
    resid = np.linalg.norm(an - qn @ rn) / np.linalg.norm(an)
    orth = np.linalg.norm(qn.T @ qn - np.eye(n)) / np.sqrt(n)
    assert resid < 5e-6 and orth < 5e-6, (tree, resid, orth)
    print(f"{tree}: resid={resid:.2e} orth={orth:.2e}")
# distributed BlockQR (psum trailing + CGS2) at D=32
q, r = dtsqr.dqr(a, mesh, "bf16x6_cor", reorth=True, panel_width=8,
                 leaf_rows=96)
qn = np.asarray(q, np.float64); rn = np.asarray(r, np.float64)
an = np.asarray(a, np.float64)
resid = np.linalg.norm(an - qn @ rn) / np.linalg.norm(an)
orth = np.linalg.norm(qn.T @ qn - np.eye(n)) / np.sqrt(n)
assert resid < 5e-6 and orth < 5e-6, ("dqr", resid, orth)
print(f"dqr: resid={resid:.2e} orth={orth:.2e}")
print("MESH32_OK")
"""


@pytest.mark.slow
def test_distributed_paths_on_32_device_mesh(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=32"
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    # the site hook pre-imports jax before env vars can take effect for
    # the platform, so also force via -c config update before any use
    prelude = ("import jax; jax.config.update('jax_platforms', 'cpu')\n"
               "import jax.extend; jax.extend.backend.clear_backends()\n")
    proc = subprocess.run(
        [sys.executable, "-c", prelude + _SCRIPT],
        env=env, capture_output=True, text=True, timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert "MESH32_OK" in proc.stdout, (proc.stdout[-2000:],
                                        proc.stderr[-2000:])
