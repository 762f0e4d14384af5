"""Multi-process worker for the 2-process distributed test (SURVEY §5.8,
BASELINE config 5's testable half): each process owns 2 virtual CPU
devices; the 4-device `tiles` mesh spans both processes, so the tile-
sharded train step's psum rides the distributed runtime exactly as it
would ride ICI/DCN on a pod.

Usage (spawned by tests/test_multiprocess.py):
  python tools/mp_worker.py <process_id> <num_processes> <port> <out_dir>
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out_dir = sys.argv[4]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np
import optax
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

from gsjax import Camera, RenderConfig
from gsjax.parallel.mesh import make_mesh
from gsjax.parallel.render_sharded import make_train_step, pad_target

assert jax.process_count() == nproc, jax.process_count()
n_dev = len(jax.devices())
dpp = n_dev // nproc  # devices per process

cfg = RenderConfig(backend="xla", tile_list_cap=128, chunk=32)
cam = Camera.create(fx=60, fy=60, width=64, height=64)

rng = np.random.default_rng(7)
n = 80
from gsjax.core.gaussians import Gaussians

g = Gaussians.from_activated(
    means=rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    + np.array([0, 0, 5], np.float32),
    scales=np.full((n, 3), 0.08, np.float32),
    quats=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
    opacities=np.full((n,), 0.7, np.float32),
    rgb=rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32),
)

mesh = make_mesh(n_dev)
target_np = np.asarray(
    pad_target(cfg, cam, np.zeros((64, 64, 3), np.float32) + 0.25, n_dev)
)

# host-local replicated params / tile-sharded target → global arrays
g = multihost_utils.host_local_array_to_global_array(
    jax.tree.map(np.asarray, g), mesh, P()
)
rows = target_np.shape[0] // n_dev
local_rows = target_np[pid * dpp * rows : (pid + 1) * dpp * rows]
target = multihost_utils.host_local_array_to_global_array(
    local_rows, mesh, P("tiles")
)

opt = optax.adam(1e-2)
step = make_train_step(cam, cfg, mesh, opt)
opt_state = opt.init(g)
losses = []
for _ in range(3):
    g, opt_state, loss, aux = step(g, opt_state, target)
    losses.append(float(jax.device_get(loss)))

if pid == 0:
    with open(os.path.join(out_dir, "losses.txt"), "w") as fh:
        fh.write(" ".join(f"{v:.8f}" for v in losses))
print(f"proc {pid}: losses={losses}")
