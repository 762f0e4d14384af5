"""Drive gsjax end-to-end through the public package surface:
synthesize a scene → save .splat → reload → render on two backends → PNG."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

import gsjax
from gsjax import Camera, Gaussians, RenderConfig, load_splat, save_splat, render, OrbitCamera

rng = np.random.default_rng(42)
n = 400
# colorful cloud of splats
means = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-0.9, 0.9, n), rng.uniform(4, 7, n)], -1)
q = rng.normal(size=(n, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
g = Gaussians.from_activated(
    means=means, scales=rng.uniform(0.03, 0.15, (n, 3)), quats=q,
    opacities=rng.uniform(0.4, 0.95, n), rgb=rng.uniform(0, 1, (n, 3)))

save_splat(g, "scene.splat")
g2 = load_splat("scene.splat")
print("reloaded:", g2.n, "splats")

cam = Camera.create(fx=300, fy=300, width=320, height=240)
cfg = RenderConfig(backend="xla", background=(0.1, 0.1, 0.15))
img, aux = render(g2, cam, cfg, return_aux=True)
img = np.asarray(img)
print("img", img.shape, "range", img.min(), img.max(),
      "pairs", int(aux["n_pairs"]), "overflow", int(aux["n_tile_overflow"]),
      "fat_ovf", int(aux.get("n_fat_overflow", 0)))
assert int(aux["n_tile_overflow"]) == 0
assert int(aux.get("n_fat_overflow", 0)) == 0, "fat-split budget overflow"

# orbit trajectory through the public OrbitCamera
orb = OrbitCamera(radius=6.0, target=(0, 0, 5.5))
frames = orb.trajectory(4, alpha_end=0.6, fx=300, fy=300, width=320, height=240)
imgs = [np.asarray(render(g2, c, cfg)) for c in frames]
print("orbit frames:", len(imgs), "motion delta:", float(np.abs(imgs[0]-imgs[-1]).mean()))

# write PNGs without external deps (PPM)
def write_ppm(path, im):
    u8 = (np.clip(im, 0, 1) * 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (im.shape[1], im.shape[0])); f.write(u8.tobytes())
write_ppm("frame.ppm", img)
for i, im in enumerate(imgs): write_ppm(f"orbit_{i}.ppm", im)

# oracle agreement at the surface
cfg_o = RenderConfig(backend="oracle", background=(0.1, 0.1, 0.15))
img_o = np.asarray(render(g2, cam, cfg_o))
print("max |xla - oracle| =", float(np.abs(img - img_o).max()))
assert float(np.abs(img - img_o).max()) < 1e-4, "backend diverged from oracle"

# differentiability at the surface
import jax.numpy as jnp
loss = lambda gg: jnp.mean((render(gg, cam, cfg) - jnp.asarray(img_o))**2)
grads = jax.grad(loss)(g2)
print("grad norms:", {k: float(jnp.linalg.norm(v)) for k, v in
      zip(["means","log_scales","quats","sh","opacity"], jax.tree.leaves(grads))})
