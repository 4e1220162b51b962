"""End-to-end library-surface verification on the current backend.

Drives checkpoint -> NeRFRenderer -> uint8 frames (the /verify recipe):
missing-checkpoint RuntimeError, parity render content + yaw variation,
and the int8 serving path staying within a few uint8 levels of parity.
Exits nonzero (assert) on any failure. ~15 min on the axon TPU (compiles
dominate); on CPU the int8 leg is skipped (it requires the fused kernel).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import torch, jax, numpy as np
from nerf_workspaces_explorer_tpu.core import COORD
from nerf_workspaces_explorer_tpu.infer import NeRFRenderer
from nerf_workspaces_explorer_tpu.infer.checkpoint import params_to_torch_state_dict
from nerf_workspaces_explorer_tpu.models import NerfMLPSpec, init_nerf_params

spec = NerfMLPSpec()
k1, k2 = jax.random.split(jax.random.PRNGKey(42))
pc, pf = init_nerf_params(k1, spec), init_nerf_params(k2, spec)
for p in (pc, pf):
    p["alpha"]["b"] += 2.0
    p["rgb"]["w"] *= 8.0
torch.save({
    "global_step": 0,
    "network_coarse_state_dict": {k: torch.tensor(np.asarray(v)) for k, v in params_to_torch_state_dict(pc).items()},
    "network_fine_state_dict": {k: torch.tensor(np.asarray(v)) for k, v in params_to_torch_state_dict(pf).items()},
    "optimizer_state_dict": {},
}, "/tmp/model.ckpt")

init = COORD(x=1.0, y=-0.5, z=0.5, pitch=-90.0)

# Missing checkpoint must raise (reference behavior).
try:
    rr = NeRFRenderer("tokyo", "/tmp/nope.ckpt"); rr.initialize_models()
    raise SystemExit("FAIL: missing ckpt did not raise")
except RuntimeError as e:
    print("missing-ckpt RuntimeError ok:", str(e)[:60])

r = NeRFRenderer("tokyo", "/tmp/model.ckpt")  # parity (jnp, fp32)
r.initialize_models()
img1 = r.render_coordinates(init, COORD(yaw=-30.0))
img2 = r.render_coordinates(init, COORD(yaw=60.0))
print("parity frame:", img1.shape, img1.dtype, "mean", img1.mean())
assert img1.shape == (240, 320, 3) and img1.dtype == np.uint8
assert img1.mean() > 2.0, "frame is black"
assert np.abs(img1.astype(int) - img2.astype(int)).mean() > 1.0, "views identical"
print("two-yaw difference ok:", np.abs(img1.astype(int)-img2.astype(int)).mean())

# int8 fused path (the serving surface: int8 trunk + heads). Fused
# kernels need the TPU; skip on CPU backends.
import imageio.v2 as imageio

imageio.imwrite("/tmp/verify_parity.png", img1)
if jax.devices()[0].platform == "tpu":
    r8 = NeRFRenderer("tokyo", "/tmp/model.ckpt", precision="int8")
    r8.initialize_models()
    img8 = r8.render_coordinates(init, COORD(yaw=-30.0))
    diff = np.abs(img8.astype(int) - img1.astype(int))
    print("int8-vs-parity: mean |d|", diff.mean(), "p99", np.percentile(diff, 99), "max", diff.max())
    assert diff.mean() < 2.0, f"int8 frame diverges: mean {diff.mean()}"
    imageio.imwrite("/tmp/verify_int8.png", img8)
else:
    print("int8 leg skipped (no TPU backend)")
print("VERIFY OK")
