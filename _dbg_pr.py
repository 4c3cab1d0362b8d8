import jax, jax.numpy as jnp, numpy as np
import tests.test_replay_persistent as tp
from tpu_pathtracer.models import camera as cm, scene as sc
from tpu_pathtracer.ops.pallas.replay_persistent import (
    persistent_replay_call, pixel_lanes_layout, target_to_lanes)
from tpu_pathtracer.ops.pallas.trace_kernel import pack_camera
W,H,TR,MB,RRS,SPP,BUDGET = tp.W,tp.H,tp.TR,tp.MB,tp.RRS,tp.SPP,tp.BUDGET
scene, cs = sc.cornell_spheres()
camera = cm.make_camera(cs["eye"], cs["look_at"], cs["up"], W, H, cs["fov"])
seed = jnp.asarray([4, 11], jnp.int32)
rng = np.random.default_rng(7)
target = jnp.asarray(rng.random((H, W, 3), np.float32))
rows_total, n_lanes = pixel_lanes_layout(W, H, TR)
L, ns, loss, gA, gI, nrays = persistent_replay_call(
    scene, pack_camera(camera), seed, jnp.int32(0),
    target_to_lanes(target, rows_total),
    spp=SPP, budget=BUDGET, width=W, height=H, max_bounces=MB,
    rr_start=RRS, tile_rows=TR, use_nee=True, interpret=True)
Lk = np.asarray(L).reshape(-1,3)[:n_lanes]
nk = np.asarray(ns).reshape(-1)[:n_lanes]

# replica forward: reuse the replica loss machinery but extract Ls
lf = tp._replica_loss_fn(scene, camera, target, (4,11), BUDGET, True)
# monkey: recompute Ls by calling loss_fn pieces is hard; instead rerun with grad-free eval and ask for loss only
# quick per-lane: re-implement via closure? Instead: compute replica loss and kernel loss from Lk for sanity
have = nk > 0
img_k = Lk / np.maximum(nk,1)[:,None]
d = (img_k - np.asarray(target).reshape(-1,3)) * have[:,None]
print("kernel loss:", float(loss), "recomputed:", (d*d).sum()/(W*H*3))
print("n mismatch lanes will need replica Ls; printing kernel n_samp hist:", np.bincount(nk))
