import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import jax, jax.numpy as jnp, numpy as np, time
from slam_constructor_tpu.ops import raycast, grid as gridlib, cells
from slam_constructor_tpu.utils import datagen
occ, origin, scale = datagen.cecum_world()
bearings = datagen.default_bearings(360)
pose = jnp.array([0.3, -1.45, 0.7])
s = raycast.cast_rays(occ, origin, scale, pose, bearings)
cfg_p = raycast.BeamConfig(wall_blur=True, free_impl="polar")
gm = gridlib.make_grid_map(cells.BayesAvgCell(), 256, 256, 0.1)
a = np.asarray(raycast._polar_free_plane(256, 256, gm.origin, 0.1, pose, s, cfg_p))
b = np.asarray(raycast._polar_free_plane_pallas(256, 256, gm.origin, 0.1, pose, s, cfg_p))
print("on-chip bitwise equal:", np.array_equal(a, b), "maxdiff:", float(np.abs(a-b).max()))
# also full insert equality polar vs polar_pallas (same occupied path)
model = cells.BayesAvgCell()
ga = raycast.insert_scan(gm, model, pose, s, raycast.BeamConfig(wall_blur=True, free_impl="polar"))
gb = raycast.insert_scan(gm, model, pose, s, raycast.BeamConfig(wall_blur=True, free_impl="polar_pallas"))
print("insert bitwise:", np.array_equal(np.asarray(ga.cells), np.asarray(gb.cells)))
