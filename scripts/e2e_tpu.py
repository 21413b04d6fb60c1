"""Full-pipeline smoke on the real TPU: fake dataset -> SearchRunner with
sigma-G + clustering + stamp coadds -> object recovery."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.run_search import SearchRunner
from kbmod_tpu.search import Trajectory

print("backend:", jax.default_backend(), flush=True)
times = create_fake_times(10, t0=57130.0, obs_per_day=5)
ds = FakeDataSet(512, 512, times, use_seed=1)
trj = Trajectory(x=300, y=200, vx=10.0, vy=-5.0, flux=500.0)
ds.insert_object(trj)

config = SearchConfiguration()
config.set("generator_config", {
    "name": "VelocityGridSearch",
    "vx_steps": 11, "min_vx": 5.0, "max_vx": 15.0,
    "vy_steps": 11, "min_vy": -10.0, "max_vy": 0.0,
})
config.set("num_obs", 8)
config.set("lh_level", 9.0)
config.set("do_clustering", True)
config.set("cluster_type", "all")
config.set("coadds", ["sum", "mean", "median"])
config.set("cnn_filter", False)
config.set("save_all_stamps", False)

t0 = time.time()
results = SearchRunner().run_search(config, ds.stack_py)
print("pipeline", time.time() - t0, "s;", len(results), "results", flush=True)
assert len(results) > 0
best = results.table
i = int(np.argmax(best["likelihood"]))
print("best:", best["x"][i], best["y"][i], best["vx"][i], best["vy"][i], best["likelihood"][i], flush=True)
assert abs(best["x"][i] - 300) <= 1 and abs(best["y"][i] - 200) <= 1
assert "coadd_mean" in results.colnames
print("E2E TPU OK", flush=True)
