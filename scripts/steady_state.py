"""Steady-state repeated searches on one StackSearch (production pattern)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.search import StackSearch, Trajectory

ds = FakeDataSet(512, 1024, create_fake_times(20, 57130.0, obs_per_day=4), use_seed=3)
ds.insert_object(Trajectory(x=256, y=512, vx=-40.0, vy=-120.0, flux=500.0))
stack = ds.stack_py
cands = [Trajectory(vx=vx, vy=vy) for vx in np.linspace(-120, 0, 26) for vy in np.linspace(-200, -90, 52)]
print(f"{len(cands)} candidates, 20x1024x512 float stack", flush=True)

search = StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times, -1)
search.set_min_obs(15)
search.set_min_lh(10.0)
search.preload_psi_phi_array()

for i in range(4):
    t0 = time.time()
    search.search_all(cands, True)
    n = search.get_number_total_results()
    dt = time.time() - t0
    evals = len(cands) * 512 * 1024
    print(f"search {i}: {dt:.2f}s  {n} results  {evals/dt:.3e} evals/s", flush=True)
best = search.get_results(0, 1)[0]
print("best:", best.x, best.y, best.vx, best.vy, flush=True)
