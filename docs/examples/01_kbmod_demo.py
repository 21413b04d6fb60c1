# %% [markdown]
# # KBMOD-TPU demo
#
# The end-to-end workflow on demo data — the kbmod_tpu equivalent of the
# reference's `notebooks/KBMOD_Demo.ipynb`: create a small WorkUnit with
# an injected moving object, run the full search pipeline, and look at
# the recovered trajectories.
#
# Run as a script (`python docs/examples/01_kbmod_demo.py`) or open in
# any percent-format-aware notebook UI (VS Code, Jupytext).

# %%
# Make the repo importable when run as a plain script.
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import tempfile, os
import numpy as np

from kbmod_tpu.fake_data.demo_helper import make_demo_data
from kbmod_tpu.run_search import SearchRunner
from kbmod_tpu.work_unit import WorkUnit

workdir = tempfile.mkdtemp()
wu_file = os.path.join(workdir, "demo.fits")
make_demo_data(wu_file)  # 10 x 512 x 512 stack with one inserted object
work = WorkUnit.from_fits(wu_file)
print(f"WorkUnit: {work.im_stack.num_times} images, "
      f"{work.im_stack.height}x{work.im_stack.width}")

# %% [markdown]
# ## Run the search
#
# The configuration travels inside the WorkUnit. The demo config searches
# a small velocity grid; `SearchRunner` runs every pipeline phase
# (psi/phi build, core search, sigma-G, clustering, stamps).

# %%
results = SearchRunner().run_search_from_work_unit(work)
print(f"{len(results)} results")
print(results.colnames)

# %% [markdown]
# ## Inspect the best result

# %%
best = np.argmax(results["likelihood"])
row = results[best]
print(f"best: x={row['x']} y={row['y']} vx={row['vx']:.2f} vy={row['vy']:.2f} "
      f"lh={row['likelihood']:.1f} obs={row['obs_count']}")

# %%
# Results persist to any of .ecsv/.parquet/.hdf5.
out = os.path.join(workdir, "results.ecsv")
results.write_table(out)
print("wrote", out)
