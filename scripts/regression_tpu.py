"""The reference's full regression config (tests/test_regression_test.py:131)
run on real TPU: 20x1024x512 stack, 20 known trajectories (2 starting
off-chip), EclipticCenteredSearch 26x52 grid, in-kernel sigma-G with
clip_negative, median stamps. Requires every injected object recovered.
"""
import os, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.core.psf import PSF
from kbmod_tpu.fake_data.fake_data_creator import (
    image_stack_add_fake_object,
    make_fake_image_stack,
)
from kbmod_tpu.results import Results
from kbmod_tpu.run_search import SearchRunner
from kbmod_tpu.search import Trajectory
from kbmod_tpu.trajectory_utils import match_trajectory_sets
from kbmod_tpu.work_unit import WorkUnit

FLUX = 500.0
TRJS = [
    Trajectory(357, 997, -15.814404, -172.098450, FLUX),
    Trajectory(477, 777, -70.858154, -117.137817, FLUX),
    Trajectory(408, 533, -53.721024, -106.118118, FLUX),
    Trajectory(425, 740, -32.865086, -132.898575, FLUX),
    Trajectory(515, 881, -73.831688, -93.251732, FLUX),
    Trajectory(412, 980, -79.985207, -192.813080, FLUX),
    Trajectory(443, 923, -36.977375, -103.556976, FLUX),
    Trajectory(368, 1015, -43.644382, -176.487488, FLUX),
    Trajectory(510, 1011, -125.422997, -166.863983, FLUX),
    Trajectory(398, 939, -51.037308, -107.434616, FLUX),
    Trajectory(491, 925, -74.266739, -104.155556, FLUX),
    Trajectory(366, 824, -18.041782, -153.808197, FLUX),
    Trajectory(477, 870, -45.608849, -90.093689, FLUX),
    Trajectory(447, 993, -38.152031, -196.087646, FLUX),
    Trajectory(481, 882, -96.767357, -143.192352, FLUX),
    Trajectory(423, 912, -104.900154, -125.859169, FLUX),
    Trajectory(409, 803, -99.066856, -173.469589, FLUX),
    Trajectory(328, 797, -33.212299, -196.984467, FLUX),
    Trajectory(466, 1026, -67.892105, -118.881493, FLUX),  # off chip y
    Trajectory(514, 795, -20.134245, -171.646683, FLUX),  # off chip x
]

num_times = 20
times, psf_vals = [], []
seen, day = 0, 0
for i in range(num_times):
    times.append(57130.2 + day + seen * 0.01)
    seen += 1
    if seen == 4:
        seen, day = 0, day + 1
    psf_vals.append(1.05 - 0.1 + 0.1 * (i % 3))

psfs = [PSF.make_gaussian_kernel(v) for v in psf_vals]
rng = np.random.default_rng(1001)
stack = make_fake_image_stack(1024, 512, times, noise_level=4.0, psfs=psfs, rng=rng)
for trj in TRJS:
    image_stack_add_fake_object(stack, trj.x, trj.y, trj.vx, trj.vy, flux=trj.flux)

config = SearchConfiguration.from_dict({
    "psf_val": 1.05,
    "generator_config": {
        "name": "EclipticCenteredSearch",
        "angles": [np.pi - np.pi / 10.0, np.pi + np.pi / 10.0, 26],
        "velocities": [92.0, 550.0, 52],
        "angle_units": "radian",
        "given_ecliptic": 1.1901106654050821,
    },
    "num_obs": 15,
    "lh_level": 25.0,
    "sigmaG_lims": [25, 75],
    "stamp_type": "median",
    "cluster_eps": 20.0,
    "gpu_filter": True,
    "clip_negative": True,
    "x_pixel_buffer": 10,
    "y_pixel_buffer": 10,
})

with tempfile.TemporaryDirectory() as tmp:
    res_file = os.path.join(tmp, "results.ecsv")
    config.set("result_filename", res_file)
    wu = WorkUnit(im_stack=stack, config=config)
    wu.org_img_meta["visit"] = [f"img_{i}" for i in range(stack.num_times)]

    t0 = time.time()
    runner = SearchRunner()
    runner.run_search_from_work_unit(wu)
    print("pipeline", time.time() - t0, "s", flush=True)
    spans = {k: v[1] - v[0] for k, v in runner.phase_times.items() if v[1] is not None}
    for phase, dt in sorted(spans.items(), key=lambda kv: -kv[1]):
        print(f"  phase {phase}: {dt:.2f}s", flush=True)

    loaded = Results.read_table(res_file)
    found = loaded.make_trajectory_list()
    print(f"found {len(found)} results", flush=True)
    assert loaded.table.meta["num_img"] == num_times
    assert tuple(loaded.table.meta["dims"]) == (stack.width, stack.height)
    assert np.allclose(loaded.table.meta["mjd_mid"], times)

    matches = match_trajectory_sets(TRJS, found, 3.0, [0.0, 2.0])
    missing = np.where(np.asarray(matches) == -1)[0]
    print("missing:", [str(TRJS[i]) for i in missing], flush=True)
    assert len(missing) == 0, f"{len(missing)} objects not recovered"
    print("REGRESSION TPU OK: all 20 recovered", flush=True)
