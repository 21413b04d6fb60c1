"""Measure KB_SNAP_ROW_ERROR at survey scale on the TPU (VERDICT r4 #5).

The 12-day physical default grid (257 velocities x 129 angles at 12-day
cadence; configuration.py:196-207 scaled per survey_scale.py) has ~9.3k
rounded-row classes for 33,153 candidates, so the uniform exact-row plan
auto-rejects and the search runs the spread grouped kernel. Row-class
snapping (ops/search.snap_vy_rows, opt-in KB_SNAP_ROW_ERROR) quantizes vy
so the classes collapse and the uniform kernel engages, at the cost of
moving each candidate's row position <= err px at the last observation.

This sweep measures, per snap value, on one real chip at full production
scale (100 x 4096^2 u8, full C): the class count, the uniform plan's
engage/reject decision, and the steady full-frame kernel rate. The word
stream is packed ONCE (grid-independent given the canonical guards) and
reused. Exactness of both kernel routes is covered by the suite and the
survey gates; this script is a pure rate measurement.

Usage: python scripts/snap_sweep.py   (~25-45 min incl. per-plan compiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from kbmod_tpu.ops.search import snap_vy_rows, trajectory_offsets
from kbmod_tpu.ops.search_pallas import (
    auto_pack_guards,
    pack_psi_phi_words,
    search_topk_pallas_packed,
)

T = int(os.environ.get("KB_SWEEP_T", 100))
H = W = int(os.environ.get("KB_SWEEP_HW", 4096))
K = 8
SNAPS = [float(s) for s in os.environ.get("KB_SWEEP_SNAPS", "0,0.5,0.75,1.0").split(",")]

rng = np.random.default_rng(11)
psi_c = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
phi_c = rng.integers(1, 256, (T, H, W), dtype=np.uint8)
em = jnp.asarray(np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32))
times = np.linspace(0, 12, T)

# The full 12-day physical lattice (survey_scale.py KB_SURVEY_GRID=default).
vel_full = np.linspace(92.0, 526.0, 257) / 8.0  # px/day over a 12-day span
ang_full = np.linspace(-np.pi / 15, np.pi / 15, 129)
vv, aa = np.meshgrid(vel_full, ang_full, indexing="ij")
vel, ang = vv.ravel(), aa.ravel()
C = len(vel)
vxs_f, vys_f = (np.cos(ang) * vel).astype(np.float32), (np.sin(ang) * vel).astype(np.float32)

# One stream for the whole sweep: guards are reach-derived and snapping
# moves rows <= 1 px, so every snap value lands on the same canonical
# bucket (asserted below).
dxs0, dys0 = trajectory_offsets(vxs_f, vys_f, times)
rg, cs = auto_pack_guards(np.asarray(dxs0), np.asarray(dys0))
t0 = time.time()
words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c, t_chunk=8, row_guard=rg, col_slack=cs)
words_r.block_until_ready()
print(f"stack: T={T} {H}x{W} u8, C={C}; guards=({rg},{cs}); pack {time.time()-t0:.1f}s",
      flush=True)

rows = []
for snap in SNAPS:
    if snap > 0:
        vys_s, n_classes = snap_vy_rows(vys_f, times, snap)
    else:
        vys_s = vys_f
        # Class count of the unsnapped grid, for the table.
        rr = np.floor(vys_f[:, None] * times[None, :] + 0.5).astype(np.int64)
        n_classes = len(np.unique(rr, axis=0))
    dxs, dys = (jnp.asarray(a) for a in trajectory_offsets(vxs_f, vys_s, times))
    assert auto_pack_guards(np.asarray(dxs), np.asarray(dys)) == (rg, cs)

    def run():
        lh, _ = search_topk_pallas_packed(
            words_r, dxs, dys, jnp.float32(10), jnp.float32(0), em,
            shape=(T, H, W), bits=8, pad_rows=pad_rows,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=K,
        )
        return float(np.asarray(lh[0, 0, 0]))

    t0 = time.time()
    run()
    t_first = time.time() - t0
    t0 = time.time()
    run()
    dt = time.time() - t0
    rate = H * W * C / dt
    rows.append((snap, n_classes, t_first, dt, rate))
    print(f"snap={snap:<5} classes={n_classes:<6} first={t_first:7.1f}s "
          f"steady={dt:7.1f}s rate={rate/1e9:.2f}e9 evals/s", flush=True)

print("\n| snap err (px) | vy classes | steady rate (e9 evals/s) |", flush=True)
print("|---|---|---|", flush=True)
for snap, n_classes, _, _, rate in rows:
    print(f"| {snap} | {n_classes} | {rate/1e9:.2f} |", flush=True)
