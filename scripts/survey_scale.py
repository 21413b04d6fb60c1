"""BASELINE.md measurement config 5 (single-chip slice): 100 x 4k x 4k
uint8-encoded stack, chunked candidate search, full-frame starting pixels.

The multi-chip version of this config shards candidates over the ICI mesh
(kbmod_tpu.parallel); this script measures the per-chip kernel rate and
validates a 64x64 pixel window against the XLA encoded kernel.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets
from kbmod_tpu.ops.search_pallas import pack_psi_phi_words, search_topk_pallas_packed

rng = np.random.default_rng(11)
T = int(os.environ.get("KB_SURVEY_T", 100))
H = W = int(os.environ.get("KB_SURVEY_HW", 4096))
C = int(os.environ.get("KB_SURVEY_C", 1024))
K = 8
psi_c = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
phi_c = rng.integers(1, 256, (T, H, W), dtype=np.uint8)
em = jnp.asarray(np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32))
times = np.linspace(0, 12, T)
# KB_SURVEY_GRID=random (default): C random velocity/angle draws — an
# unstructured worst case. =default: a C-candidate subsample of the
# reference's default survey lattice (257 velocities x 129 angles,
# configuration.py:196-207, scaled to this cadence) — the structured
# production grid whose row classes enable the uniform grouped kernel.
grid = os.environ.get("KB_SURVEY_GRID", "random")
if grid == "default":
    vel_full = np.linspace(92.0, 526.0, 257) / 8.0  # px/day over a 12-day span
    n_ang = max(1, min(129, -(-C // 257)))  # whole angle rows keep the lattice
    ang_full = np.linspace(-np.pi / 15, np.pi / 15, 129)[:n_ang]
    vv, aa = np.meshgrid(vel_full, ang_full, indexing="ij")
    vel, ang = vv.ravel(), aa.ravel()
    C = len(vel)
else:
    vel = rng.uniform(1, 60, C).astype(np.float32)
    ang = rng.uniform(-0.4, 0.4, C).astype(np.float32)
vxs_f, vys_f = np.cos(ang) * vel, np.sin(ang) * vel
# KB_SURVEY_SNAP=<px>: row-class snapping (ops/search.snap_vy_rows) — the
# opt-in lever that collapses this long-baseline grid's ~9k row classes
# so the uniform exact-row kernel engages (docs/env_vars.md).
snap = float(os.environ.get("KB_SURVEY_SNAP", "0") or 0)
if snap > 0:
    from kbmod_tpu.ops.search import snap_vy_rows

    vys_f, n_classes = snap_vy_rows(vys_f, times, snap)
    print(f"snap {snap}px: {len(vys_f)} candidates -> {n_classes} vy classes", flush=True)
dxs, dys = (jnp.asarray(a) for a in trajectory_offsets(vxs_f, vys_f, times))
print(f"stack: T={T} {H}x{W} u8, C={C}", flush=True)
t0 = time.time()
# Canonical guards for this grid's concrete trajectory reach: the same
# bucketed sizes the production pipeline packs, so the persistent cache
# shares executables across scripts (search_pallas.auto_pack_guards).
from kbmod_tpu.ops.search_pallas import auto_pack_guards

guard_auto, slack_auto = auto_pack_guards(np.asarray(dxs), np.asarray(dys))
words_r, pad_rows = pack_psi_phi_words(
    psi_c, phi_c, t_chunk=8,
    row_guard=int(os.environ.get("KB_PACK_GUARD", guard_auto)),
    col_slack=int(os.environ.get("KB_PACK_COLSLACK", slack_auto)),
)
words_r.block_until_ready()
print("pack", time.time() - t0, flush=True)

def run_full():
    return search_topk_pallas_packed(
        words_r, dxs, dys, jnp.float32(10), jnp.float32(0), em,
        shape=(T, H, W), bits=8, pad_rows=pad_rows,
        x_min=0, x_max=W, y_min=0, y_max=H, k_results=K,
    )

t0 = time.time()
lh, idx = run_full()
_ = float(np.asarray(lh[0, 0, 0]))
print("pallas compile+first", time.time() - t0, flush=True)
t0 = time.time()
lh, idx = run_full()
_ = float(np.asarray(lh[0, 0, 0]))
dt = time.time() - t0
print("pallas run", dt, "evals/s", H * W * C / dt, flush=True)

x0, y0 = W // 2, H // 2
x1, y1 = x0 + 64, y0 + 64
# Free the word stream and full outputs before the XLA reference run —
# stream + outputs + full code stacks together exceed HBM.
win_lh = np.asarray(lh[:, y0:y1, x0:x1])
del lh, idx, words_r
t0 = time.time()
psi_j, phi_j = jnp.asarray(psi_c), jnp.asarray(phi_c)
ref_lh, _ = search_topk_shift(
    psi_j, phi_j, jnp.zeros((1, 1, 1), jnp.uint8), dxs, dys,
    jnp.float32(10), jnp.float32(0), encode_meta=em,
    x_min=x0, x_max=x1, y_min=y0, y_max=y1, k_results=K,
)
ref_lh = np.asarray(ref_lh)
print("xla window", time.time() - t0, flush=True)
np.testing.assert_allclose(win_lh, ref_lh, rtol=1e-5, atol=1e-5)
print("WINDOW EXACT", flush=True)
