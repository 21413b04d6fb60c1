"""Row-tile (TH) sweep for the grouped survey kernel at BASELINE config 5
scale (100 x 4k x 4k u8). The auto-picked TH at 4k width is 16 (VMEM
budget); this measures whether larger tiles — enabled by shrinking the
per-buffer footprint — would amortize the per-slot window overheads.

Usage: python scripts/grouped_th_sweep.py [TH ...]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from kbmod_tpu.ops.search import trajectory_offsets
from kbmod_tpu.ops.search_pallas import (
    pack_psi_phi_words,
    search_topk_paired_grouped,
)

rng = np.random.default_rng(11)
T = int(os.environ.get("KB_SURVEY_T", 100))
H = W = int(os.environ.get("KB_SURVEY_HW", 4096))
C = int(os.environ.get("KB_SURVEY_C", 1024))
K = 8
psi_c = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
phi_c = rng.integers(1, 256, (T, H, W), dtype=np.uint8)
em = jnp.asarray(np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32))
times = np.linspace(0, 12, T)
vel = rng.uniform(1, 60, C).astype(np.float32)
ang = rng.uniform(-0.4, 0.4, C).astype(np.float32)
dxs, dys = trajectory_offsets(np.cos(ang) * vel, np.sin(ang) * vel, times)
print(f"stack: T={T} {H}x{W} u8, C={C}", flush=True)
t0 = time.time()
words_r, pad_rows = pack_psi_phi_words(
    psi_c, phi_c, t_chunk=8, row_guard=384, col_slack=384,
)
words_r.block_until_ready()
print("pack", time.time() - t0, flush=True)

# Args: TH or TH:DD tokens (TH "a" = auto).
tokens = sys.argv[1:] or ["16:2", "16:4"]
for tok in tokens:
    th_s, _, dd_s = tok.partition(":")
    th = None if th_s in ("a", "auto") else int(th_s)
    if dd_s:
        os.environ["KB_GROUPED_DD"] = dd_s
    tag = f"TH={th} DD={os.environ.get('KB_GROUPED_DD', '2')}"
    try:
        def run():
            return search_topk_paired_grouped(
                words_r, dxs, dys, jnp.float32(10), jnp.float32(0), em,
                shape=(T, H, W), pad_rows=pad_rows,
                x_min=0, x_max=W, y_min=0, y_max=H, k_results=K,
                row_tile=th,
            )

        t0 = time.time()
        lh, idx = run()
        v = float(np.asarray(lh[0, 0, 0]))
        print(f"{tag}: compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        lh, idx = run()
        v = float(np.asarray(lh[0, 0, 0]))
        dt = time.time() - t0
        print(f"{tag}: run {dt:.3f}s  {H * W * C / dt:.3e} evals/s", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
