"""Design micro-bench for the exact-row grouped kernel variant.

Real default survey grids (velocity x angle) collapse to a few hundred
distinct dy row sequences, so whole groups share every per-time row
(spread = 0). That lets the kernel hoist the sublane roll — and possibly
the psi/phi/obs extraction — out of the per-candidate loop. This script
times the candidate inner-loop designs in isolation on the TPU:

  A (current): per candidate: minimal-window subroll + lane roll + 9-op
     extract/accumulate chain.
  B (shared-extract): per slot: subroll + extract pv/fv/ind once; per
     candidate: 3 lane rolls + 3 adds.
  C (shared-subroll): per slot: subroll once; per candidate: lane roll of
     the packed word + 9-op extract/accumulate.

Numbers feed the kernel-variant decision; see docs/STATUS.md.
"""
import os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = int(os.environ.get("MB_TH", 32))
W4 = int(os.environ.get("MB_W4", 512))
G = 8
T = int(os.environ.get("MB_T", 64))
NG = int(os.environ.get("MB_NG", 64))  # slots to iterate: NG groups
SL = TH + 8

def PAIR():
    return jnp.int32(0x00FF00FF)


def FIELD():
    return jnp.int32(0x00010001)


def lane_roll(x, amt):
    a = lax.rem(lax.rem(-amt, W4) + W4, W4)
    return pltpu.roll(x, a, 1)


def make_kernel(mode):
    def kernel(tbl_ref, buf_ref, out_ref, acc_psi, acc_phi, acc_obs):
        pg = pl.program_id(0)

        @pl.when(pg == 0)
        def _init():
            out_ref[...] = jnp.zeros((TH, W4), jnp.int32)

        for gi in range(G):
            acc_psi[gi] = jnp.zeros((TH, W4), jnp.int32)
            acc_phi[gi] = jnp.zeros((TH, W4), jnp.int32)
            acc_obs[gi] = jnp.zeros((TH, W4), jnp.int32)

        def tbody(t, _):
            rs = tbl_ref[pg, t]
            base = tbl_ref[pg, T + t]
            win = buf_ref[pl.ds(pl.multiple_of(base, 8), SL)]
            if mode == "A":
                for gi in range(G):
                    aln = tbl_ref[pg, 2 * T + t] + gi
                    pw = pltpu.roll(win, SL - rs, 0)[:TH]
                    wm = lane_roll(pw, aln)
                    pv = wm & PAIR()
                    fv = lax.shift_right_logical(wm, 8) & PAIR()
                    acc_psi[gi] = acc_psi[gi] + pv
                    acc_phi[gi] = acc_phi[gi] + fv
                    ind = lax.shift_right_logical(pv + PAIR(), 8) & FIELD()
                    acc_obs[gi] = acc_obs[gi] + ind
            elif mode == "B":
                pw = pltpu.roll(win, SL - rs, 0)[:TH]
                pv0 = pw & PAIR()
                fv0 = lax.shift_right_logical(pw, 8) & PAIR()
                ind0 = lax.shift_right_logical(pv0 + PAIR(), 8) & FIELD()
                for gi in range(G):
                    aln = tbl_ref[pg, 2 * T + t] + gi
                    acc_psi[gi] = acc_psi[gi] + lane_roll(pv0, aln)
                    acc_phi[gi] = acc_phi[gi] + lane_roll(fv0, aln)
                    acc_obs[gi] = acc_obs[gi] + lane_roll(ind0, aln)
            elif mode == "C":
                pw = pltpu.roll(win, SL - rs, 0)[:TH]
                for gi in range(G):
                    aln = tbl_ref[pg, 2 * T + t] + gi
                    wm = lane_roll(pw, aln)
                    pv = wm & PAIR()
                    fv = lax.shift_right_logical(wm, 8) & PAIR()
                    acc_psi[gi] = acc_psi[gi] + pv
                    acc_phi[gi] = acc_phi[gi] + fv
                    ind = lax.shift_right_logical(pv + PAIR(), 8) & FIELD()
                    acc_obs[gi] = acc_obs[gi] + ind
            return 0

        lax.fori_loop(0, T, tbody, 0)
        tot = acc_psi[0]
        for gi in range(G):
            tot = tot + acc_psi[gi] + acc_phi[gi] + acc_obs[gi]
        out_ref[...] = out_ref[...] + tot

    return kernel


def run(mode):
    tbl = jnp.asarray(np.random.default_rng(0).integers(0, 8, (NG, 3 * T), dtype=np.int32))
    buf = jnp.asarray(
        np.random.default_rng(1).integers(0, 2**31 - 1, (2 * (TH + 16), W4), dtype=np.int32)
    )
    f = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((TH, W4), jnp.int32),
        grid=(NG,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G, TH, W4), jnp.int32) for _ in range(3)],
    )
    jf = jax.jit(f)
    r = jf(tbl, buf)
    r.block_until_ready()
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        r = jf(tbl, buf)
    r.block_until_ready()
    dt = (time.time() - t0) / reps
    slots = NG * T * G
    evsteps = slots * TH * W4 * 2  # 2 pixels per word
    print(
        f"mode {mode}: {dt*1e3:.2f} ms  {evsteps/dt/1e11:.3f}e11 eval-steps/s "
        f"({dt/slots*1e9:.0f} ns/cand-slot)",
        flush=True,
    )


for m in sys.argv[1:] or ["A", "B", "C"]:
    run(m)
