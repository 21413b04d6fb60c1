"""Fused Pallas psi/phi build: masked PSF convolution on row tiles.

The psi/phi generation (psi = conv(sci/var, PSF), phi = conv(1/var, PSF^2),
each renormalized by the unmasked kernel fraction; reference
image_utils_cpp.cpp:126-177 / psf.py:130-199) is four single-channel
convolutions. XLA's TPU conv path is pathological for single-channel
kernels (no MXU contraction dim), and tap-unrolled XLA forms either blow
HLO temp memory (unrolled) or stream the stack from HBM once per tap
(fori). This kernel reads each (sci, var) row tile once into VMEM, derives
the psi/phi/mask planes in-register, and accumulates all four tap-sums
in one pass — input-bound instead of 81x-input-bound.

Grid: (T, row_tiles); inputs are zero/NaN-padded to (T, Hp, W2) host-side
so every tile DMA is 8-row aligned and the kernel needs no bounds logic
(NaN padding reads as masked, reproducing SAME zero-pad conv semantics
because the fraction renormalization sees the same zero mask).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _psi_phi_kernel(
    k_ref,  # (kh*kw,) f32 scalar-prefetch: PSF taps
    sci_hbm,  # (T*Hp, W2) f32 rows
    var_hbm,
    psi_ref,  # out block (1, TH, W2)
    phi_ref,
    sci_buf,  # scratch (TB2p, W2) f32
    var_buf,
    sems,
    *,
    kh,
    kw,
    TH,
    TB2,
    W2,
    Hp,
):
    t = pl.program_id(0)
    ty = pl.program_id(1)
    r0 = t * Hp + ty * TH  # 8-aligned: TH % 8 == 0 and Hp % 8 == 0

    cp_s = pltpu.make_async_copy(sci_hbm.at[pl.ds(r0, TB2), :], sci_buf.at[: TB2], sems.at[0])
    cp_v = pltpu.make_async_copy(var_hbm.at[pl.ds(r0, TB2), :], var_buf.at[: TB2], sems.at[1])
    cp_s.start()
    cp_v.start()
    cp_s.wait()
    cp_v.wait()

    s = sci_buf[:TB2]
    v = var_buf[:TB2]
    valid = jnp.isfinite(s) & jnp.isfinite(v) & (v > 0.0)
    p = jnp.where(valid, s / v, 0.0)
    f = jnp.where(valid, 1.0 / v, 0.0)
    m = jnp.where(valid, jnp.float32(1.0), jnp.float32(0.0))

    acc_psi = jnp.zeros((TH, W2), jnp.float32)
    acc_phi = jnp.zeros((TH, W2), jnp.float32)
    acc_m1 = jnp.zeros((TH, W2), jnp.float32)
    acc_m2 = jnp.zeros((TH, W2), jnp.float32)
    ksum = jnp.float32(0.0)
    k2sum = jnp.float32(0.0)

    for i in range(kh):
        pr = pltpu.roll(p, TB2 - i, 0)[:TH] if i else p[:TH]
        fr = pltpu.roll(f, TB2 - i, 0)[:TH] if i else f[:TH]
        mr = pltpu.roll(m, TB2 - i, 0)[:TH] if i else m[:TH]
        for j in range(kw):
            kij = k_ref[i * kw + j]
            k2ij = kij * kij
            ksum = ksum + kij
            k2sum = k2sum + k2ij
            ps = pltpu.roll(pr, W2 - j, 1) if j else pr
            fs = pltpu.roll(fr, W2 - j, 1) if j else fr
            ms = pltpu.roll(mr, W2 - j, 1) if j else mr
            acc_psi = acc_psi + kij * ps
            acc_phi = acc_phi + k2ij * fs
            acc_m1 = acc_m1 + kij * ms
            acc_m2 = acc_m2 + k2ij * ms

    center = m
    if kh // 2:
        center = pltpu.roll(center, TB2 - kh // 2, 0)
    center = center[:TH]
    if kw // 2:
        center = pltpu.roll(center, W2 - kw // 2, 1)
    nan = jnp.float32(np.nan)
    psi_ref[0] = jnp.where(
        center > 0, acc_psi * (ksum / jnp.maximum(acc_m1, 1e-24)), nan
    )
    phi_ref[0] = jnp.where(
        center > 0, acc_phi * (k2sum / jnp.maximum(acc_m2, 1e-24)), nan
    )


@functools.partial(jax.jit, static_argnames=("row_tile", "interpret"))
def psi_phi_conv_pallas(sci, var, psf, row_tile=None, interpret=False):
    """Fused psi/phi build: returns (psi, phi) as (T, H, W) float32 with NaN
    at masked pixels — same outputs as generate_psi_phi via
    convolve_masked_batch."""
    T, H, W = sci.shape
    kh, kw = psf.shape
    ph, pw = kh // 2, kw // 2
    W2 = _round_up(W + kw - 1, 128)

    if row_tile is None:
        # VMEM: 2 input tiles + 3 derived planes + 4 accumulators + 2 output
        # blocks (possibly double-buffered), all (~TH, W2) f32.
        budget = 8 * 1024 * 1024
        per_row = 13 * W2 * 4
        row_tile = max(8, min(_round_up(H, 8), (budget // per_row) // 8 * 8, 256))
    TH = int(row_tile)
    n_ty = pl.cdiv(H, TH)
    TB2 = TH + kh - 1
    Hp = _round_up(n_ty * TH + kh - 1, 8)

    def pad(a):
        return jnp.pad(
            a.astype(jnp.float32),
            ((0, 0), (ph, Hp - H - ph), (pw, W2 - W - pw)),
            constant_values=np.nan,
        ).reshape(T * Hp, W2)

    sci_r = pad(sci)
    var_r = pad(var)
    taps = jnp.asarray(psf, dtype=jnp.float32).reshape(kh * kw)

    kernel = functools.partial(
        _psi_phi_kernel, kh=kh, kw=kw, TH=TH, TB2=TB2, W2=W2, Hp=Hp,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, n_ty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec((1, TH, W2), lambda t, ty, *prefetch: (t, ty, 0)),
            pl.BlockSpec((1, TH, W2), lambda t, ty, *prefetch: (t, ty, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((_round_up(TB2, 8), W2), jnp.float32),
            pltpu.VMEM((_round_up(TB2, 8), W2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    cost = pl.CostEstimate(
        flops=8 * kh * kw * T * H * W,
        bytes_accessed=T * Hp * W2 * 16,
        transcendentals=T * H * W,
    )
    psi, phi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, n_ty * TH, W2), jnp.float32),
            jax.ShapeDtypeStruct((T, n_ty * TH, W2), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(taps, sci_r, var_r)
    # Output tile column x already aligns with original column x (the left
    # pad is consumed by the tap offsets).
    return psi[:, :H, :W], phi[:, :H, :W]
