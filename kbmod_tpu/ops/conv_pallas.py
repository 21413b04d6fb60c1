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

    # Full 8-aligned copies (DMA slice heights must respect the (8,128)
    # tiling); Hp guarantees r0 + TB2p stays in bounds.
    TB2p = ((TB2 + 7) // 8) * 8
    cp_s = pltpu.make_async_copy(sci_hbm.at[pl.ds(r0, TB2p), :], sci_buf, sems.at[0])
    cp_v = pltpu.make_async_copy(var_hbm.at[pl.ds(r0, TB2p), :], var_buf, sems.at[1])
    cp_s.start()
    cp_v.start()
    cp_s.wait()
    cp_v.wait()

    # All planes and accumulators live in explicit VMEM scratch with
    # in-place updates: a pure-value formulation makes Mosaic keep the
    # whole unrolled tap chain live on the VMEM stack (observed 80MB+).
    def run(p_ref, f_ref, m_ref, pr_ref, fr_ref, mr_ref, apsi, aphi, am1, am2):
        s = sci_buf[:TB2]
        v = var_buf[:TB2]
        valid = jnp.isfinite(s) & jnp.isfinite(v) & (v > 0.0)
        p_ref[...] = jnp.zeros((TB2p, W2), jnp.float32)
        f_ref[...] = jnp.zeros((TB2p, W2), jnp.float32)
        m_ref[...] = jnp.zeros((TB2p, W2), jnp.float32)
        p_ref[:TB2] = jnp.where(valid, s / v, 0.0)
        f_ref[:TB2] = jnp.where(valid, 1.0 / v, 0.0)
        m_ref[:TB2] = jnp.where(valid, jnp.float32(1.0), jnp.float32(0.0))
        apsi[...] = jnp.zeros((TH, W2), jnp.float32)
        aphi[...] = jnp.zeros((TH, W2), jnp.float32)
        am1[...] = jnp.zeros((TH, W2), jnp.float32)
        am2[...] = jnp.zeros((TH, W2), jnp.float32)

        # Nested fori loops (not Python-unrolled): Mosaic's stack allocator
        # does not reuse slots across hundreds of unrolled tap statements.
        # Dynamic non-negative roll amounts, as in the search kernel.
        def ibody(i, _):
            # Roll the full (8-aligned) buffer: Mosaic's dynamic sublane
            # rotate rejects unaligned shapes. Stale rows >= TB2 never
            # reach [:TH] because y + i <= TB2 - 1.
            pr_ref[...] = pltpu.roll(p_ref[...], TB2p - i, 0)[:TH]
            fr_ref[...] = pltpu.roll(f_ref[...], TB2p - i, 0)[:TH]
            mr_ref[...] = pltpu.roll(m_ref[...], TB2p - i, 0)[:TH]

            def jbody(j, _):
                kij = k_ref[i * kw + j]
                k2ij = kij * kij
                ps = pltpu.roll(pr_ref[...], W2 - j, 1)
                apsi[...] = apsi[...] + kij * ps
                fs = pltpu.roll(fr_ref[...], W2 - j, 1)
                aphi[...] = aphi[...] + k2ij * fs
                ms = pltpu.roll(mr_ref[...], W2 - j, 1)
                am1[...] = am1[...] + kij * ms
                am2[...] = am2[...] + k2ij * ms
                return 0

            jax.lax.fori_loop(0, kw, jbody, 0)
            return 0

        jax.lax.fori_loop(0, kh, ibody, 0)
        # Kernel tap sums ride in the scalar-prefetch array's tail.
        ksum = k_ref[kh * kw]
        k2sum = k_ref[kh * kw + 1]

        center = pltpu.roll(m_ref[...], TB2p - kh // 2, 0)[:TH] if kh // 2 else m_ref[:TH]
        if kw // 2:
            center = pltpu.roll(center, W2 - kw // 2, 1)
        nan = jnp.float32(np.nan)
        psi_ref[0] = jnp.where(
            center > 0, apsi[...] * (ksum / jnp.maximum(am1[...], 1e-24)), nan
        )
        phi_ref[0] = jnp.where(
            center > 0, aphi[...] * (k2sum / jnp.maximum(am2[...], 1e-24)), nan
        )

    pl.run_scoped(
        run,
        p_ref=pltpu.VMEM((TB2p, W2), jnp.float32),
        f_ref=pltpu.VMEM((TB2p, W2), jnp.float32),
        m_ref=pltpu.VMEM((TB2p, W2), jnp.float32),
        pr_ref=pltpu.VMEM((TH, W2), jnp.float32),
        fr_ref=pltpu.VMEM((TH, W2), jnp.float32),
        mr_ref=pltpu.VMEM((TH, W2), jnp.float32),
        apsi=pltpu.VMEM((TH, W2), jnp.float32),
        aphi=pltpu.VMEM((TH, W2), jnp.float32),
        am1=pltpu.VMEM((TH, W2), jnp.float32),
        am2=pltpu.VMEM((TH, W2), jnp.float32),
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
        budget = 6 * 1024 * 1024
        per_row = 16 * W2 * 4
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
    k = jnp.asarray(psf, dtype=jnp.float32).reshape(kh * kw)
    taps = jnp.concatenate([k, jnp.stack([jnp.sum(k), jnp.sum(k * k)])])

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
