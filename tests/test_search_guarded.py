"""Guard-padded packed streams and the mask-free paired kernels.

The packer can insert zero guard rows between time planes and zero column
slack past each row; when a search's trajectory reach fits inside them
(checked by _bounds_free on the concrete offsets), the paired kernels drop
their bounds masks entirely — out-of-bounds reads land on zeros, and zero
code pairs self-exclude from the sums and the obs indicator, so results
stay bit-identical (kernels.cu:184 gating semantics).

Also pins the lane-roll normalization (_lane_roll_left): Mosaic's dynamic
lane rotate silently mis-rotates NEGATIVE amounts when the lane count is
not a power of two — guarded streams (and any non-power-of-two-width
image) hit exactly that case, so these tests use a non-pow2 width.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kbmod_tpu.ops.search import trajectory_offsets
from kbmod_tpu.ops.search_pallas import (
    PackGeom,
    _bounds_free,
    _search_topk_pallas_packed_jit,
    pack_psi_phi_words,
    search_topk_paired_grouped,
    search_topk_pallas_packed,
)

EM = np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32)


def _data(rng, T, H, W, C, vmax=6.0):
    psi_c = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
    phi_c = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
    vxs = rng.uniform(-vmax, vmax, C).astype(np.float32)
    vys = rng.uniform(-vmax, vmax, C).astype(np.float32)
    dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.5)
    return psi_c, phi_c, dxs, dys


class TestGuardedStreams:
    def test_pack_geom_fields(self):
        rng = np.random.default_rng(1)
        psi_c, phi_c, _, _ = _data(rng, 4, 40, 52, 3)
        _, geom = pack_psi_phi_words(psi_c, phi_c, row_guard=64, col_slack=128)
        assert isinstance(geom, PackGeom)
        assert geom.row_guard == 64 and geom.col_slack == 128
        # Legacy int pad_rows still accepted by the search entry.
        _, geom0 = pack_psi_phi_words(psi_c, phi_c, row_guard=0, col_slack=0)
        assert geom0.row_guard == 0 and geom0.col_slack == 0

    @pytest.mark.parametrize("grouped", [True, False])
    def test_guarded_matches_legacy_nonpow2_width(self, grouped, monkeypatch):
        # W=72 -> image words 36, guarded W4 non-power-of-two multiples of
        # 128: exercises the negative-amount lane-roll normalization.
        monkeypatch.setenv("KB_GROUPED", "1" if grouped else "0")
        rng = np.random.default_rng(2)
        T, H, W, C = 6, 48, 72, 31
        psi_c, phi_c, dxs, dys = _data(rng, T, H, W, C)
        w0, g0 = pack_psi_phi_words(psi_c, phi_c, row_guard=0, col_slack=0)
        w1, g1 = pack_psi_phi_words(psi_c, phi_c, row_guard=64, col_slack=128)
        kw = dict(shape=(T, H, W), x_min=0, x_max=W, y_min=0, y_max=H,
                  k_results=4, interpret=True)
        ref = _search_topk_pallas_packed_jit(
            w0, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(2), jnp.float32(0), jnp.asarray(EM),
            bits=8, pad_rows=g0, **kw,
        )
        out = search_topk_pallas_packed(
            w1, dxs, dys, jnp.float32(2), jnp.float32(0), jnp.asarray(EM),
            bits=8, pad_rows=g1, **kw,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))

    def test_unmasked_variant_selected_and_exact(self):
        # Guards comfortably cover the reach: the grouped path must take
        # bounds_masks=False and still match the legacy masked kernel.
        rng = np.random.default_rng(3)
        T, H, W, C = 6, 48, 72, 23
        psi_c, phi_c, dxs, dys = _data(rng, T, H, W, C, vmax=3.0)
        w1, g1 = pack_psi_phi_words(psi_c, phi_c, row_guard=128, col_slack=128)
        assert _bounds_free(
            dxs, dys, W=W, H=H, W4=w1.shape[1], SW4=(W + 1) // 2,
            SH_pad=48, geom=g1, row_slack=16,
        )
        w0, g0 = pack_psi_phi_words(psi_c, phi_c, row_guard=0, col_slack=0)
        kw = dict(shape=(T, H, W), x_min=0, x_max=W, y_min=0, y_max=H,
                  k_results=3, interpret=True)
        ref = _search_topk_pallas_packed_jit(
            w0, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(1), jnp.float32(0), jnp.asarray(EM),
            bits=8, pad_rows=g0, **kw,
        )
        grp = search_topk_paired_grouped(
            w1, dxs, dys, jnp.float32(1), jnp.float32(0), jnp.asarray(EM),
            pad_rows=g1, **kw,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(grp[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(grp[1]))

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_per_class_guarded_matches_guardless(self, dtype, monkeypatch):
        # The per-class (single-stream) kernel: uint16 codes, or uint8
        # with the paired kernel disabled (stands in for T > 257).
        if dtype == np.uint8:
            monkeypatch.setenv("KB_PAIRED_KERNEL", "0")
        rng = np.random.default_rng(21)
        T, H, W, C = 5, 40, 72, 23
        psi_c = rng.integers(0, 256, (T, H, W)).astype(dtype)
        phi_c = rng.integers(0, 256, (T, H, W)).astype(dtype)
        bits = 8 * psi_c.dtype.itemsize
        vxs = rng.uniform(-4, 4, C).astype(np.float32)
        vys = rng.uniform(-4, 4, C).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(T) * 0.5)
        w0, g0 = pack_psi_phi_words(psi_c, phi_c, row_guard=0, col_slack=0)
        w1, g1 = pack_psi_phi_words(psi_c, phi_c, row_guard=64, col_slack=128)
        assert g1.row_guard == 64 and g1.col_slack == 128
        kw = dict(shape=(T, H, W), bits=bits, interpret=True,
                  x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        em = jnp.asarray(EM)
        ref = search_topk_pallas_packed(
            w0, dxs, dys, jnp.float32(1), jnp.float32(0), em, pad_rows=g0, **kw
        )
        out = search_topk_pallas_packed(
            w1, dxs, dys, jnp.float32(1), jnp.float32(0), em, pad_rows=g1, **kw
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))
        # Forced mask-free variant on the guarded stream must also agree
        # (the dispatcher picks it when the reach fits — pin it explicitly).
        um = _search_topk_pallas_packed_jit(
            w1, jnp.asarray(dxs), jnp.asarray(dys),
            jnp.float32(1), jnp.float32(0), em, pad_rows=g1,
            bounds_masks=False, **kw,
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(um[0]))

    def test_bounds_free_rejects_stream1_boundary_word(self):
        # Stream 1 (the one-column-shifted copy) holds real data through
        # word index img_w4 for even W, so a left wrap reaching exactly
        # -(W4 - img_w4) words would read it: the wrap budget must be one
        # word tighter than stream 0's zero region.
        W, H = 64, 48
        img_w4 = 32
        W4 = 256  # col_slack=128 geometry
        ox = np.array([[-449]])  # odd: parity-1 stream, dw = -224
        oy = np.array([[0]])
        geom = PackGeom(352, 512, 128)
        assert not _bounds_free(
            ox, oy, W=W, H=H, W4=W4, SW4=img_w4, SH_pad=48, geom=geom,
            row_slack=8,
        )
        # One word less reach is acceptable.
        assert _bounds_free(
            np.array([[-447]]), oy, W=W, H=H, W4=W4, SW4=img_w4, SH_pad=48,
            geom=geom, row_slack=8,
        )
        # End-to-end: the dispatcher must stay masked for such offsets and
        # still match the guardless reference exactly.
        rng = np.random.default_rng(31)
        T, C = 4, 9
        psi_c, phi_c, _, _ = _data(rng, T, H, W, C)
        dxs = np.full((C, T), 0, np.int32)
        dxs[0] = [-1, -150, -300, -449]
        dys = rng.integers(-3, 4, (C, T)).astype(np.int32)
        w0, g0 = pack_psi_phi_words(psi_c, phi_c, row_guard=0, col_slack=0)
        w1, g1 = pack_psi_phi_words(psi_c, phi_c, row_guard=512, col_slack=128)
        kw = dict(shape=(T, H, W), bits=8, interpret=True,
                  x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        em = jnp.asarray(EM)
        ref = search_topk_pallas_packed(
            w0, dxs, dys, jnp.float32(1), jnp.float32(0), em, pad_rows=g0, **kw
        )
        out = search_topk_pallas_packed(
            w1, dxs, dys, jnp.float32(1), jnp.float32(0), em, pad_rows=g1, **kw
        )
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(out[1]))

    def test_bounds_free_rejects_insufficient_guards(self):
        rng = np.random.default_rng(4)
        T, H, W, C = 6, 48, 72, 23
        _, _, dxs, dys = _data(rng, T, H, W, C, vmax=40.0)
        geom = PackGeom(352, 8, 128)
        assert not _bounds_free(
            dxs, dys, W=W, H=H, W4=256, SW4=(W + 1) // 2,
            SH_pad=48, geom=geom, row_slack=16,
        )
        # col_slack of zero always rejects (wrap lanes would read image).
        assert not _bounds_free(
            np.zeros_like(dxs), np.zeros_like(dys), W=W, H=H, W4=(W + 1) // 2,
            SW4=(W + 1) // 2, SH_pad=48, geom=PackGeom(352, 512, 0), row_slack=16,
        )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
