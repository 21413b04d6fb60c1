"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
search must produce exactly the single-device kernel's results."""

import numpy as np
import jax
import pytest

from kbmod_tpu.ops.psi_phi import PsiPhiArray, fill_psi_phi_array
from kbmod_tpu.ops.search import search_topk_shift, trajectory_offsets, core_search
from kbmod_tpu.parallel import build_mesh, sharded_search_topk, sharded_core_search, sharded_psi_phi_build


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(77)
    T, H, W = 5, 24, 20
    times = np.arange(T) * 0.4
    psi = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
    phi = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
    for t in range(T):
        bad = rng.uniform(size=(H, W)) < 0.05
        psi[t][bad] = np.nan
        phi[t][bad] = np.nan
    arr = PsiPhiArray()
    fill_psi_phi_array(arr, -1, psi, phi, times)
    psi_z, phi_z, valid = arr.decoded_psi_phi()
    vxs = np.array([0.0, 1.5, -2.0, 3.3, 0.7, 2.2, -1.1], dtype=np.float32)
    vys = np.array([0.0, -1.0, 2.5, 0.4, -3.1, 1.8, 0.9], dtype=np.float32)
    return psi_z, phi_z, valid, times, vxs, vys, (T, H, W)


def _expected(data, k):
    psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
    dxs, dys = trajectory_offsets(vxs, vys, times)
    import jax.numpy as jnp

    top_lh, top_idx = search_topk_shift(
        jnp.asarray(psi_z), jnp.asarray(phi_z), jnp.asarray(valid),
        jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
        x_min=0, x_max=W, y_min=0, y_max=H, k_results=k,
    )
    return np.asarray(top_lh), np.asarray(top_idx)


class TestShardedSearch:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    @pytest.mark.parametrize("shard_mode", ["candidates", "pixels", "time"])
    def test_matches_single_device(self, data, shard_mode):
        psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
        k = 3
        exp_lh, exp_idx = _expected(data, k)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        mesh = build_mesh(8)
        got_lh, got_idx = sharded_search_topk(
            psi_z, phi_z, valid, dxs, dys, mesh,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=k,
            shard_mode=shard_mode,
        )
        np.testing.assert_allclose(got_lh, exp_lh, rtol=1e-5, atol=1e-5)
        # Indices must agree wherever likelihoods are distinct.
        distinct = np.abs(np.sort(exp_lh, axis=0)[1:] - np.sort(exp_lh, axis=0)[:-1]).min() > 1e-6
        if distinct:
            np.testing.assert_array_equal(got_idx, exp_idx)

    def test_time_shard_encoded_codes(self, data):
        """Time sharding on uint8 code planes: the affine decode commutes
        with the cross-shard psum, so the result matches an encoded
        single-device search."""
        psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, 1, [np.asarray(p) for p in psi_z],
                           [np.asarray(p) for p in phi_z], times)
        m = arr.meta
        em = np.array([m.psi_min_val, m.psi_scale, m.phi_min_val, m.phi_scale], np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        import jax.numpy as jnp

        exp_lh, exp_idx = search_topk_shift(
            jnp.asarray(arr.psi), jnp.asarray(arr.phi), jnp.zeros((1, 1, 1), jnp.uint8),
            jnp.asarray(dxs), jnp.asarray(dys), jnp.float32(0), jnp.float32(0),
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
            encode_meta=jnp.asarray(em),
        )
        mesh = build_mesh(8)
        got_lh, got_idx = sharded_search_topk(
            None, None, None, dxs, dys, mesh,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=3,
            shard_mode="time",
            psi_codes=arr.psi, phi_codes=arr.phi, encode_meta=em,
        )
        np.testing.assert_allclose(got_lh, np.asarray(exp_lh), rtol=1e-5, atol=1e-5)

    def test_time_shard_rejects_pallas(self, data):
        psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
        dxs, dys = trajectory_offsets(vxs, vys, times)
        with pytest.raises(ValueError, match="time"):
            sharded_search_topk(
                psi_z, phi_z, valid, dxs, dys, build_mesh(8),
                x_min=0, x_max=W, y_min=0, y_max=H, k_results=2,
                shard_mode="time", kernel="pallas",
            )

    def test_sharded_core_search_matches(self, data):
        psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
        mesh = build_mesh(8)
        got = sharded_core_search(
            psi_z, phi_z, valid, times, vxs, vys, mesh,
            x_min=0, x_max=W, y_min=0, y_max=H, results_per_pixel=2,
        )
        exp = core_search(psi_z, phi_z, valid, times, vxs, vys, 0, W, 0, H, 2)
        np.testing.assert_allclose(got["lh"], exp["lh"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got["obs_count"], exp["obs_count"])

    def test_sharded_psi_phi_build(self):
        rng = np.random.default_rng(5)
        T, H, W = 6, 16, 16
        sci = rng.normal(0, 1, (T, H, W)).astype(np.float32)
        var = np.full((T, H, W), 4.0, dtype=np.float32)
        sci[0, 3, 3] = np.nan
        from kbmod_tpu.core.psf import PSF
        from kbmod_tpu.ops.psi_phi import _psi_phi_from_sci_var
        import jax.numpy as jnp

        psf = PSF.make_gaussian_kernel(0.5)
        mesh = build_mesh(8)
        psi, phi, valid = sharded_psi_phi_build(sci, var, psf, mesh)
        psi_ref, phi_ref = _psi_phi_from_sci_var(jnp.asarray(sci), jnp.asarray(var), jnp.asarray(psf))
        ok = np.isfinite(np.asarray(psi_ref))
        np.testing.assert_allclose(np.asarray(psi)[ok], np.asarray(psi_ref)[ok], rtol=1e-5, atol=1e-6)
        assert np.asarray(valid)[0, 3, 3] == 0


class TestDistributedHelpers:
    def test_assign_patches_round_robin(self):
        from kbmod_tpu.parallel import assign_patches_to_hosts

        a0 = assign_patches_to_hosts(10, num_hosts=3, host_id=0)
        a1 = assign_patches_to_hosts(10, num_hosts=3, host_id=1)
        a2 = assign_patches_to_hosts(10, num_hosts=3, host_id=2)
        assert a0 == [0, 3, 6, 9]
        assert a1 == [1, 4, 7]
        assert a2 == [2, 5, 8]
        assert sorted(a0 + a1 + a2) == list(range(10))
        import pytest as _pytest

        with _pytest.raises(ValueError):
            assign_patches_to_hosts(4, num_hosts=2, host_id=5)

    def test_single_process_defaults(self):
        from kbmod_tpu.parallel import assign_patches_to_hosts, is_distributed

        assert not is_distributed()
        assert assign_patches_to_hosts(3) == [0, 1, 2]


class TestShardedPallas:
    def test_candidates_pallas_matches(self, data):
        psi, phi, valid, times, vxs, vys, (T, H, W) = data
        dxs, dys = trajectory_offsets(vxs, vys, times)
        meta = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        mesh = build_mesh()
        ref_lh, _ = sharded_search_topk(
            psi, phi, valid, dxs, dys, mesh, shard_mode="candidates", **meta
        )
        pal_lh, _ = sharded_search_topk(
            psi, phi, valid, dxs, dys, mesh, shard_mode="candidates", kernel="pallas", **meta
        )
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)

    def test_candidates_pallas_encoded(self):
        from kbmod_tpu.ops.psi_phi import PsiPhiArray, fill_psi_phi_array
        from kbmod_tpu.ops.search import trajectory_offsets

        rng = np.random.default_rng(17)
        T, H, W = 4, 24, 32
        times = np.arange(T) * 0.4
        psi_l = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
        phi_l = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, 1, psi_l, phi_l, times)
        m = arr.meta
        em = np.array([m.psi_min_val, m.psi_scale, m.phi_min_val, m.phi_scale], np.float32)
        psi_z, phi_z, valid = arr.decoded_psi_phi()
        vxs = rng.uniform(-3, 3, 5).astype(np.float32)
        vys = rng.uniform(-3, 3, 5).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        meta = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        mesh = build_mesh()
        ref_lh, _ = sharded_search_topk(psi_z, phi_z, valid, dxs, dys, mesh, **meta)
        # uint8 codes must route through the grouped guard-padded branch
        # (one replicated pre-packed stream + host-planned shard groups).
        import kbmod_tpu.parallel.sharded as sh_mod

        taken = {"n": 0}
        orig = sh_mod._sharded_paired_grouped

        def spy(*a, **k):
            out = orig(*a, **k)
            taken["n"] += out is not None
            return out

        sh_mod._sharded_paired_grouped = spy
        try:
            pal_lh, _ = sharded_search_topk(
                psi_z, phi_z, valid, dxs, dys, mesh, kernel="pallas",
                psi_codes=arr.psi, phi_codes=arr.phi, encode_meta=em, **meta
            )
        finally:
            sh_mod._sharded_paired_grouped = orig
        assert taken["n"] == 1
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)
        # The generic per-shard kernel (KB_GROUPED=0) must agree too.
        import os

        os.environ["KB_GROUPED"] = "0"
        try:
            gen_lh, _ = sharded_search_topk(
                psi_z, phi_z, valid, dxs, dys, mesh, kernel="pallas",
                psi_codes=arr.psi, phi_codes=arr.phi, encode_meta=em, **meta
            )
        finally:
            os.environ.pop("KB_GROUPED", None)
        np.testing.assert_allclose(gen_lh, ref_lh, rtol=1e-5, atol=1e-5)

    def test_candidates_uniform_plan(self, monkeypatch):
        """A vy-major lattice grid (each shard's contiguous slice shares a
        row class) must engage the uniform (exact-row) kernel in the
        sharded candidates mode and produce results identical to the
        spread-plan path (KB_GROUPED_UNIFORM=0)."""
        import kbmod_tpu.parallel.sharded as sh_mod
        from kbmod_tpu.ops.psi_phi import PsiPhiArray, fill_psi_phi_array
        from kbmod_tpu.ops.search import trajectory_offsets

        rng = np.random.default_rng(23)
        T, H, W = 4, 24, 32
        times = np.arange(T) * 0.4
        psi_l = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
        phi_l = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, 1, psi_l, phi_l, times)
        m = arr.meta
        em = np.array([m.psi_min_val, m.psi_scale, m.phi_min_val, m.phi_scale], np.float32)
        psi_z, phi_z, valid = arr.decoded_psi_phi()
        # 8 row classes x 16 column velocities, vy-major: shard s gets
        # exactly the class vy = s - 4.
        vy_vals = np.arange(-4.0, 4.0)
        vx_vals = np.linspace(-3.0, 3.0, 16)
        vv, xx = np.meshgrid(vy_vals, vx_vals, indexing="ij")
        vys, vxs = vv.ravel().astype(np.float32), xx.ravel().astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        meta = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        mesh = build_mesh()

        seen = []
        orig = sh_mod._build_shard_tables

        def spy(*a, **k):
            seen.append(bool(k.get("uniform", False)))
            return orig(*a, **k)

        monkeypatch.setattr(sh_mod, "_build_shard_tables", spy)
        uni_lh, uni_idx = sharded_search_topk(
            psi_z, phi_z, valid, dxs, dys, mesh, kernel="pallas",
            psi_codes=arr.psi, phi_codes=arr.phi, encode_meta=em, **meta
        )
        assert True in seen, "uniform plan did not engage on a lattice grid"

        monkeypatch.setenv("KB_GROUPED_UNIFORM", "0")
        ref_lh, ref_idx = sharded_search_topk(
            psi_z, phi_z, valid, dxs, dys, mesh, kernel="pallas",
            psi_codes=arr.psi, phi_codes=arr.phi, encode_meta=em, **meta
        )
        np.testing.assert_array_equal(np.asarray(uni_lh), np.asarray(ref_lh))
        np.testing.assert_array_equal(np.asarray(uni_idx), np.asarray(ref_idx))


class TestShardedPixelsPallas:
    @pytest.mark.parametrize("kernel", ["pallas"])
    def test_pixels_pallas_matches(self, data, kernel):
        psi, phi, valid, times, vxs, vys, (T, H, W) = data
        dxs, dys = trajectory_offsets(vxs, vys, times)
        meta = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        exp_lh, _ = _expected(data, 3)
        mesh = build_mesh(8)
        pal_lh, _ = sharded_search_topk(
            psi, phi, valid, dxs, dys, mesh, shard_mode="pixels", kernel=kernel, **meta
        )
        np.testing.assert_allclose(pal_lh, exp_lh, rtol=1e-5, atol=1e-5)

    def test_pixels_pallas_encoded(self):
        from kbmod_tpu.ops.psi_phi import PsiPhiArray, fill_psi_phi_array

        rng = np.random.default_rng(23)
        T, H, W = 4, 40, 32
        times = np.arange(T) * 0.4
        psi_l = [rng.normal(0, 1, (H, W)).astype(np.float32) for _ in range(T)]
        phi_l = [rng.uniform(0.5, 2.0, (H, W)).astype(np.float32) for _ in range(T)]
        arr = PsiPhiArray()
        fill_psi_phi_array(arr, 1, psi_l, phi_l, times)
        m = arr.meta
        em = np.array([m.psi_min_val, m.psi_scale, m.phi_min_val, m.phi_scale], np.float32)
        psi_z, phi_z, valid = arr.decoded_psi_phi()
        vxs = rng.uniform(-3, 3, 5).astype(np.float32)
        vys = rng.uniform(-3, 3, 5).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, times)
        meta = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=3)
        mesh = build_mesh(8)
        ref_lh, _ = sharded_search_topk(psi_z, phi_z, valid, dxs, dys, mesh, **meta)
        pal_lh, _ = sharded_search_topk(
            psi_z, phi_z, valid, dxs, dys, mesh, shard_mode="pixels", kernel="pallas",
            psi_codes=arr.psi, phi_codes=arr.phi, encode_meta=em, **meta
        )
        np.testing.assert_allclose(pal_lh, ref_lh, rtol=1e-5, atol=1e-5)


class TestShardedSigmaG:
    @pytest.mark.parametrize("shard_mode", ["candidates", "pixels"])
    def test_sharded_sigmag_matches_single_device(self, data, shard_mode):
        from kbmod_tpu.filters.sigma_g_filter import SigmaGClipping

        psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
        coeff = SigmaGClipping.find_sigma_g_coeff(25, 75)
        kwargs = dict(
            min_obs=3, min_lh=0.2, do_sigmag=True,
            sgl_L=0.25, sgl_H=0.75, sigmag_coeff=coeff,
        )
        exp = core_search(
            psi_z, phi_z, valid, times, vxs, vys, 0, W, 0, H, 2, **kwargs
        )
        mesh = build_mesh(8)
        got = sharded_core_search(
            psi_z, phi_z, valid, times, vxs, vys, mesh,
            x_min=0, x_max=W, y_min=0, y_max=H, results_per_pixel=2,
            shard_mode=shard_mode, **kwargs,
        )
        np.testing.assert_allclose(got["lh"], exp["lh"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got["obs_count"], exp["obs_count"])
        np.testing.assert_allclose(got["flux"], exp["flux"], rtol=1e-5, atol=1e-5)

    def test_sharded_sigmag_exact_matches_single_device(self, data, monkeypatch):
        # KB_SIGMAG_MODE=exact: the reference-exact clipped-gating kernel,
        # sharded over candidates — per-candidate gating is independent of
        # the shard split, so the merged top-K equals single-device.
        from kbmod_tpu.filters.sigma_g_filter import SigmaGClipping

        monkeypatch.setenv("KB_SIGMAG_MODE", "exact")
        psi_z, phi_z, valid, times, vxs, vys, (T, H, W) = data
        coeff = SigmaGClipping.find_sigma_g_coeff(25, 75)
        kwargs = dict(
            min_obs=3, min_lh=0.2, do_sigmag=True,
            sgl_L=0.25, sgl_H=0.75, sigmag_coeff=coeff,
        )
        exp = core_search(
            psi_z, phi_z, valid, times, vxs, vys, 0, W, 0, H, 2, **kwargs
        )
        mesh = build_mesh(8)
        got = sharded_core_search(
            psi_z, phi_z, valid, times, vxs, vys, mesh,
            x_min=0, x_max=W, y_min=0, y_max=H, results_per_pixel=2,
            **kwargs,
        )
        np.testing.assert_allclose(got["lh"], exp["lh"], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(got["obs_count"], exp["obs_count"])
        np.testing.assert_allclose(got["flux"], exp["flux"], rtol=1e-5, atol=1e-5)
        # The small row_tile path (several tiles) must agree too.
        from kbmod_tpu.parallel import sharded_sigmag_exact_topk
        from kbmod_tpu.ops.search import search_topk_sigmag_exact, trajectory_offsets

        dxs, dys = trajectory_offsets(vxs, vys, times)
        ref_lh, ref_idx = search_topk_sigmag_exact(
            psi_z, phi_z, valid, dxs, dys, 3, 0.2, coeff,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=2,
            sgl_L=0.25, sgl_H=0.75, row_tile=8,
        )
        got_lh, got_idx = sharded_sigmag_exact_topk(
            psi_z, phi_z, valid, dxs, dys, mesh,
            x_min=0, x_max=W, y_min=0, y_max=H, k_results=2,
            min_obs=3, min_lh=0.2, sigmag_coeff=coeff,
            sgl_L=0.25, sgl_H=0.75, row_tile=8,
        )
        np.testing.assert_allclose(got_lh, ref_lh, rtol=1e-5, atol=1e-5)
