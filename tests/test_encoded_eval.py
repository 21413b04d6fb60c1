"""EncodedPlanes winner-evaluation and compact result assembly.

At survey scale the decoded float psi/phi planes (~9x the uint8 codes'
HBM) cannot coexist with the packed kernel stream on one chip, so the
winner re-scoring / curve gathers accept the CODE planes and decode
per-sample (ops/search.py EncodedPlanes). These tests pin that path
identical to gathering decoded planes (exactly for the validity mask;
to one float32 ulp for values — XLA may contract the decode's
multiply-add into an fma differently across fusions), and pin the
compact assembly (rows below min_lh dropped inside assembly) identical
post-filter to the dense reference layout (kernels.cu:286)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.ops import search as so
from kbmod_tpu.ops.search import EncodedPlanes
from kbmod_tpu.search import StackSearch, Trajectory


@pytest.fixture(scope="module")
def quantized_stack():
    times = create_fake_times(8, t0=57130.0, obs_per_day=4)
    ds = FakeDataSet(52, 44, times, noise_level=1.5, psf_val=0.6, use_seed=31)
    ds.insert_object(Trajectory(x=12, y=20, vx=8.0, vy=-3.0, flux=400.0))
    ds.insert_object(Trajectory(x=30, y=10, vx=4.0, vy=5.0, flux=350.0))
    return ds.stack_py


def _search(stack, num_bytes):
    s = StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times, num_bytes)
    s.set_min_obs(5)
    s.set_min_lh(8.0)
    return s


def _grid():
    vxs = np.linspace(2.0, 10.0, 5).astype(np.float32)
    vys = np.linspace(-5.0, 6.0, 5).astype(np.float32)
    vxg, vyg = np.meshgrid(vxs, vys)
    return [Trajectory(vx=vx, vy=vy) for vx, vy in zip(vxg.ravel(), vyg.ravel())]


class TestEncodedPlanesGather:
    def test_gather_parity_vs_decoded(self, quantized_stack):
        s = _search(quantized_stack, 1)
        planes, none_phi, none_valid = s._eval_planes()
        assert isinstance(planes, EncodedPlanes) and none_phi is None
        psi_d, phi_d, valid_d = s._decoded()

        rng = np.random.default_rng(5)
        n = 64
        xs = rng.integers(-4, 48, n).astype(np.int32)
        ys = rng.integers(-4, 56, n).astype(np.int32)
        vxs = rng.uniform(-8, 8, n).astype(np.float32)
        vys = rng.uniform(-8, 8, n).astype(np.float32)
        dxs, dys = so.trajectory_offsets(vxs, vys, s.zeroed_times)

        pe, fe, oke = so._gather_curves(
            planes, None, None, jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(dxs), jnp.asarray(dys),
        )
        pd, fd, okd = so._gather_curves(
            jnp.asarray(psi_d), jnp.asarray(phi_d), jnp.asarray(valid_d),
            jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(dxs), jnp.asarray(dys),
        )
        np.testing.assert_array_equal(np.asarray(oke), np.asarray(okd))
        # Values agree to 1 ulp (fma contraction differs between fusions).
        np.testing.assert_allclose(np.asarray(pe), np.asarray(pd), rtol=3e-6, atol=6e-6)
        np.testing.assert_allclose(np.asarray(fe), np.asarray(fd), rtol=3e-6, atol=6e-6)

    def test_gather_parity_uint16(self, quantized_stack):
        s = _search(quantized_stack, 2)
        planes, _, _ = s._eval_planes()
        psi_d, phi_d, valid_d = s._decoded()
        xs = np.array([5, 20, 40], np.int32)
        ys = np.array([8, 30, 2], np.int32)
        dxs, dys = so.trajectory_offsets([3.0, -2.0, 7.0], [1.0, 4.0, -3.0], s.zeroed_times)
        pe, fe, oke = so._gather_curves(
            planes, None, None, jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(dxs), jnp.asarray(dys),
        )
        pd, fd, okd = so._gather_curves(
            jnp.asarray(psi_d), jnp.asarray(phi_d), jnp.asarray(valid_d),
            jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(dxs), jnp.asarray(dys),
        )
        np.testing.assert_array_equal(np.asarray(oke), np.asarray(okd))
        # Values agree to 1 ulp (fma contraction differs between fusions).
        np.testing.assert_allclose(np.asarray(pe), np.asarray(pd), rtol=3e-6, atol=6e-6)
        np.testing.assert_allclose(np.asarray(fe), np.asarray(fd), rtol=3e-6, atol=6e-6)

    def test_evaluate_trajectories_encoded(self, quantized_stack):
        s = _search(quantized_stack, 1)
        planes, _, _ = s._eval_planes()
        psi_d, phi_d, valid_d = s._decoded()
        xs = np.array([12, 30, 45], np.int32)
        ys = np.array([20, 10, 40], np.int32)
        vxs = np.array([8.0, 4.0, -2.0], np.float32)
        vys = np.array([-3.0, 5.0, 1.0], np.float32)
        t = s.zeroed_times
        enc = so.evaluate_trajectories(planes, None, None, t, xs, ys, vxs, vys)
        dec = so.evaluate_trajectories(psi_d, phi_d, valid_d, t, xs, ys, vxs, vys)
        np.testing.assert_array_equal(enc["obs_count"], dec["obs_count"])
        for key in ("psi_sum", "phi_sum", "lh", "flux"):
            np.testing.assert_allclose(enc[key], dec[key], rtol=3e-6, atol=6e-6, err_msg=key)

    def test_curves_via_stack_search(self, quantized_stack):
        """get_all_psi_phi_curves on a quantized stack must equal the
        decoded-plane extraction (stack_search.cpp:302-318 contract)."""
        s = _search(quantized_stack, 1)
        trjs = [Trajectory(x=12, y=20, vx=8.0, vy=-3.0), Trajectory(x=5, y=5, vx=1.0, vy=1.0)]
        got = s.get_all_psi_phi_curves(trjs)
        psi_d, phi_d, valid_d = s._decoded()
        pv, fv = so.extract_psi_phi_curves(
            psi_d, phi_d, valid_d, s.zeroed_times,
            [t.x for t in trjs], [t.y for t in trjs],
            [t.vx for t in trjs], [t.vy for t in trjs],
        )
        np.testing.assert_allclose(got, np.concatenate([pv, fv], axis=1), rtol=3e-6, atol=6e-6)

    def test_decode_full_matches_decoded_psi_phi(self, quantized_stack):
        s = _search(quantized_stack, 1)
        planes, _, _ = s._eval_planes()
        psi_f, phi_f, valid_f = (np.asarray(a) for a in planes.decode_full())
        psi_d, phi_d, valid_d = (np.asarray(a) for a in s._decoded())
        np.testing.assert_array_equal(psi_f, psi_d)
        np.testing.assert_array_equal(phi_f, phi_d)
        np.testing.assert_array_equal(valid_f, valid_d)


class TestCompactAssembly:
    def _run_all(self, stack, num_bytes, monkeypatch, compact, sigmag=False):
        monkeypatch.setenv("KB_COMPACT_RESULTS", "1" if compact else "0")
        s = _search(stack, num_bytes)
        if sigmag:
            from kbmod_tpu.filters.sigma_g_filter import SigmaGClipping

            s.enable_gpu_sigmag_filter(
                np.array([0.25, 0.75]), SigmaGClipping.find_sigma_g_coeff(25, 75), 8.0
            )
        s.search_all(_grid(), True)
        return s.results.get_arrays()

    @pytest.mark.parametrize("num_bytes", [-1, 1])
    def test_search_all_compact_matches_dense(self, quantized_stack, monkeypatch, num_bytes):
        dense = self._run_all(quantized_stack, num_bytes, monkeypatch, compact=False)
        comp = self._run_all(quantized_stack, num_bytes, monkeypatch, compact=True)
        for key in dense:
            np.testing.assert_array_equal(comp[key], dense[key], err_msg=key)

    def test_search_all_compact_matches_dense_sigmag(self, quantized_stack, monkeypatch):
        dense = self._run_all(quantized_stack, 1, monkeypatch, compact=False, sigmag=True)
        comp = self._run_all(quantized_stack, 1, monkeypatch, compact=True, sigmag=True)
        for key in dense:
            np.testing.assert_array_equal(comp[key], dense[key], err_msg=key)

    def test_cpu_semantics_compact(self, quantized_stack, monkeypatch):
        """on_gpu=False (CPU reference semantics) with compaction on/off."""

        def run(compact):
            monkeypatch.setenv("KB_COMPACT_RESULTS", "1" if compact else "0")
            s = _search(quantized_stack, -1)
            s.search_all(_grid(), False)
            return s.results.get_arrays()

        dense = run(False)
        comp = run(True)
        for key in dense:
            np.testing.assert_array_equal(comp[key], dense[key], err_msg=key)

    def test_core_search_compact_vs_filtered_dense(self, quantized_stack):
        """Direct core_search contract: compact output == dense output with
        the sub-min_lh rows removed (same order)."""
        from kbmod_tpu.ops.psi_phi import generate_psi_phi_from_image_stack

        stack = quantized_stack
        psi, phi = generate_psi_phi_from_image_stack(stack)
        valid = (
            np.isfinite(np.asarray(stack.sci)) & np.isfinite(np.asarray(stack.var))
        ).astype(np.float32)
        vxs = np.linspace(2.0, 10.0, 4).astype(np.float32)
        vys = np.linspace(-5.0, 6.0, 4).astype(np.float32)
        vxg, vyg = np.meshgrid(vxs, vys)
        args = (
            np.asarray(psi), np.asarray(phi), valid,
            np.asarray(stack.zeroed_times, np.float32),
            vxg.ravel(), vyg.ravel(), 0, 44, 0, 52, 3,
        )
        dense = so.core_search(*args, min_obs=5, min_lh=8.0)
        comp = so.core_search(*args, min_obs=5, min_lh=8.0, compact_min_lh=8.0)
        keep = dense["lh"] >= 8.0
        for key in dense:
            np.testing.assert_array_equal(comp[key], dense[key][keep], err_msg=key)


class TestCheckpointCompact:
    def test_checkpoint_compact_resume(self, quantized_stack, tmp_path):
        """Compact tiles checkpoint/resume to the same (filtered) rows."""
        from kbmod_tpu.ops.psi_phi import generate_psi_phi_from_image_stack
        from kbmod_tpu.search.checkpoint import checkpointed_core_search

        stack = quantized_stack
        psi, phi = generate_psi_phi_from_image_stack(stack)
        valid = (
            np.isfinite(np.asarray(stack.sci)) & np.isfinite(np.asarray(stack.var))
        ).astype(np.float32)
        vxs = np.linspace(2.0, 10.0, 4).astype(np.float32)
        vys = np.linspace(-5.0, 6.0, 4).astype(np.float32)
        vxg, vyg = np.meshgrid(vxs, vys)
        args = (
            np.asarray(psi), np.asarray(phi), valid,
            np.asarray(stack.zeroed_times, np.float32),
            vxg.ravel(), vyg.ravel(), 0, 44, 0, 52, 3,
        )
        kw = dict(min_obs=5, min_lh=8.0, compact_min_lh=8.0)
        ck = str(tmp_path / "ck_compact")
        first = checkpointed_core_search(*args, checkpoint_dir=ck, tile_rows=16, **kw)
        again = checkpointed_core_search(*args, checkpoint_dir=ck, tile_rows=16, **kw)
        ref = so.core_search(*args, **kw)
        for key in ref:
            np.testing.assert_array_equal(first[key], ref[key], err_msg=key)
            np.testing.assert_array_equal(again[key], ref[key], err_msg=key)
