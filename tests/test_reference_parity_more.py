"""Extended direct parity against the reference's pure-Python modules.

Loads reference source files standalone (/root/reference, read-only) with a
shimmed ``kbmod`` package: intra-reference imports resolve to other loaded
reference modules where possible, and to this repo's API-compatible
``kbmod_tpu.search`` compat module for the pybind-layer symbols
(DebugTimer, extract_all_trajectory_*). The reference's torch/numpy
implementations then run side by side with ours on identical inputs —
the strongest form of the reference's own tests/test_python_parity.py.

Modules needing packages absent from this environment (astropy, numba,
the compiled kbmod.search) are skipped.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src/kbmod/"

requires_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference implementation not available"
)


def _load(name, relpath):
    spec = importlib.util.spec_from_file_location(name, REF + relpath)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def ref():
    """Reference modules loaded under a shimmed ``kbmod`` package."""
    if not os.path.isdir(REF):
        pytest.skip("reference not available")
    saved = {k: v for k, v in sys.modules.items() if k.split(".")[0] == "kbmod"}
    try:
        import kbmod_tpu.search as compat_search

        pkg = types.ModuleType("kbmod")
        core = types.ModuleType("kbmod.core")
        sys.modules["kbmod"] = pkg
        sys.modules["kbmod.core"] = core
        # pybind-layer symbols come from our API-compatible module.
        sys.modules["kbmod.search"] = compat_search

        psf = _load("kbmod.core.psf", "core/psf.py")
        sas = _load("kbmod.core.shift_and_stack", "core/shift_and_stack.py")
        isp = _load("kbmod.core.image_stack_py", "core/image_stack_py.py")
        sg = _load("kbmod.filters.sigma_g_filter", "filters/sigma_g_filter.py")
        cg = _load("kbmod.filters.clustering_grid", "filters/clustering_grid.py")
        yield types.SimpleNamespace(psf=psf, sas=sas, isp=isp, sg=sg, cg=cg)
    finally:
        for k in [k for k in sys.modules if k.split(".")[0] == "kbmod"]:
            del sys.modules[k]
        sys.modules.update(saved)


def _random_stack(rng, T, H, W, mask_frac=0.05):
    sci = rng.normal(0.0, 2.0, (T, H, W)).astype(np.float32)
    var = rng.uniform(0.5, 3.0, (T, H, W)).astype(np.float32)
    mask = rng.uniform(size=(T, H, W)) < mask_frac
    sci[mask] = np.nan
    var[mask] = np.nan
    return sci, var


@requires_reference
class TestPsiPhiGenerationParity:
    def test_generate_psi_phi_images(self, ref):
        from kbmod_tpu.core.psf import PSF
        from kbmod_tpu.core.shift_and_stack import generate_psi_phi_images

        rng = np.random.default_rng(42)
        sci, var = _random_stack(rng, 3, 32, 40)
        kern = PSF.make_gaussian_kernel(1.1)
        for t in range(3):
            ref_psi, ref_phi = ref.sas.generate_psi_phi_images(
                sci[t].copy(), var[t].copy(), kern
            )
            got_psi, got_phi = generate_psi_phi_images(sci[t], var[t], kern)
            np.testing.assert_allclose(
                np.asarray(got_psi), ref_psi, rtol=2e-4, atol=2e-4, equal_nan=True
            )
            np.testing.assert_allclose(
                np.asarray(got_phi), ref_phi, rtol=2e-4, atol=2e-4, equal_nan=True
            )


@requires_reference
class TestImageStackParity:
    def _pair(self, ref, rng, T=4, H=24, W=28):
        from kbmod_tpu.core.image_stack_py import ImageStackPy

        sci, var = _random_stack(rng, T, H, W)
        times = 59000.0 + np.arange(T) * 0.04
        r = ref.isp.ImageStackPy(times, [s.copy() for s in sci], [v.copy() for v in var])
        g = ImageStackPy(times, [s.copy() for s in sci], [v.copy() for v in var])
        return r, g

    def test_zeroed_times_and_masked_fractions(self, ref):
        rng = np.random.default_rng(7)
        r, g = self._pair(ref, rng)
        np.testing.assert_allclose(g.zeroed_times, r.zeroed_times)
        np.testing.assert_allclose(
            g.get_masked_fractions(), r.get_masked_fractions()
        )

    def test_masking_semantics_match(self, ref):
        rng = np.random.default_rng(8)
        r, g = self._pair(ref, rng)
        for t in range(r.num_times):
            np.testing.assert_array_equal(
                np.isnan(np.asarray(g.sci[t])), np.isnan(r.sci[t])
            )

    def test_get_matched_obstimes(self, ref):
        rng = np.random.default_rng(9)
        r, g = self._pair(ref, rng)
        query = [r.times[0] - 1.0, r.times[1], r.times[2] + 1e-9, r.times[-1] + 5.0]
        np.testing.assert_array_equal(
            g.get_matched_obstimes(query), r.get_matched_obstimes(query)
        )


@requires_reference
class TestSigmaGParity:
    def test_coefficient(self, ref):
        from kbmod_tpu.filters.sigma_g_filter import SigmaGClipping

        for lo, hi in ((25, 75), (15, 60), (40, 90)):
            np.testing.assert_allclose(
                SigmaGClipping.find_sigma_g_coeff(lo, hi),
                ref.sg.SigmaGClipping.find_sigma_g_coeff(lo, hi),
                rtol=1e-12,
            )

    def test_clipped_matrix(self, ref):
        from kbmod_tpu.filters.sigma_g_filter import SigmaGClipping

        rng = np.random.default_rng(11)
        curves = rng.normal(5.0, 2.0, (20, 15)).astype(np.float32)
        # Outliers + NaNs like post-search likelihood curves.
        curves[rng.uniform(size=curves.shape) < 0.1] = np.nan
        curves[3, 4] = 80.0
        curves[7, 0] = -40.0
        r_clip = ref.sg.SigmaGClipping(25, 75, 2.0)
        g_clip = SigmaGClipping(25, 75, 2.0)
        ref_idx = r_clip.compute_clipped_sigma_g_matrix(curves.copy())
        got_idx = g_clip.compute_clipped_sigma_g_matrix(curves.copy())
        np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))

    def test_clipped_single_curve(self, ref):
        from kbmod_tpu.filters.sigma_g_filter import SigmaGClipping

        rng = np.random.default_rng(12)
        vals = rng.normal(3.0, 1.0, 25).astype(np.float32)
        vals[5] = 60.0
        r_clip = ref.sg.SigmaGClipping(25, 75, 2.0)
        g_clip = SigmaGClipping(25, 75, 2.0)
        np.testing.assert_array_equal(
            np.sort(np.asarray(g_clip.compute_clipped_sigma_g(vals.copy()))),
            np.sort(np.asarray(r_clip.compute_clipped_sigma_g(vals.copy()))),
        )


@requires_reference
class TestClusterGridParity:
    def test_trajectory_cluster_grid(self, ref):
        from kbmod_tpu.filters.clustering_grid import TrajectoryClusterGrid
        from kbmod_tpu.search import Trajectory

        rng = np.random.default_rng(13)
        trjs = [
            Trajectory(
                x=int(rng.integers(0, 100)),
                y=int(rng.integers(0, 100)),
                vx=float(rng.uniform(-20, 20)),
                vy=float(rng.uniform(-20, 20)),
                lh=float(rng.uniform(1, 50)),
                obs_count=10,
            )
            for _ in range(200)
        ]
        r_grid = ref.cg.TrajectoryClusterGrid(bin_width=10, max_time=0.5)
        g_grid = TrajectoryClusterGrid(bin_width=10, max_time=0.5)
        for i, t in enumerate(trjs):
            r_grid.add_trajectory(t, i)
            g_grid.add_trajectory(t, i)
        assert g_grid.total_count == r_grid.total_count
        np.testing.assert_array_equal(
            np.sort(g_grid.get_indices()), np.sort(r_grid.get_indices())
        )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
