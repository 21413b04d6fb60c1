"""Source injection and recovery tests (modeled on the reference's
tests/test_injection.py)."""

import numpy as np

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.injection import (
    generate_injection_catalog,
    inject_sources_into_work_unit,
    match_injection_results,
)
from kbmod_tpu.results import Results
from kbmod_tpu.wcs_utils import make_fake_wcs


class TestInjection:
    def test_generate_catalog(self):
        catalog = generate_injection_catalog(
            20, 200.0, -7.0, 57130.0, vel_min=10.0, vel_max=100.0, seed=11
        )
        assert len(catalog) == 20
        assert np.all(np.abs(np.asarray(catalog["ra"]) - 200.0) < 0.2)
        speeds = np.hypot(catalog["v_ra"], catalog["v_dec"]) * 3600.0
        assert np.all(speeds >= 9.99)
        assert np.all(speeds <= 100.01)

    def test_generate_catalog_with_ebd(self):
        plain = generate_injection_catalog(5, 200.0, -7.0, 57130.0, seed=3)
        ebd = generate_injection_catalog(5, 200.0, -7.0, 57130.0, seed=3, barycentric_distance=40.0)
        # The inverse-EBD correction shifts the positions.
        assert not np.allclose(np.asarray(plain["ra"]), np.asarray(ebd["ra"]))

    def test_inject_and_recover(self):
        times = create_fake_times(8, t0=57130.0, obs_per_day=4)
        ds = FakeDataSet(128, 128, times, use_seed=21)
        work = ds.get_work_unit()
        work.wcs = make_fake_wcs(200.0, -7.0, 128, 128, 1.0 / 3600.0)

        catalog = generate_injection_catalog(
            3,
            200.0,
            -7.0,
            57130.0,
            ra_spread_deg=0.005,
            dec_spread_deg=0.005,
            vel_min=20.0,
            vel_max=60.0,
            mag_min=18.0,
            mag_max=19.0,
            seed=7,
        )
        injected = inject_sources_into_work_unit(work, catalog, zero_point=27.0)
        assert len(injected) == 3
        # The injections brightened the images.
        assert np.nanmax(work.im_stack.sci[0]) > 20.0

        # A perfect result set (the injected trajectories) matches fully.
        results = Results.from_trajectories(injected)
        match = match_injection_results(catalog, results, work, threshold_pixels=3.0)
        assert np.all(np.asarray(match["recovered"]))

        # An empty result set recovers nothing.
        empty_match = match_injection_results(catalog, Results(), work)
        assert not np.any(np.asarray(empty_match["recovered"]))
