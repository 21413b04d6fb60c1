"""WorkUnit geometry API tests: pixel<->sky coordinate mapping, ecliptic
angle, and EBD position inversion."""

import numpy as np

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.wcs_utils import make_fake_wcs


def make_work(n=4, with_wcs=True):
    ds = FakeDataSet(64, 80, create_fake_times(n, 57130.0), use_seed=3)
    work = ds.get_work_unit()
    if with_wcs:
        work.wcs = make_fake_wcs(200.0, -7.0, 64, 80, 1.0 / 3600.0)
    return work


class TestWorkUnitGeometry:
    def test_get_pixel_coordinates(self):
        work = make_work()
        ra, dec = work.wcs.pixel_to_world_values([10.0, 30.0], [20.0, 40.0])
        x, y = work.get_pixel_coordinates(ra, dec)
        np.testing.assert_allclose(x, [10.0, 30.0], atol=1e-6)
        np.testing.assert_allclose(y, [20.0, 40.0], atol=1e-6)

    def test_get_pixel_coordinates_with_times(self):
        work = make_work()
        times = work.get_all_obstimes()
        ra, dec = work.wcs.pixel_to_world_values([5.0], [6.0])
        x, y = work.get_pixel_coordinates([float(ra)], [float(dec)], times=[times[1]])
        np.testing.assert_allclose(x, [5.0], atol=1e-6)

    def test_compute_ecliptic_angle(self):
        work = make_work()
        angle = work.compute_ecliptic_angle()
        assert np.isfinite(angle)
        # No WCS -> warning + 0.0.
        work2 = make_work(with_wcs=False)
        assert work2.compute_ecliptic_angle() == 0.0

    def test_image_positions_to_original_icrs(self):
        work = make_work()
        work.reprojected = True
        work.reprojection_frame = "ebd"
        work.barycentric_distance = 40.0
        out = work.image_positions_to_original_icrs([0], [(10.0, 20.0)], output_format="radec")
        assert len(out) == 1
        ra, dec = out[0]
        # Inverting at 40 AU moves the position by less than a degree but
        # more than nothing.
        ra0, dec0 = work.wcs.pixel_to_world_values(10.0, 20.0)
        assert 0 < abs(ra - float(ra0)) < 1.0

    def test_unique_obstimes(self):
        work = make_work()
        times, groups = work.get_unique_obstimes_and_indices()
        assert len(times) == 4
        assert all(len(g) == 1 for g in groups)
