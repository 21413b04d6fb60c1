"""util_functions tests (reference: tests/test_util_functions.py behavior)."""

import numpy as np

from kbmod_tpu.util_functions import (
    get_magnitude,
    get_matched_obstimes,
    get_unique_obstimes,
    mjd_to_day,
    unique_obstimes_and_indices,
)
from kbmod_tpu.utils.debug_timer import DebugTimer


class TestMatchedObstimes:
    def test_exact_and_near(self):
        obstimes = np.array([57130.0, 57130.5, 57131.0, 57135.0])
        got = get_matched_obstimes(obstimes, [57130.0, 57130.5001, 57131.2, 57135.0004])
        np.testing.assert_array_equal(got, [0, 1, -1, 3])

    def test_ties_and_bounds(self):
        obstimes = np.array([10.0, 20.0])
        # Query outside range, beyond threshold -> -1.
        got = get_matched_obstimes(obstimes, [9.0, 21.0, 10.00069, 19.9994])
        np.testing.assert_array_equal(got, [-1, -1, 0, 1])

    def test_custom_threshold(self):
        got = get_matched_obstimes([100.0], [100.4], threshold=0.5)
        np.testing.assert_array_equal(got, [0])


class TestUniqueObstimes:
    def test_exact_groups(self):
        times = [5.0, 3.0, 5.0, 3.0, 7.0]
        uniq, groups = get_unique_obstimes(times)
        np.testing.assert_array_equal(uniq, [3.0, 5.0, 7.0])
        assert groups == [[1, 3], [0, 2], [4]]

    def test_threshold_groups(self):
        times = [57130.0, 57130.0002, 57130.2, 57130.2003, 57131.0]
        uniq, groups = unique_obstimes_and_indices(times)
        assert len(uniq) == 3
        assert groups == [[0, 1], [2, 3], [4]]

    def test_unsorted_input(self):
        times = [7.0, 1.0, 1.0005, 7.0003]
        uniq, groups = unique_obstimes_and_indices(times)
        assert len(uniq) == 2
        assert groups[0] == [1, 2]
        assert groups[1] == [0, 3]


class TestScalarHelpers:
    def test_mjd_to_day(self):
        assert mjd_to_day(57130.0) == "2015-04-18"

    def test_get_magnitude(self):
        assert np.isclose(get_magnitude(100.0, 31.0), 26.0)
        # Brighter flux -> smaller magnitude.
        assert get_magnitude(1000.0, 31.0) < get_magnitude(10.0, 31.0)


class TestLoadDeccam:
    """load_deccam_layered_image (reference util_functions.py:68-118)."""

    def _write_deccam(self, path, mjd_header, ext=0):
        from kbmod_tpu.io.fits_io import HDUList, ImageHDU, PrimaryHDU, write_fits

        sci = np.arange(12, dtype=np.float32).reshape(3, 4)
        msk = np.zeros((3, 4), dtype=np.float32)
        var = np.full((3, 4), 2.0, dtype=np.float32)
        hdus = [PrimaryHDU(), ImageHDU(sci), ImageHDU(msk), ImageHDU(var)]
        for key, val in mjd_header.items():
            hdus[ext].header[key] = val
        write_fits(str(path), HDUList(hdus))
        return sci, var, msk

    def test_load(self, tmp_path):
        from kbmod_tpu.util_functions import load_deccam_layered_image

        path = tmp_path / "deccam.fits"
        sci, var, msk = self._write_deccam(path, {"MJD": 57130.5})
        img = load_deccam_layered_image(str(path), np.ones((1, 1), dtype=np.float32))
        np.testing.assert_allclose(img.sci, sci)
        np.testing.assert_allclose(img.var, var)
        assert img.time == 57130.5

    def test_mjd_key_preferred_over_extension(self, tmp_path):
        # MJD in ext 1 wins over DATE-AVG in ext 0 (key-major sweep).
        from kbmod_tpu.io.fits_io import HDUList, ImageHDU, PrimaryHDU, write_fits
        from kbmod_tpu.util_functions import load_deccam_layered_image

        path = tmp_path / "deccam2.fits"
        sci = np.zeros((2, 2), dtype=np.float32)
        hdus = [PrimaryHDU(), ImageHDU(sci), ImageHDU(sci), ImageHDU(sci)]
        hdus[0].header["DATE-AVG"] = "2015-04-18T00:00:00"
        hdus[1].header["MJD"] = 60000.25
        write_fits(str(path), HDUList(hdus))
        img = load_deccam_layered_image(str(path), np.ones((1, 1), dtype=np.float32))
        assert img.time == 60000.25

    def test_missing_file(self):
        import pytest

        from kbmod_tpu.util_functions import load_deccam_layered_image

        with pytest.raises(FileNotFoundError):
            load_deccam_layered_image("/nonexistent/file.fits", None)

    def test_too_few_extensions(self, tmp_path):
        import pytest

        from kbmod_tpu.io.fits_io import HDUList, ImageHDU, PrimaryHDU, write_fits
        from kbmod_tpu.util_functions import load_deccam_layered_image

        path = tmp_path / "short.fits"
        write_fits(str(path), HDUList([PrimaryHDU(), ImageHDU(np.zeros((2, 2), dtype=np.float32))]))
        with pytest.raises(ValueError):
            load_deccam_layered_image(str(path), None)


class TestDebugTimer:
    def test_start_stop_read(self):
        timer = DebugTimer("unit-test phase")
        t0 = timer.read()
        assert t0 >= 0.0
        timer.stop()
        stopped = timer.read()
        assert timer.read() == stopped  # frozen after stop
        timer.start()
        assert timer.read() >= 0.0
