"""RegionSearch / patch-grid tests (modeled on the reference's
tests/test_region_search.py)."""

import numpy as np
import pytest

from kbmod_tpu.region_search import Patch, Ephems, RegionSearch, patch_arcmin_to_pixels, polygon_area, clip_polygon
from kbmod_tpu.table import Table


class TestPolygonMath:
    def test_area(self):
        square = [(0, 0), (2, 0), (2, 2), (0, 2)]
        assert np.isclose(abs(polygon_area(square)), 4.0)

    def test_clip_inside(self):
        square = [(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)]
        clipped = clip_polygon(square, (0, 0, 2, 2))
        assert np.isclose(abs(polygon_area(clipped)), 1.0)

    def test_clip_partial(self):
        square = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
        clipped = clip_polygon(square, (0, 0, 2, 2))
        assert np.isclose(abs(polygon_area(clipped)), 1.0)

    def test_clip_outside(self):
        square = [(5, 5), (6, 5), (6, 6), (5, 6)]
        assert clip_polygon(square, (0, 0, 2, 2)) == []


class TestPatch:
    def test_basics(self):
        patch = Patch(100.0, -5.0, 0.5, 0.5, 0.25, patch_id=3)
        assert patch.contains(100.1, -5.1)
        assert not patch.contains(101.0, -5.0)
        assert patch.width_px == int(np.ceil(0.5 * 3600 / 0.25))
        wcs = patch.to_wcs()
        ra, dec = wcs.pixel_to_world_values(patch.width_px / 2 - 0.5, patch.height_px / 2 - 0.5)
        assert np.isclose(ra, 100.0, atol=1e-6)
        assert np.isclose(dec, -5.0, atol=1e-6)

    def test_overlap(self):
        patch = Patch(100.0, -5.0, 1.0, 1.0, 0.25)
        chip = [(99.9, -5.1), (100.1, -5.1), (100.1, -4.9), (99.9, -4.9)]
        overlap = patch.measure_overlap(np.array(chip))
        assert np.isclose(overlap, 0.04, atol=1e-6)
        assert patch.overlaps_polygon(np.array(chip))
        far_chip = [(150.0, 0.0), (150.1, 0.0), (150.1, 0.1), (150.0, 0.1)]
        assert not patch.overlaps_polygon(np.array(far_chip))

    def test_arcmin_to_pixels(self):
        assert patch_arcmin_to_pixels(1.0, 0.25) == 240


class _FakeIC:
    """A minimal ImageCollection stand-in for RegionSearch tests."""

    def __init__(self, table):
        self.data = table

    @property
    def columns(self):
        return self.data.colnames

    def __len__(self):
        return len(self.data)

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.data[key]
        sub = _FakeIC(self.data[key])
        return sub

    def reflex_correct(self, dist, earth_loc=None):
        from kbmod_tpu.reprojection_utils import correct_parallax_geometrically_vectorized

        corrected, _ = correct_parallax_geometrically_vectorized(
            np.asarray(self.data["ra"], dtype=float),
            np.asarray(self.data["dec"], dtype=float),
            np.asarray(self.data["mjd_mid"], dtype=float),
            dist,
        )
        self.data[f"ra_{dist}"] = corrected.ra_deg
        self.data[f"dec_{dist}"] = corrected.dec_deg

    def filter_by_time_range(self, start_mjd=None, end_mjd=None):
        t = np.asarray(self.data["mjd_mid"], dtype=float)
        keep = np.ones(len(t), dtype=bool)
        if start_mjd is not None:
            keep &= t >= start_mjd
        if end_mjd is not None:
            keep &= t <= end_mjd
        self.data = self.data[keep]

    def reset_lazy_loading_indices(self):
        pass

    def copy(self):
        return _FakeIC(self.data.copy())


def make_fake_ic(n=10, seed=5):
    rng = np.random.default_rng(seed)
    ra = 100.0 + rng.uniform(-0.8, 0.8, n)
    dec = -5.0 + rng.uniform(-0.8, 0.8, n)
    half = 0.05  # chip half-size (deg)
    data = {
        "ra": ra,
        "dec": dec,
        "mjd_mid": 57130.0 + rng.uniform(0, 1, n),
        "ra_tl": ra - half, "dec_tl": dec - half,
        "ra_tr": ra + half, "dec_tr": dec - half,
        "ra_br": ra + half, "dec_br": dec + half,
        "ra_bl": ra - half, "dec_bl": dec + half,
    }
    return _FakeIC(Table(data))


class TestRegionSearch:
    def test_generate_patches(self):
        rs = RegionSearch(make_fake_ic())
        patches = rs.generate_patches(
            30.0, pixel_scale=0.26, ra_range=(99.0, 101.0), dec_range=(-6.0, -4.0)
        )
        assert len(patches) == 16  # 4x4 grid of 0.5 deg patches
        assert all(p.width == 0.5 for p in patches)

    def test_match_chips_to_patches(self):
        ic = make_fake_ic()
        rs = RegionSearch(ic)
        rs.generate_patches(30.0, pixel_scale=0.26, ra_range=(99.0, 101.0), dec_range=(-6.0, -4.0))
        matches = rs.match_ic_to_patches()
        # Every chip lands in at least one patch.
        covered = set()
        for rows in matches.values():
            covered.update(rows)
        assert covered == set(range(len(ic)))

    def test_get_image_collection_from_patch(self):
        ic = make_fake_ic()
        rs = RegionSearch(ic)
        rs.generate_patches(30.0, pixel_scale=0.26, ra_range=(99.0, 101.0), dec_range=(-6.0, -4.0))
        matches = rs.match_ic_to_patches()
        patch_id = max(matches, key=lambda k: len(matches[k]))
        sub = rs.get_image_collection_from_patch(patch_id)
        assert len(sub) == len(matches[patch_id])

    def test_search_patches_by_ephems(self):
        ic = make_fake_ic()
        rs = RegionSearch(ic)
        rs.generate_patches(30.0, pixel_scale=0.26, ra_range=(99.0, 101.0), dec_range=(-6.0, -4.0))
        eph_table = Table({"ra": [100.1], "dec": [-5.1], "mjd": [57130.5]})
        ephems = Ephems(eph_table, "ra", "dec", "mjd")
        found = rs.search_patches_by_ephems(ephems)
        assert len(found) >= 1
        for pid in found:
            assert rs.get_patch(pid).contains(100.1, -5.1)

    def test_ephems_reflex_correction(self):
        eph_table = Table({"ra": [100.0, 101.0], "dec": [-5.0, -5.5], "mjd": [57130.5, 57131.0]})
        ephems = Ephems(eph_table, "ra", "dec", "mjd", guess_dists=[40.0])
        ras = ephems.get_ras(40.0)
        assert not np.allclose(ras, ephems.get_ras(None))
