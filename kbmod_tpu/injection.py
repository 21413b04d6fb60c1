"""Synthetic source injection and recovery matching.

Behavior-compatible with the reference's kbmod.injection
(src/kbmod/injection.py): generate ecliptic-aligned synthetic catalogs
with sub-pixel/velocity jitter (optionally inverse-EBD-corrected), inject
them into image data, and match search results against the injected
catalog to measure recovery rates. The Rubin ``VisitInjectTask`` path is
replaced by direct PSF-shaped injection into ImageStackPy/WorkUnit data
(the LSST-pipeline path requires the optional LSST stack).
"""

import logging

import numpy as np

from kbmod_tpu.geom.ecliptic import ecliptic_to_equatorial, equatorial_to_ecliptic
from kbmod_tpu.table import Table

logger = logging.getLogger(__name__)

__all__ = [
    "generate_injection_catalog",
    "inject_sources_into_work_unit",
    "match_injection_results",
]


def generate_injection_catalog(
    num_objects,
    center_ra,
    center_dec,
    mjd0,
    *,
    ra_spread_deg=0.1,
    dec_spread_deg=0.1,
    vel_min=2.0,
    vel_max=500.0,
    mag_min=20.0,
    mag_max=26.0,
    angle_jitter=0.1,
    barycentric_distance=None,
    seed=None,
):
    """Generate a catalog of synthetic moving objects aligned with the
    ecliptic.

    Each object gets a random start near (center_ra, center_dec), a
    velocity magnitude in [vel_min, vel_max] arcsec/day directed along the
    local ecliptic (plus ``angle_jitter`` radians of jitter), and a
    magnitude in [mag_min, mag_max]. When ``barycentric_distance`` is
    given, positions are inverse-EBD-corrected so that injection into
    original-frame images produces objects that move linearly in the EBD
    frame.

    Returns a Table with columns: object_id, ra, dec, v_ra, v_dec
    (deg/day), mag, mjd0.
    """
    rng = np.random.default_rng(seed)
    ra = center_ra + rng.uniform(-ra_spread_deg, ra_spread_deg, num_objects)
    dec = center_dec + rng.uniform(-dec_spread_deg, dec_spread_deg, num_objects)

    # Direction of increasing ecliptic longitude at each position.
    lon, lat = equatorial_to_ecliptic(ra, dec)
    d_lon = 1e-4
    ra2, dec2 = ecliptic_to_equatorial(lon + d_lon, lat)
    dir_ra = ra2 - ra
    dir_dec = dec2 - dec
    norm = np.hypot(dir_ra, dir_dec)
    dir_ra /= norm
    dir_dec /= norm

    angle = rng.uniform(-angle_jitter, angle_jitter, num_objects)
    cos_a, sin_a = np.cos(angle), np.sin(angle)
    jra = dir_ra * cos_a - dir_dec * sin_a
    jdec = dir_ra * sin_a + dir_dec * cos_a

    vel_deg = rng.uniform(vel_min, vel_max, num_objects) / 3600.0  # deg/day
    v_ra = jra * vel_deg
    v_dec = jdec * vel_deg
    mag = rng.uniform(mag_min, mag_max, num_objects)

    if barycentric_distance is not None:
        from kbmod_tpu.reprojection_utils import invert_correct_parallax_vectorized
        from kbmod_tpu.geom.wcs import SkyCoordLite

        coords = SkyCoordLite(ra, dec)
        coords.distance_au = np.full(num_objects, barycentric_distance)
        original = invert_correct_parallax_vectorized(coords, np.full(num_objects, mjd0))
        ra, dec = original.ra_deg, original.dec_deg

    return Table(
        {
            "object_id": np.arange(num_objects),
            "ra": ra,
            "dec": dec,
            "v_ra": v_ra,
            "v_dec": v_dec,
            "mag": mag,
            "mjd0": np.full(num_objects, float(mjd0)),
        }
    )


def _mag_to_flux(mag, zero_point=27.0):
    return 10.0 ** (-0.4 * (np.asarray(mag) - zero_point))


def inject_sources_into_work_unit(work_unit, catalog, zero_point=27.0):
    """Inject every catalog object into the WorkUnit's images.

    Positions are propagated linearly in sky coordinates from mjd0 and
    mapped into each image through its WCS; fluxes are PSF-convolved.
    Returns the list of pixel-space trajectories actually injected.
    """
    from kbmod_tpu.fake_data.fake_data_creator import image_stack_add_fake_object
    from kbmod_tpu.search import Trajectory

    stack = work_unit.im_stack
    obstimes = np.asarray(work_unit.get_all_obstimes())
    t0 = obstimes[0]
    injected = []
    for i in range(len(catalog)):
        ra0 = float(catalog["ra"][i])
        dec0 = float(catalog["dec"][i])
        v_ra = float(catalog["v_ra"][i])
        v_dec = float(catalog["v_dec"][i])
        mjd0 = float(catalog["mjd0"][i])
        flux = float(_mag_to_flux(catalog["mag"][i], zero_point))

        wcs = work_unit.get_wcs(0)
        if wcs is None:
            raise ValueError("Injection requires a WCS.")
        # Pixel trajectory via the WCS at the stack start time.
        ra_start = ra0 + v_ra * (t0 - mjd0)
        dec_start = dec0 + v_dec * (t0 - mjd0)
        x0, y0 = wcs.world_to_pixel_values(ra_start, dec_start)
        x1, y1 = wcs.world_to_pixel_values(ra_start + v_ra, dec_start + v_dec)
        trj = Trajectory(x=int(np.round(x0)), y=int(np.round(y0)), vx=float(x1 - x0), vy=float(y1 - y0), flux=flux)
        image_stack_add_fake_object(stack, trj.x, trj.y, trj.vx, trj.vy, flux=flux)
        injected.append(trj)
    return injected


def match_injection_results(catalog, results, work_unit, threshold_pixels=5.0):
    """Match search results back to the injected catalog.

    Returns a Table with object_id, recovered (bool), match_idx (row in
    ``results`` or -1), and distance (pixels).
    """
    from kbmod_tpu.trajectory_utils import match_trajectory_sets
    from kbmod_tpu.search import Trajectory

    stack_times = np.asarray(work_unit.get_all_obstimes())
    zeroed = stack_times - stack_times[0]
    wcs = work_unit.get_wcs(0)

    queries = []
    for i in range(len(catalog)):
        ra0 = float(catalog["ra"][i]) + float(catalog["v_ra"][i]) * (stack_times[0] - float(catalog["mjd0"][i]))
        dec0 = float(catalog["dec"][i]) + float(catalog["v_dec"][i]) * (stack_times[0] - float(catalog["mjd0"][i]))
        x0, y0 = wcs.world_to_pixel_values(ra0, dec0)
        x1, y1 = wcs.world_to_pixel_values(ra0 + float(catalog["v_ra"][i]), dec0 + float(catalog["v_dec"][i]))
        queries.append(Trajectory(x=int(np.round(x0)), y=int(np.round(y0)), vx=float(x1 - x0), vy=float(y1 - y0)))

    base = results.make_trajectory_list()
    if len(base) == 0:
        return Table(
            {
                "object_id": np.asarray(catalog["object_id"]),
                "recovered": np.zeros(len(catalog), dtype=bool),
                "match_idx": np.full(len(catalog), -1),
            }
        )

    sample_times = [0.0, float(zeroed[-1] / 2), float(zeroed[-1])]
    matches = match_trajectory_sets(queries, base, threshold_pixels, times=sample_times)
    return Table(
        {
            "object_id": np.asarray(catalog["object_id"]),
            "recovered": matches >= 0,
            "match_idx": matches,
        }
    )
