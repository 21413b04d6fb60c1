"""WorkUnit reprojection to a common WCS.

API-compatible with the reference's kbmod.reprojection
(src/kbmod/reprojection.py): reproject every image of a WorkUnit onto a
common WCS, mosaicking same-obstime images into single layers (overlap
collisions masked), with optional "ebd" frame (per-image barycentric
parallax-corrected WCSes). The resampling runs on device
(kbmod_tpu.ops.reproject) instead of a host process pool.
"""

import logging

import numpy as np

from kbmod_tpu.core.image_stack_py import ImageStackPy
from kbmod_tpu.ops.reproject import compute_source_coordinates, resample_layer
from kbmod_tpu.reprojection_utils import transform_wcses_to_ebd
from kbmod_tpu.work_unit import WorkUnit

logger = logging.getLogger(__name__)

__all__ = ["reproject_work_unit", "reproject_lazy_work_unit"]


def _get_combined_psf(psfs):
    """One PSF for a mosaicked layer: the largest kernel of the group (the
    constituents come from the same instrument/epoch in practice)."""
    return max(psfs, key=lambda p: np.asarray(p).shape[0])


def reproject_work_unit(
    work_unit,
    common_wcs,
    frame="original",
    parallelize=True,
    max_parallel_processes=8,
    write_output=False,
    directory=None,
    filename=None,
    show_progress=None,
):
    """Reproject a WorkUnit onto ``common_wcs``.

    Parameters
    ----------
    work_unit : `WorkUnit`
        The input (must not already be reprojected).
    common_wcs : `WCS`
        The target WCS; its array_shape sets the output image size.
    frame : `str`
        "original" reprojects from each image's own WCS; "ebd" first fits
        per-image barycentric (EBD) WCSes at the WorkUnit's
        barycentric_distance and reprojects from those.
    parallelize, max_parallel_processes : kept for API parity — the device
        kernel replaces host process-pool parallelism.
    write_output : bool
        When True, write the result to sharded FITS instead of returning.

    Returns
    -------
    `WorkUnit` or None (when write_output).
    """
    if work_unit.reprojected:
        raise ValueError("Unable to reproject a reprojected WorkUnit.")
    if common_wcs.array_shape is None:
        raise ValueError("common_wcs must carry an array shape.")
    height, width = common_wcs.array_shape

    stack = work_unit.im_stack
    obstimes = np.asarray(work_unit.get_all_obstimes())
    per_image_wcs = [work_unit.get_wcs(i) for i in range(stack.num_times)]
    if any(w is None for w in per_image_wcs):
        raise ValueError("Every image needs a WCS to reproject.")

    # In the EBD frame, source coordinates run through the fitted
    # barycentric WCSes instead of the original ones.
    if frame == "ebd":
        if work_unit.barycentric_distance is None:
            raise ValueError("barycentric_distance is required for EBD reprojection.")
        src_wcs_list, geo_dists = transform_wcses_to_ebd(
            per_image_wcs,
            stack.width,
            stack.height,
            work_unit.barycentric_distance,
            obstimes,
            point_on_earth=work_unit.observatory,
            npoints=10,
            seed=101,
        )
        work_unit.org_img_meta["ebd_wcs"] = np.array(src_wcs_list, dtype=object)
        work_unit.org_img_meta["geocentric_distance"] = np.array(geo_dists, dtype=object)
    elif frame == "original":
        src_wcs_list = per_image_wcs
    else:
        raise ValueError(f"Invalid projection frame {frame}.")

    # Group images that share an obstime into mosaicked output layers.
    from kbmod_tpu.util_functions import unique_obstimes_and_indices

    unique_times, groups = unique_obstimes_and_indices(obstimes)

    new_stack = ImageStackPy()
    per_image_indices = []
    for time, group in zip(unique_times, groups):
        mosaic_sci = np.full((height, width), np.nan, dtype=np.float32)
        mosaic_var = np.full((height, width), np.nan, dtype=np.float32)
        n_contrib = np.zeros((height, width), dtype=np.int32)
        for idx in group:
            coords = compute_source_coordinates(src_wcs_list[idx], common_wcs, (height, width))
            sci_r, var_r, good = resample_layer(stack.sci[idx], stack.var[idx], coords)
            mosaic_sci[good] = sci_r[good]
            mosaic_var[good] = var_r[good]
            n_contrib += good
        # Mask collision pixels (covered by more than one constituent).
        collision = n_contrib > 1
        mosaic_sci[collision] = np.nan
        mosaic_var[collision] = np.nan

        psf = _get_combined_psf([stack.psfs[idx] for idx in group])
        new_stack.append_image(time, mosaic_sci, mosaic_var, psf=psf)
        per_image_indices.append(list(group))

    result = WorkUnit(
        im_stack=new_stack,
        config=work_unit.config,
        wcs=common_wcs,
        reprojected=True,
        reprojection_frame=frame,
        per_image_indices=per_image_indices,
        obstimes=obstimes,
        barycentric_distance=work_unit.barycentric_distance,
        org_image_meta=work_unit.org_img_meta,
        observatory=work_unit.observatory,
    )

    if write_output:
        if directory is None or filename is None:
            raise ValueError("write_output requires directory and filename.")
        result.to_sharded_fits(filename, directory, overwrite=True)
        return None
    return result


def reproject_lazy_work_unit(
    work_unit, common_wcs, directory, filename, frame="original", max_parallel_processes=8, order=None
):
    """Reproject a lazy (sharded) WorkUnit, writing sharded output."""
    if not work_unit.lazy:
        raise ValueError("Expected a lazy WorkUnit.")
    work_unit.load_images()
    reproject_work_unit(
        work_unit,
        common_wcs,
        frame=frame,
        write_output=True,
        directory=directory,
        filename=filename,
    )
