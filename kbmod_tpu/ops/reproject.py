"""On-device image resampling for WCS reprojection.

The reference reprojects on the host with reproject.reproject_adaptive
under a ProcessPoolExecutor (src/kbmod/reprojection.py:19-71). Here the
coordinate grids are computed on host in float64 (exact TAN math) and the
interpolation runs on the TPU as a batched bilinear gather.
"""


import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _bilinear_resample(image, valid, coords_y, coords_x):
    """Bilinear resampling with validity propagation.

    image : (H, W) float32 with 0 at invalid pixels.
    valid : (H, W) float32 1/0 validity.
    coords_y, coords_x : (Ho, Wo) float32 source coordinates per output
        pixel (NaN = outside the source projection).

    Returns (out, footprint): the resampled image and the fraction of the
    interpolation weight that landed on valid source pixels. Output pixels
    whose footprint < 1 touched invalid/out-of-bounds source data.
    """
    H, W = image.shape
    finite = jnp.isfinite(coords_y) & jnp.isfinite(coords_x)
    cy = jnp.where(finite, coords_y, -10.0)
    cx = jnp.where(finite, coords_x, -10.0)

    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = cy - y0
    fx = cx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    out = jnp.zeros(coords_y.shape, dtype=jnp.float32)
    footprint = jnp.zeros(coords_y.shape, dtype=jnp.float32)
    flat_img = image.reshape(-1)
    flat_val = valid.reshape(-1)

    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yy = y0 + dy
        xx = x0 + dx
        w = (fy if dy else (1.0 - fy)) * (fx if dx else (1.0 - fx))
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
        v = jnp.where(inb, flat_val[idx], 0.0)
        out = out + w * v * flat_img[idx]
        footprint = footprint + w * v
    footprint = jnp.where(finite, footprint, 0.0)
    return out, footprint


def resample_layer(sci, var, src_coords, footprint_threshold=0.999):
    """Reproject one science/variance pair through precomputed source
    coordinates (2, Ho, Wo). Output pixels touching any invalid source data
    are NaN-masked (conservative footprint, matching the masked-collision
    behavior of the reference mosaicking)."""
    sci = np.asarray(sci, dtype=np.float32)
    var = np.asarray(var, dtype=np.float32)
    ok = np.isfinite(sci) & np.isfinite(var)
    sci_z = jnp.asarray(np.where(ok, sci, 0.0))
    var_z = jnp.asarray(np.where(ok, var, 0.0))
    val = jnp.asarray(ok.astype(np.float32))
    cy = jnp.asarray(src_coords[0], dtype=jnp.float32)
    cx = jnp.asarray(src_coords[1], dtype=jnp.float32)

    sci_out, foot = _bilinear_resample(sci_z, val, cy, cx)
    var_out, _ = _bilinear_resample(var_z, val, cy, cx)

    good = np.asarray(foot) >= footprint_threshold
    sci_np = np.where(good, np.asarray(sci_out) / np.maximum(np.asarray(foot), 1e-12), np.nan).astype(np.float32)
    var_np = np.where(good, np.asarray(var_out) / np.maximum(np.asarray(foot), 1e-12), np.nan).astype(np.float32)
    return sci_np, var_np, good


def compute_source_coordinates(src_wcs, dst_wcs, dst_shape):
    """(2, Ho, Wo) float64 source pixel coordinates for each target pixel:
    target pixel -> sky (dst WCS) -> source pixel (src WCS). Host math in
    float64 for sub-milliarcsecond accuracy."""
    Ho, Wo = dst_shape
    xx, yy = np.meshgrid(np.arange(Wo, dtype=np.float64), np.arange(Ho, dtype=np.float64))
    ra, dec = dst_wcs.pixel_to_world_values(xx, yy)
    sx, sy = src_wcs.world_to_pixel_values(ra, dec)
    return np.stack([sy, sx])
