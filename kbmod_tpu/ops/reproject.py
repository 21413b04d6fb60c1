"""On-device image resampling for WCS reprojection.

The reference reprojects on the host with reproject.reproject_adaptive
(DeForest 2004 anti-aliased resampling) under a ProcessPoolExecutor
(src/kbmod/reprojection.py:19-71). Here the coordinate grids are computed
on host in float64 (exact TAN math) and the interpolation runs on the TPU:

- ``method="adaptive"`` (default): a DeForest-style Gaussian-footprint
  resample. Each output pixel's kernel is shaped by the local Jacobian of
  the output->source pixel mapping (computed on device from the
  coordinate grids), with the kernel's singular values clamped to at
  least one source pixel so upsampling never aliases, evaluated over a
  static (2R+1)^2 tap stencil. Surface-brightness preserving like the
  reference's default; ``conserve_flux=True`` multiplies by |det J| for
  total-flux preservation under rescaling.
- ``method="bilinear"``: the fast 4-tap path (kept as an option).
"""


import math

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


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


def _clamped_inverse_metric(coords_y, coords_x):
    """Per-pixel inverse metric of the output->source Jacobian.

    For output offset ``o`` the source offset is ``d = J o``; the kernel
    argument is ``|J^-1 d|^2 = d^T (J J^T)^-1 d``. The SPD matrix
    ``A = J J^T`` has its eigenvalues clamped to >= 1 (the DeForest rule:
    the kernel never shrinks below one source pixel) before inversion.

    Returns (i11, i12, i22, sqrt_det): the components of ``A'^-1`` and
    ``sqrt(det A') = |det J'|`` (source pixels per output pixel).
    """
    dy_sy, dx_sy = jnp.gradient(coords_y)
    dy_sx, dx_sx = jnp.gradient(coords_x)
    finite = (
        jnp.isfinite(dy_sy) & jnp.isfinite(dx_sy) & jnp.isfinite(dy_sx) & jnp.isfinite(dx_sx)
    )
    dy_sy = jnp.where(finite, dy_sy, 1.0)
    dx_sy = jnp.where(finite, dx_sy, 0.0)
    dy_sx = jnp.where(finite, dy_sx, 0.0)
    dx_sx = jnp.where(finite, dx_sx, 1.0)

    a11 = dy_sy * dy_sy + dx_sy * dx_sy
    a12 = dy_sy * dy_sx + dx_sy * dx_sx
    a22 = dy_sx * dy_sx + dx_sx * dx_sx

    # Analytic 2x2 SPD eigen-clamp: A = m*I + B, eig(B) = +-disc.
    m = 0.5 * (a11 + a22)
    d = 0.5 * (a11 - a22)
    disc = jnp.sqrt(d * d + a12 * a12)
    lo = jnp.maximum(m - disc, 1.0)
    hi = jnp.maximum(m + disc, 1.0)
    m2 = 0.5 * (hi + lo)
    scale = jnp.where(disc > 1e-12, 0.5 * (hi - lo) / jnp.maximum(disc, 1e-12), 0.0)
    c11 = m2 + d * scale
    c12 = a12 * scale
    c22 = m2 - d * scale

    det = c11 * c22 - c12 * c12
    inv_det = 1.0 / jnp.maximum(det, 1e-12)
    return c22 * inv_det, -c12 * inv_det, c11 * inv_det, jnp.sqrt(jnp.maximum(det, 0.0))


@partial(jax.jit, static_argnames=("radius", "sigma2", "trunc2", "conserve_flux"))
def _adaptive_resample(image, valid, coords_y, coords_x, radius, sigma2, trunc2, conserve_flux):
    """DeForest-style Gaussian-footprint resampling with validity
    propagation over a static (2*radius+1)^2 tap stencil.

    Returns (out, footprint): the kernel-weighted mean over valid source
    pixels, and the fraction of total kernel weight that landed on valid
    in-bounds source data.
    """
    H, W = image.shape
    finite = jnp.isfinite(coords_y) & jnp.isfinite(coords_x)
    cy = jnp.where(finite, coords_y, -1e6)
    cx = jnp.where(finite, coords_x, -1e6)
    i11, i12, i22, sqrt_det = _clamped_inverse_metric(cy, cx)

    yc = jnp.round(cy).astype(jnp.int32)
    xc = jnp.round(cx).astype(jnp.int32)
    flat_img = image.reshape(-1)
    flat_val = valid.reshape(-1)

    out = jnp.zeros(coords_y.shape, dtype=jnp.float32)
    w_valid = jnp.zeros(coords_y.shape, dtype=jnp.float32)
    w_all = jnp.zeros(coords_y.shape, dtype=jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            yy = yc + dy
            xx = xc + dx
            ddy = yy.astype(jnp.float32) - cy
            ddx = xx.astype(jnp.float32) - cx
            q = i11 * ddy * ddy + 2.0 * i12 * ddy * ddx + i22 * ddx * ddx
            w = jnp.where(q <= trunc2, jnp.exp(-0.5 * q / sigma2), 0.0)
            inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
            v = jnp.where(inb, flat_val[idx], 0.0)
            wv = w * v
            out = out + wv * flat_img[idx]
            w_valid = w_valid + wv
            w_all = w_all + w
    out = out / jnp.maximum(w_valid, 1e-12)
    if conserve_flux:
        out = out * sqrt_det
    footprint = jnp.where(finite, w_valid / jnp.maximum(w_all, 1e-12), 0.0)
    return out, footprint


# DeForest/reproject-style defaults: a Gaussian of FWHM 1.3 output pixels
# truncated at +-2.6 output pixels (reproject.adaptive kernel_width=1.3,
# sample_region_width=4).
DEFAULT_KERNEL_WIDTH = 1.3
DEFAULT_SAMPLE_REGION_WIDTH = 4.0
_MAX_STENCIL_RADIUS = 8


def _stencil_radius(src_coords, trunc):
    """Static tap radius in source pixels: the truncation half-width in
    output pixels times the largest (clamped) singular value of the
    output->source Jacobian over the grid."""
    cy = np.asarray(src_coords[0], dtype=np.float64)
    cx = np.asarray(src_coords[1], dtype=np.float64)
    dy_sy, dx_sy = np.gradient(cy)
    dy_sx, dx_sx = np.gradient(cx)
    a11 = dy_sy**2 + dx_sy**2
    a12 = dy_sy * dy_sx + dx_sy * dx_sx
    a22 = dy_sx**2 + dx_sx**2
    lam_max = 0.5 * (a11 + a22) + np.sqrt((0.5 * (a11 - a22)) ** 2 + a12**2)
    with np.errstate(invalid="ignore"):
        s_max = math.sqrt(max(float(np.nanmax(lam_max)), 1.0))
    return max(1, min(_MAX_STENCIL_RADIUS, int(math.ceil(trunc * s_max))))


def resample_layer(
    sci,
    var,
    src_coords,
    footprint_threshold=0.999,
    method="adaptive",
    kernel_width=DEFAULT_KERNEL_WIDTH,
    sample_region_width=DEFAULT_SAMPLE_REGION_WIDTH,
    conserve_flux=False,
):
    """Reproject one science/variance pair through precomputed source
    coordinates (2, Ho, Wo). Output pixels touching any invalid source data
    are NaN-masked (conservative footprint, matching the masked-collision
    behavior of the reference mosaicking).

    method : "adaptive" (anti-aliased Gaussian footprint, the reference's
        reproject_adaptive fidelity) or "bilinear" (fast 4-tap).
    kernel_width : Gaussian FWHM in output pixels (adaptive only).
    sample_region_width : truncation width in units of kernel_width.
    conserve_flux : multiply by |det J| so total flux (not surface
        brightness) is preserved under rescaling (adaptive only).
    """
    sci = np.asarray(sci, dtype=np.float32)
    var = np.asarray(var, dtype=np.float32)
    ok = np.isfinite(sci) & np.isfinite(var)
    sci_z = jnp.asarray(np.where(ok, sci, 0.0))
    var_z = jnp.asarray(np.where(ok, var, 0.0))
    val = jnp.asarray(ok.astype(np.float32))
    cy = jnp.asarray(src_coords[0], dtype=jnp.float32)
    cx = jnp.asarray(src_coords[1], dtype=jnp.float32)

    if method == "bilinear":
        sci_out, foot = _bilinear_resample(sci_z, val, cy, cx)
        var_out, _ = _bilinear_resample(var_z, val, cy, cx)
        good = np.asarray(foot) >= footprint_threshold
        denom = np.maximum(np.asarray(foot), 1e-12)
        sci_np = np.where(good, np.asarray(sci_out) / denom, np.nan).astype(np.float32)
        var_np = np.where(good, np.asarray(var_out) / denom, np.nan).astype(np.float32)
        return sci_np, var_np, good
    if method != "adaptive":
        raise ValueError(f"Unknown resampling method {method!r}")

    sigma = float(kernel_width) / (2.0 * math.sqrt(2.0 * math.log(2.0)))
    trunc = 0.5 * float(kernel_width) * float(sample_region_width)
    radius = _stencil_radius(src_coords, trunc)
    sci_out, foot = _adaptive_resample(
        sci_z, val, cy, cx, radius, sigma * sigma, trunc * trunc, bool(conserve_flux)
    )
    var_out, _ = _adaptive_resample(
        var_z, val, cy, cx, radius, sigma * sigma, trunc * trunc, bool(conserve_flux)
    )
    good = np.asarray(foot) >= footprint_threshold
    sci_np = np.where(good, np.asarray(sci_out), np.nan).astype(np.float32)
    var_np = np.where(good, np.asarray(var_out), np.nan).astype(np.float32)
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
