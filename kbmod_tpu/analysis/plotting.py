"""Plotting helpers for results, stamps, and light curves.

Behavior-compatible with the reference's kbmod.analysis.plotting
(src/kbmod/analysis/plotting.py): stamp grids, light curves, image
footprints, and per-result summary figures.
"""

import numpy as np

__all__ = [
    "plot_image",
    "plot_multiple_images",
    "plot_time_series",
    "plot_result_row",
    "plot_result_row_summary",
    "plot_image_bounds",
]


def _get_plt():
    import matplotlib.pyplot as plt

    return plt


def plot_image(image, ax=None, figure=None, norm=True, title=None, show_counts=False, cmap="gray"):
    """Plot a single image (stamp or full frame) with optional percentile
    normalization."""
    plt = _get_plt()
    if ax is None:
        figure = figure or plt.figure()
        ax = figure.add_subplot(111)
    image = np.asanyarray(image)
    if norm and np.any(np.isfinite(image)):
        vmin, vmax = np.nanpercentile(image, [0.5, 99.5])
    else:
        vmin = vmax = None
    im = ax.imshow(image, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
    if title:
        ax.set_title(title)
    if show_counts:
        plt.colorbar(im, ax=ax)
    return ax


def plot_multiple_images(images, labels=None, columns=3, norm=True, figure=None, cmap="gray"):
    """Plot a grid of images (e.g. all stamps for a result)."""
    plt = _get_plt()
    images = [np.asanyarray(img) for img in images]
    num = len(images)
    rows = int(np.ceil(num / columns))
    figure = figure or plt.figure(figsize=(3 * columns, 3 * rows))
    for idx, img in enumerate(images):
        ax = figure.add_subplot(rows, columns, idx + 1)
        label = labels[idx] if labels is not None else f"{idx}"
        plot_image(img, ax=ax, norm=norm, title=label, cmap=cmap)
        ax.set_xticks([])
        ax.set_yticks([])
    figure.tight_layout()
    return figure


def plot_time_series(values, times=None, indices=None, ax=None, figure=None, title=None):
    """Plot a light curve (psi/phi/likelihood series), marking invalid
    points."""
    plt = _get_plt()
    if ax is None:
        figure = figure or plt.figure()
        ax = figure.add_subplot(111)
    values = np.asanyarray(values, dtype=float)
    x = np.asanyarray(times, dtype=float) if times is not None else np.arange(len(values))
    if indices is None:
        indices = np.isfinite(values)
    indices = np.asanyarray(indices, dtype=bool)
    ax.plot(x, values, color="0.7", linewidth=1)
    ax.plot(x[indices], values[indices], "b.", label="valid")
    if np.any(~indices):
        ax.plot(x[~indices], values[~indices], "rx", label="invalid")
        ax.legend()
    if title:
        ax.set_title(title)
    return ax


def plot_image_bounds(wcs_list, shapes, ax=None, figure=None, labels=None):
    """Plot the sky footprints of a set of images from their WCSes."""
    plt = _get_plt()
    if ax is None:
        figure = figure or plt.figure()
        ax = figure.add_subplot(111)
    for i, (wcs, shape) in enumerate(zip(wcs_list, shapes)):
        if wcs is None:
            continue
        h, w = shape
        xs = [0, w - 1, w - 1, 0, 0]
        ys = [0, 0, h - 1, h - 1, 0]
        ra, dec = wcs.pixel_to_world_values(xs, ys)
        label = labels[i] if labels is not None else None
        ax.plot(ra, dec, label=label)
    ax.set_xlabel("RA (deg)")
    ax.set_ylabel("Dec (deg)")
    if labels is not None:
        ax.legend()
    return ax


def plot_result_row(row, times=None, coadd_col="stamp", figure=None):
    """Summary figure for one result row: coadd stamp + psi/phi/likelihood
    curves."""
    plt = _get_plt()
    figure = figure or plt.figure(figsize=(10, 6))

    ax_stamp = figure.add_subplot(2, 2, 1)
    if coadd_col in row:
        plot_image(row[coadd_col], ax=ax_stamp, title=coadd_col)
    else:
        ax_stamp.text(0.5, 0.5, "no stamp", ha="center")

    obs_valid = np.asanyarray(row["obs_valid"]) if "obs_valid" in row else None
    if "psi_curve" in row:
        ax_psi = figure.add_subplot(2, 2, 2)
        plot_time_series(row["psi_curve"], times=times, indices=obs_valid, ax=ax_psi, title="psi")
    if "phi_curve" in row:
        ax_phi = figure.add_subplot(2, 2, 3)
        plot_time_series(row["phi_curve"], times=times, indices=obs_valid, ax=ax_phi, title="phi")
    if "psi_curve" in row and "phi_curve" in row:
        psi = np.asanyarray(row["psi_curve"], dtype=float)
        phi = np.asanyarray(row["phi_curve"], dtype=float)
        lh = np.where(phi > 0, psi / np.sqrt(np.where(phi > 0, phi, 1.0)), 0.0)
        ax_lh = figure.add_subplot(2, 2, 4)
        plot_time_series(lh, times=times, indices=obs_valid, ax=ax_lh, title="likelihood")

    title = f"x={row['x']} y={row['y']} vx={row['vx']:.2f} vy={row['vy']:.2f} lh={row['likelihood']:.2f}"
    figure.suptitle(title)
    figure.tight_layout()
    return figure


def plot_result_row_summary(results, idx, times=None, figure=None):
    """Summary figure for results.table row ``idx``."""
    return plot_result_row(results.table[idx], times=times, figure=figure)
