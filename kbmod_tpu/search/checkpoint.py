"""Per-tile checkpoint/resume for the core search.

The reference has no mid-search checkpointing — persistence stops at
pipeline-stage granularity (WorkUnit/Results files; SURVEY.md §5.4 notes a
"sharded search can additionally checkpoint per pixel-tile results"). On TPU
a survey-scale search over a 4k x 4k starting-pixel grid runs as a sequence
of independent row tiles, so a killed job can resume at tile granularity.

``checkpointed_core_search`` splits the starting-pixel y-range into row
tiles, runs :func:`kbmod_tpu.ops.search.core_search` on each, and writes one
``tile_<y0>_<y1>.npz`` per finished tile under ``checkpoint_dir``. A resumed
call with identical inputs (validated by a content fingerprint stored in
``manifest.json``) loads finished tiles from disk and only computes the
remainder. The output is bit-identical to a single un-tiled ``core_search``
call because the kernel's per-pixel top-K depends only on that pixel's
(psi, phi) curves and the result layout is pixel-major (kernels.cu:286):
row tiles concatenate exactly.

Note: tiling is exact for the plain and quantized kernels; the in-kernel
sigma-G path re-ranks per pixel, which is also pixel-local, so it tiles
exactly too.
"""

import hashlib
import json
import logging
import os

import numpy as np

from kbmod_tpu.ops import search as search_ops

logger = logging.getLogger(__name__)

_RESULT_KEYS = ("x", "y", "vx", "vy", "lh", "flux", "obs_count")


def _fingerprint(psi, phi, valid, times, vxs, vys, bounds, rpp, kwargs):
    """Cheap content hash binding a checkpoint dir to one search setup.

    Hashes shapes, all parameters (scalar AND array-valued — the encoded
    path passes psi_codes/phi_codes/encode_meta), the candidate set, the
    time stamps and strided samples of psi, phi and the validity plane —
    enough to reject a stale checkpoint directory (e.g. a phi-only or
    mask-only change) without reading the full multi-GB stack.
    """
    h = hashlib.sha256()

    def upd_sample(a):
        a = np.asarray(a)
        h.update(np.asarray(a.shape, dtype=np.int64).tobytes())
        sample = a.ravel()[:: max(1, a.size // 4096)]
        h.update(np.ascontiguousarray(sample).tobytes())

    upd_sample(psi)
    upd_sample(phi)
    if valid is not None:
        upd_sample(valid)
    h.update(np.asarray(times, dtype=np.float64).tobytes())
    h.update(np.asarray(vxs, dtype=np.float32).tobytes())
    h.update(np.asarray(vys, dtype=np.float32).tobytes())
    h.update(np.asarray(bounds, dtype=np.int64).tobytes())
    h.update(np.int64(rpp).tobytes())
    for k, v in sorted(kwargs.items()):
        if v is None or np.isscalar(v):
            h.update(json.dumps({k: v}, default=str).encode())
        else:
            h.update(k.encode())
            upd_sample(v)
    return h.hexdigest()


def checkpointed_core_search(
    psi,
    phi,
    valid,
    times,
    vxs,
    vys,
    x_min,
    x_max,
    y_min,
    y_max,
    results_per_pixel,
    checkpoint_dir,
    tile_rows=256,
    cleanup=False,
    search_fn=None,
    **core_kwargs,
):
    """Run core_search in resumable row tiles.

    Parameters mirror :func:`kbmod_tpu.ops.search.core_search` plus:

    * ``checkpoint_dir`` — directory for per-tile ``.npz`` files and the
      ``manifest.json`` fingerprint. Created if missing.
    * ``tile_rows`` — starting-pixel rows per tile (the unit of resume).
    * ``cleanup`` — delete the checkpoint directory contents on success.
    * ``search_fn`` — per-tile search with core_search's positional
      signature; defaults to core_search. The sharded path passes a
      mesh-sharded adapter so checkpointing composes with multi-chip
      searches.

    Returns the same pixel-major SoA dict as ``core_search``.
    """
    if search_fn is None:
        search_fn = search_ops.core_search
    os.makedirs(checkpoint_dir, exist_ok=True)
    bounds = (int(x_min), int(x_max), int(y_min), int(y_max))
    fp = _fingerprint(psi, phi, valid, times, vxs, vys, bounds, results_per_pixel, core_kwargs)

    manifest_path = os.path.join(checkpoint_dir, "manifest.json")
    stale = False
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                old = json.load(f)
            stale = old.get("fingerprint") != fp or old.get("tile_rows") != int(tile_rows)
        except (json.JSONDecodeError, OSError):
            stale = True
    if stale:
        logger.warning(
            f"Checkpoint dir {checkpoint_dir} belongs to a different search; discarding it."
        )
        for name in os.listdir(checkpoint_dir):
            if name == "manifest.json" or (name.startswith("tile_") and name.endswith(".npz")):
                os.remove(os.path.join(checkpoint_dir, name))
    with open(manifest_path, "w") as f:
        json.dump({"fingerprint": fp, "tile_rows": int(tile_rows), "bounds": bounds}, f)

    edges = list(range(int(y_min), int(y_max), int(tile_rows))) + [int(y_max)]
    tiles = list(zip(edges[:-1], edges[1:]))
    parts = []
    n_loaded = 0
    for y0, y1 in tiles:
        path = os.path.join(checkpoint_dir, f"tile_{y0}_{y1}.npz")
        if os.path.exists(path):
            with np.load(path) as z:
                parts.append({k: z[k] for k in _RESULT_KEYS})
            n_loaded += 1
            continue
        part = search_fn(
            psi, phi, valid, times, vxs, vys,
            x_min, x_max, y0, y1, results_per_pixel, **core_kwargs,
        )
        # Atomic publish: a tile file either exists complete or not at all.
        tmp = path + ".tmp.npz"
        np.savez(tmp, **{k: part[k] for k in _RESULT_KEYS})
        os.replace(tmp, path)
        parts.append(part)
        logger.debug(f"Checkpointed search tile y=[{y0},{y1}) -> {path}")
    if n_loaded:
        logger.info(f"Resumed {n_loaded}/{len(tiles)} search tiles from {checkpoint_dir}.")

    results = {k: np.concatenate([p[k] for p in parts]) for k in _RESULT_KEYS}
    if cleanup:
        for y0, y1 in tiles:
            path = os.path.join(checkpoint_dir, f"tile_{y0}_{y1}.npz")
            if os.path.exists(path):
                os.remove(path)
        os.remove(manifest_path)
    return results
