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

Multi-process (jax.distributed) searches are supported when
``checkpoint_dir`` is shared storage: process 0 owns the manifest and all
tile writes, and broadcasts the finished-tile set so every process takes
the same load-vs-compute branch (keeping the collectives inside a sharded
``search_fn`` aligned across hosts).
"""

import hashlib
import json
import logging
import os
import time

import numpy as np

from kbmod_tpu.ops import search as search_ops

logger = logging.getLogger(__name__)

_RESULT_KEYS = ("x", "y", "vx", "vy", "lh", "flux", "obs_count")


class _TileWriter:
    """Background checkpoint writer: one thread drains a bounded queue of
    (path, arrays) jobs so tile persistence overlaps the next tile's device
    work instead of sitting on the search's critical path (the r3 survey
    gate measured 76% of wall clock outside device search; VERDICT r3 #2).

    Files are published atomically — written to a hidden ``.<name>.tmp.npz``
    sibling then ``os.replace``d — so a SIGKILL at any point leaves only
    complete ``tile_*.npz`` files (plus at most one hidden tmp, which a
    resume ignores). ``close()`` drains the queue and re-raises the first
    write error, so success still guarantees every tile is on disk.
    """

    def __init__(self, directory, max_pending=2):
        import queue
        import threading

        self._dir = directory
        self._queue = queue.Queue(maxsize=max_pending)
        self._error = None
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self):
        while True:
            job = self._queue.get()
            if job is None:
                return
            path, arrays = job
            try:
                tmp = os.path.join(self._dir, "." + os.path.basename(path) + ".tmp.npz")
                np.savez(tmp, **arrays)
                os.replace(tmp, path)
            except Exception as exc:  # surfaced by close()
                if self._error is None:
                    self._error = exc

    def submit(self, path, arrays):
        if self._error is not None:
            raise self._error
        self._queue.put((path, arrays))

    def close(self):
        self._queue.put(None)
        self._thread.join()
        if self._error is not None:
            raise self._error


def _sample_blocks(lead):
    """One fused device dispatch for the fingerprint sample of a (R, N)
    array: 8 leading-axis strided rows x two 256-element contiguous
    blocks, concatenated. Jitted so the whole sample is one executable +
    one host fetch instead of a chain of eager slice round-trips."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _take(x):
        rows = x[:: max(1, x.shape[0] // 8)][:8]
        mid = rows.shape[1] // 2
        take = min(256, rows.shape[1])
        return jnp.concatenate(
            [rows[:, :take], rows[:, mid : mid + take]], axis=1
        )

    return _take(lead)


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
        # Slice BEFORE any host conversion: device arrays stay on device
        # and only a ~4k-element sample crosses to the host (a full
        # np.asarray of a survey-scale code plane is a multi-GB fetch).
        # The sample is 8 strided rows x two 256-element CONTIGUOUS
        # blocks, computed in ONE jitted dispatch: a flat stride-409600
        # gather over a 1.7e9-element plane measured 200 s on a v5e
        # through the tunnel (the whole resume gap of the r5 full-grid
        # gate), and even eager slice chains cost ~39 s of per-op round
        # trips when the tunnel degrades.
        shape = tuple(int(s) for s in a.shape)
        h.update(np.asarray(shape, dtype=np.int64).tobytes())
        if not shape or getattr(a, "ndim", 0) == 0:
            h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
            return
        lead = a.reshape(shape[0], -1)
        if isinstance(a, np.ndarray):
            rows = lead[:: max(1, shape[0] // 8)][:8]
            mid = rows.shape[1] // 2
            h.update(np.ascontiguousarray(rows[:, :256]).tobytes())
            h.update(np.ascontiguousarray(rows[:, mid : mid + 256]).tobytes())
            return
        h.update(np.asarray(_sample_blocks(lead)).tobytes())

    if isinstance(psi, search_ops.EncodedPlanes):
        # Survey-scale eval planes: fingerprint the code planes + decode
        # metadata (phi/valid are None in this calling convention).
        upd_sample(psi.psi_codes)
        upd_sample(psi.phi_codes)
        upd_sample(psi.em)
    else:
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
        elif callable(v) and not hasattr(v, "shape"):
            # Callable kwargs (e.g. packed_provider) carry no hashable
            # content; their *inputs* (the code planes) are fingerprinted
            # above, so record only that the kwarg was present.
            h.update(f"{k}:<callable>".encode())
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
    t_fp = time.monotonic()
    fp = _fingerprint(psi, phi, valid, times, vxs, vys, bounds, results_per_pixel, core_kwargs)
    logger.info(f"Checkpoint fingerprint in {time.monotonic() - t_fp:.1f}s.")

    # Multi-process (pod) coordination: checkpoint_dir must be SHARED
    # storage (GCS/NFS on a pod; one filesystem in tests). Process 0 owns
    # the manifest and every write; the finished-tile set is decided by
    # process 0 and broadcast, so all processes take the same load-vs-
    # compute branch — a divergent branch would deadlock the collectives
    # inside a sharded search_fn.
    nproc, is_primary = 1, True
    try:
        import jax

        nproc = jax.process_count()
        is_primary = jax.process_index() == 0
    except Exception:  # pragma: no cover - jax is a hard dep in practice
        pass

    manifest_path = os.path.join(checkpoint_dir, "manifest.json")
    if is_primary:
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
                if (
                    name == "manifest.json"
                    or (name.startswith("tile_") and name.endswith(".npz"))
                    or (name.startswith(".tile_") and name.endswith(".tmp.npz"))
                ):
                    os.remove(os.path.join(checkpoint_dir, name))
        with open(manifest_path, "w") as f:
            json.dump({"fingerprint": fp, "tile_rows": int(tile_rows), "bounds": bounds}, f)

    edges = list(range(int(y_min), int(y_max), int(tile_rows))) + [int(y_max)]
    tiles = list(zip(edges[:-1], edges[1:]))
    paths = [os.path.join(checkpoint_dir, f"tile_{y0}_{y1}.npz") for y0, y1 in tiles]
    if nproc > 1:
        from jax.experimental import multihost_utils

        # Barrier: no process may list tiles while process 0 is still
        # discarding a stale directory or rewriting the manifest.
        multihost_utils.sync_global_devices("kbmod_ckpt_manifest")
        local = np.array([os.path.exists(p) for p in paths], np.int32)
        finished = np.asarray(
            multihost_utils.broadcast_one_to_all(local if is_primary else np.zeros_like(local))
        ).astype(bool)
    else:
        finished = np.array([os.path.exists(p) for p in paths], bool)

    parts = []
    n_loaded = 0
    t_load = 0.0
    writer = _TileWriter(checkpoint_dir) if is_primary else None
    try:
        for (y0, y1), path, done in zip(tiles, paths, finished):
            if done:
                t_l = time.monotonic()
                try:
                    with np.load(path) as z:
                        parts.append({k: z[k] for k in _RESULT_KEYS})
                except OSError as exc:
                    raise OSError(
                        f"Process {0 if is_primary else 'n'} cannot read finished tile "
                        f"{path}; multi-process checkpointing requires checkpoint_dir "
                        f"to be shared storage."
                    ) from exc
                n_loaded += 1
                t_load += time.monotonic() - t_l
                continue
            part = search_fn(
                psi, phi, valid, times, vxs, vys,
                x_min, x_max, y0, y1, results_per_pixel, **core_kwargs,
            )
            # Publish off the critical path: the writer thread persists
            # this tile while the NEXT tile's device work runs. Each file
            # still lands atomically (hidden tmp + os.replace), so a kill
            # at any moment leaves only complete tiles behind.
            if writer is not None:
                writer.submit(path, {k: part[k] for k in _RESULT_KEYS})
            parts.append(part)
            logger.debug(f"Checkpointed search tile y=[{y0},{y1}) -> {path}")
    finally:
        if writer is not None:
            writer.close()
    if n_loaded:
        logger.info(
            f"Resumed {n_loaded}/{len(tiles)} search tiles from {checkpoint_dir} "
            f"in {t_load:.1f}s."
        )

    results = {k: np.concatenate([p[k] for p in parts]) for k in _RESULT_KEYS}
    if cleanup and nproc > 1:
        from jax.experimental import multihost_utils

        # No process may still be loading tiles once process 0 deletes them.
        multihost_utils.sync_global_devices("kbmod_ckpt_cleanup")
    if cleanup and is_primary:
        for y0, y1 in tiles:
            path = os.path.join(checkpoint_dir, f"tile_{y0}_{y1}.npz")
            if os.path.exists(path):
                os.remove(path)
        os.remove(manifest_path)
    return results
