"""PsiPhiArray: the device-resident, search-ready representation of the
image stack.

psi = conv(sci / var, PSF) and phi = conv(1 / var, PSF^2) are the per-pixel
likelihood components; the trajectory search sums them along candidate paths.
Semantics follow the reference's psi/phi generation
(src/kbmod/core/shift_and_stack.py:8-45, src/kbmod/search/
image_utils_cpp.cpp:126-177) and its packed/quantized array
(src/kbmod/search/psi_phi_array_ds.h:40-67, psi_phi_array.cpp:219-291).

TPU-native design notes
-----------------------
* Instead of the reference's interleaved [psi, phi] flat buffer, psi and phi
  are separate (T, H, W) device arrays: the search kernel reads them with
  large contiguous slices, and XLA lays each out in its native tiling.
* Masked pixels are stored as 0.0 with a separate validity plane (uint8) in
  the float path; in the quantized path the code 0 means masked exactly as
  the reference's encoding, so no separate plane is needed.
* Quantization (uint8 / uint16) maps valid values to [1, 2^b - 1] with a
  global min/scale, identical to encode_uint_scalar (psi_phi_array_ds.h:40).
"""

import numpy as np
import jax
import jax.numpy as jnp

from kbmod_tpu.ops.convolve import convolve_masked_batch


# ----------------------------------------------------------------------
# psi / phi generation
# ----------------------------------------------------------------------

@jax.jit
def _psi_phi_from_sci_var(sci, var, psf):
    """Fused psi/phi generation for a batch of images sharing one PSF.

    sci, var: (N, H, W) float32 (NaN = masked); psf: (kh, kw).
    Returns psi, phi: (N, H, W) float32 with NaN at masked pixels.

    On TPU this runs the fused Pallas tap-sum kernel (one pass over the
    inputs; ops/conv_pallas.py) — XLA's single-channel conv path is ~30x
    slower. KB_CONV_KERNEL=xla opts out.
    """
    import os

    if jax.default_backend() == "tpu" and os.environ.get("KB_CONV_KERNEL", "pallas") == "pallas":
        from kbmod_tpu.ops.conv_pallas import psi_phi_conv_pallas

        return psi_phi_conv_pallas(sci, var, psf)

    valid = jnp.isfinite(sci) & jnp.isfinite(var) & (var > 0.0)
    psi_raw = jnp.where(valid, sci / var, jnp.nan)
    phi_raw = jnp.where(valid, 1.0 / var, jnp.nan)
    psi = convolve_masked_batch(psi_raw, psf, scale_by_masked=True)
    phi = convolve_masked_batch(phi_raw, psf * psf, scale_by_masked=True)
    return psi, phi


def generate_psi_phi_images(sci, var, psf):
    """Generate the psi and phi images for a single time step.

    Parameters
    ----------
    sci, var : array (H, W)
        Science and variance pixels (NaN = masked).
    psf : array or PSF
        The PSF kernel.

    Returns
    -------
    (psi, phi) : numpy arrays (H, W), NaN at masked pixels.
    """
    kernel = getattr(psf, "kernel", psf)
    psi, phi = _psi_phi_from_sci_var(
        jnp.asarray(np.asanyarray(sci)[None], dtype=jnp.float32),
        jnp.asarray(np.asanyarray(var)[None], dtype=jnp.float32),
        jnp.asarray(kernel, dtype=jnp.float32),
    )
    return np.asarray(psi[0]), np.asarray(phi[0])


def _psf_conv_groups(sci, psfs):
    """Group image indices by identical PSF kernel, with a streaming batch
    size bounding the per-dispatch device footprint: sci/var in + psi/phi
    out is 4 float planes per image, so a whole 100-image 4k x 4k group
    would put ~27 GB on one chip. KB_CONV_BATCH_BYTES overrides the ~2 GiB
    default budget. Returns (groups: {key: [indices]}, kernels, batch)."""
    import os

    kernels = [np.asanyarray(getattr(p, "kernel", p), dtype=np.float32) for p in psfs]
    groups = {}
    for i, k in enumerate(kernels):
        groups.setdefault((k.shape, k.tobytes()), []).append(i)
    h, w = np.asanyarray(sci[0]).shape
    budget = float(os.environ.get("KB_CONV_BATCH_BYTES", 2 * 2**30))
    batch = max(1, int(budget // (4 * h * w * 4)))
    return groups, kernels, batch


def generate_all_psi_phi_images(sci, var, psfs):
    """Generate psi/phi image lists for corresponding lists of inputs.

    Groups images that share a PSF shape so the convolution stays batched on
    device (the common case: one PSF per stack or few distinct sizes).
    """
    num = len(sci)
    psi_out = [None] * num
    phi_out = [None] * num
    groups, kernels, batch = _psf_conv_groups(sci, psfs)

    for (_, _), idxs in groups.items():
        k = kernels[idxs[0]]
        for lo in range(0, len(idxs), batch):
            chunk = idxs[lo : lo + batch]
            sci_b = jnp.asarray(np.stack([np.asanyarray(sci[i]) for i in chunk]), dtype=jnp.float32)
            var_b = jnp.asarray(np.stack([np.asanyarray(var[i]) for i in chunk]), dtype=jnp.float32)
            psi_b, phi_b = _psi_phi_from_sci_var(sci_b, var_b, jnp.asarray(k))
            psi_b = np.asarray(psi_b)
            phi_b = np.asarray(phi_b)
            for j, i in enumerate(chunk):
                psi_out[i] = psi_b[j]
                phi_out[i] = phi_b[j]
    return psi_out, phi_out


def generate_psi_phi_from_image_stack(stack):
    """Generate psi/phi lists from an ImageStackPy."""
    return generate_all_psi_phi_images(stack.sci, stack.var, stack.psfs)


# ----------------------------------------------------------------------
# Streaming device-side quantized build
# ----------------------------------------------------------------------

@jax.jit
def _chunk_minmax(sci_b, var_b, kernel):
    """Finite min/max of a chunk's psi/phi without leaving the device."""
    psi_b, phi_b = _psi_phi_from_sci_var(sci_b, var_b, kernel)

    def mm(a):
        ok = jnp.isfinite(a)
        return (
            jnp.min(jnp.where(ok, a, jnp.inf)),
            jnp.max(jnp.where(ok, a, -jnp.inf)),
        )

    pmn, pmx = mm(psi_b)
    fmn, fmx = mm(phi_b)
    return pmn, pmx, fmn, fmx


def _encode_chunk(a, params, dtype):
    """Device mirror of :func:`_encode_array` (psi_phi_array_ds.h:40-42)."""
    mn, mx, scale = params[0], params[1], params[2]
    safe_max = mx - scale / 100.0
    ok = jnp.isfinite(a)
    clamped = jnp.clip(jnp.where(ok, a, mn), mn, safe_max)
    codes = jnp.floor((clamped - mn) / scale + 1.0)
    return jnp.where(ok, codes, 0.0).astype(dtype)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("nbits",), donate_argnums=(0, 1))
def _chunk_encode_scatter(psi_acc, phi_acc, sci_b, var_b, kernel, idxs, psi_params, phi_params, nbits):
    """conv + encode one chunk and scatter it into the (T, H, W) code
    accumulators, all fused in one dispatch. Donation keeps the update
    in-place; ``idxs`` may repeat (tail padding) — duplicates write
    identical values, so the scatter stays deterministic."""
    psi_b, phi_b = _psi_phi_from_sci_var(sci_b, var_b, kernel)
    dtype = jnp.uint8 if nbits == 8 else jnp.uint16
    psi_acc = psi_acc.at[idxs].set(_encode_chunk(psi_b, psi_params, dtype))
    phi_acc = phi_acc.at[idxs].set(_encode_chunk(phi_b, phi_params, dtype))
    return psi_acc, phi_acc


def fill_psi_phi_array_streaming(result, num_bytes, sci, var, psfs, zeroed_times):
    """Quantized build that never materializes float psi/phi on the host.

    The legacy path (generate_all_psi_phi_images + fill_psi_phi_array)
    fetches the full (T, H, W) float psi/phi to the host, runs five
    full-size numpy passes (stack, finite-scan, clip, floor, cast), and
    re-uploads the codes — at survey scale (100 x 4k x 4k) that is ~13 GB
    down + ~3 GB up through the device tunnel plus minutes of single-core
    numpy. Here both passes stay on device:

      pass 1  conv each sci/var chunk, reduce finite min/max (4 scalars
              per chunk cross the tunnel, nothing else);
      pass 2  conv again, encode with the global params, scatter into
              donated (T, H, W) uint8/uint16 accumulators.

    The conv runs twice, but on-device conv is orders of magnitude cheaper
    than the tunnel round-trip it replaces. Tail chunks are padded by
    REPEATING the last (index, image) pair so every dispatch shares one
    compiled shape; duplicate scatter indices write identical values.
    Codes match :func:`fill_psi_phi_array` up to conv fusion differences
    (+-1 ulp at a code boundary; the suite pins exact equality on the XLA
    conv path where both routes share one conv computation).
    """
    num_times = len(sci)
    if num_times == 0:
        raise RuntimeError("No images to fill PsiPhiArray.")
    height, width = np.asanyarray(sci[0]).shape
    dtype = np.uint8 if num_bytes == 1 else np.uint16
    nbits = 8 * dtype().itemsize

    groups, kernels, batch = _psf_conv_groups(sci, psfs)

    def chunks():
        for (_, _), idxs in groups.items():
            k = jnp.asarray(kernels[idxs[0]])
            for lo in range(0, len(idxs), batch):
                chunk = idxs[lo : lo + batch]
                pad = 0
                if lo and len(chunk) < batch:
                    pad = batch - len(chunk)
                    chunk = chunk + [chunk[-1]] * pad
                sci_b = jnp.asarray(
                    np.stack([np.asanyarray(sci[i]) for i in chunk]), dtype=jnp.float32
                )
                var_b = jnp.asarray(
                    np.stack([np.asanyarray(var[i]) for i in chunk]), dtype=jnp.float32
                )
                yield k, chunk, sci_b, var_b

    # Pass 1: global finite min/max (psi_phi_array.cpp:219-245 semantics).
    # Fetches are deferred to the end so chunk uploads overlap the conv of
    # the previous chunk instead of serializing on a per-chunk sync.
    mms = [_chunk_minmax(sci_b, var_b, k) for k, _, sci_b, var_b in chunks()]
    psi_min = min(float(m[0]) for m in mms)
    psi_max = max(float(m[1]) for m in mms)
    phi_min = min(float(m[2]) for m in mms)
    phi_max = max(float(m[3]) for m in mms)

    def scale_of(mn, mx):
        w = mx - mn
        return max(w, 1e-6) / float((1 << nbits) - 1)

    psi_params = np.array([psi_min, psi_max, scale_of(psi_min, psi_max)], np.float32)
    phi_params = np.array([phi_min, phi_max, scale_of(phi_min, phi_max)], np.float32)

    # Pass 2: encode + scatter into donated device accumulators.
    psi_acc = jnp.zeros((num_times, height, width), dtype)
    phi_acc = jnp.zeros((num_times, height, width), dtype)
    psi_params_j = jnp.asarray(psi_params)
    phi_params_j = jnp.asarray(phi_params)
    for k, chunk, sci_b, var_b in chunks():
        psi_acc, phi_acc = _chunk_encode_scatter(
            psi_acc, phi_acc, sci_b, var_b, k,
            jnp.asarray(np.asarray(chunk, np.int32)), psi_params_j, phi_params_j, nbits,
        )

    meta = result.meta
    meta.num_bytes = num_bytes
    meta.block_size = num_bytes
    meta.num_times = num_times
    meta.height = height
    meta.width = width
    meta.pixels_per_image = height * width
    meta.num_entries = 2 * meta.pixels_per_image * num_times
    meta.total_array_size = meta.block_size * meta.num_entries
    meta.psi_min_val, meta.psi_max_val, meta.psi_scale = (
        psi_min, psi_max, scale_of(psi_min, psi_max),
    )
    meta.phi_min_val, meta.phi_max_val, meta.phi_scale = (
        phi_min, phi_max, scale_of(phi_min, phi_max),
    )
    result.psi = psi_acc
    result.phi = phi_acc
    result.valid = None
    result.times = np.asarray(zeroed_times, dtype=float)
    return result


# ----------------------------------------------------------------------
# Quantization helpers (parity with psi_phi_array_ds.h:40-47)
# ----------------------------------------------------------------------

def compute_scale_params_from_image_vect(imgs, num_bytes):
    """Global (min, max, scale) over the finite values of a list of images.

    Mirrors psi_phi_array.cpp:219-245."""
    min_val = np.inf
    max_val = -np.inf
    for img in imgs:
        finite = np.asanyarray(img)[np.isfinite(img)]
        if finite.size:
            min_val = min(min_val, float(finite.min()))
            max_val = max(max_val, float(finite.max()))
    scale = 1.0
    if num_bytes == 1 or num_bytes == 2:
        width = max_val - min_val
        if width < 1e-6:
            width = 1e-6
        num_values = (1 << (8 * num_bytes)) - 1
        scale = width / float(num_values)
    return [min_val, max_val, scale]


def encode_uint_scalar(value, min_val, max_val, scale):
    """Encode one float as the reference does (psi_phi_array_ds.h:40-42):
    invalid -> 0; valid -> (clamp(value) - min) / scale + 1."""
    if not np.isfinite(value):
        return 0.0
    return (min(max(value, min_val), max_val) - min_val) / scale + 1.0


def decode_uint_scalar(value, min_val, scale):
    """Decode one encoded value (psi_phi_array_ds.h:44-46)."""
    if value == 0.0:
        return float("nan")
    return (value - 1.0) * scale + min_val


def _encode_array(imgs, min_val, max_val, scale, dtype):
    """Vectorized encode of a (T, H, W) float stack to uint codes."""
    arr = np.asarray(imgs, dtype=np.float32)
    # Safe max slightly below true max to avoid rollover (psi_phi_array.cpp:264).
    safe_max = max_val - scale / 100.0
    valid = np.isfinite(arr)
    clamped = np.clip(np.where(valid, arr, min_val), min_val, safe_max)
    codes = np.floor(((clamped - min_val) / scale + 1.0)).astype(dtype)
    codes[~valid] = 0
    return codes


# ----------------------------------------------------------------------
# PsiPhiArray
# ----------------------------------------------------------------------

class PsiPhi:
    """Named (psi, phi) value pair (psi_phi_array_ds.h:33-38)."""

    __slots__ = ("psi", "phi")

    def __init__(self, psi=0.0, phi=0.0):
        self.psi = psi
        self.phi = phi

    def __iter__(self):
        return iter((self.psi, self.phi))

    def __repr__(self):
        return f"PsiPhi(psi={self.psi}, phi={self.phi})"


class PsiPhiArrayMeta:
    """Metadata mirror of the reference's PsiPhiArrayMeta
    (psi_phi_array_ds.h:49-67)."""

    def __init__(self):
        self.num_times = 0
        self.width = 0
        self.height = 0
        self.pixels_per_image = 0
        self.num_entries = 0
        self.block_size = 0
        self.total_array_size = 0
        self.num_bytes = 4
        self.psi_min_val = np.inf
        self.psi_max_val = -np.inf
        self.psi_scale = 1.0
        self.phi_min_val = np.inf
        self.phi_max_val = -np.inf
        self.phi_scale = 1.0


class PsiPhiArray:
    """The packed psi/phi data for the search.

    Attributes
    ----------
    psi, phi : device arrays (T, H, W)
        float32 (0 at masked pixels) or uint8/uint16 codes (0 = masked).
    valid : device array (T, H, W) uint8 or None
        Validity plane for the float path (None for quantized: code 0 is
        the validity signal there).
    times : np.ndarray (T,)
        Zero-shifted times.
    """

    def __init__(self):
        self.meta = PsiPhiArrayMeta()
        self.psi = None
        self.phi = None
        self.valid = None
        self.times = np.array([])
        self._on_device = False
        self._packed = None  # (words_r, pad_rows) cache for the Pallas path

    def packed_words(self, min_row_guard=None, min_col_slack=None):
        """The interleaved int32 word stream for the encoded Pallas kernel
        (built once with bounded memory, then cached — survey-scale stacks
        are too large for the in-wrapper packing). Quantized arrays only.

        ``min_row_guard``/``min_col_slack`` size the stream's zero guards
        for a search's actual trajectory reach (rows / words): the
        mask-free kernel variants (~20% faster at survey scale) engage
        only when every read lands on guard zeros, and the default 256s
        are too small for e.g. the 12-day default grid's ~790 px column
        reach. A cached stream whose guards already cover the request is
        reused; a larger request re-packs once. Explicit KB_PACK_GUARD /
        KB_PACK_COLSLACK env settings win over the request."""
        import os

        if self.meta.num_bytes not in (1, 2):
            raise RuntimeError("packed_words requires a uint8/uint16 quantized array.")
        from kbmod_tpu.ops.search_pallas import (
            PackGeom,
            canonical_pack_guards,
            pack_psi_phi_words,
        )

        # Request-driven guards are bucketed onto the canonical lattice so
        # every search over this stack with a similar reach shares ONE
        # stream shape — and therefore one persistent-cache executable
        # (canonical_pack_guards).
        want_guard = want_slack = None
        if min_row_guard is not None or min_col_slack is not None:
            rg, cs = canonical_pack_guards(min_row_guard or 0, min_col_slack or 0)
            if os.environ.get("KB_PACK_GUARD") is None and min_row_guard is not None:
                want_guard = rg
            if os.environ.get("KB_PACK_COLSLACK") is None and min_col_slack is not None:
                want_slack = cs
        if self._packed is not None and (want_guard or want_slack):
            geom = self._packed[1]
            if isinstance(geom, PackGeom) and (
                (want_guard or 0) > geom.row_guard
                or (want_slack or 0) > geom.col_slack
            ):
                self._packed = None  # guards too small for this search
        if self._packed is None:
            self._packed = pack_psi_phi_words(
                self.psi, self.phi,
                row_guard=want_guard, col_slack=want_slack,
            )
        return self._packed

    # --- reference-compatible metadata accessors ---
    @property
    def on_gpu(self):
        return self._on_device

    def get_meta_data(self):
        return self.meta

    def get_num_times(self):
        return self.meta.num_times

    def get_width(self):
        return self.meta.width

    def get_height(self):
        return self.meta.height

    def get_num_bytes(self):
        return self.meta.num_bytes

    def get_psi_min_val(self):
        return self.meta.psi_min_val

    def get_psi_max_val(self):
        return self.meta.psi_max_val

    def get_psi_scale(self):
        return self.meta.psi_scale

    def get_phi_min_val(self):
        return self.meta.phi_min_val

    def get_phi_max_val(self):
        return self.meta.phi_max_val

    def get_phi_scale(self):
        return self.meta.phi_scale

    def read_time(self, index):
        if index < 0 or index >= self.meta.num_times:
            raise RuntimeError(f"Out of bounds read for time step. [{index}]")
        return float(self.times[index])

    def set_time_array(self, times):
        self.times = np.asarray(times, dtype=float)

    def clear(self):
        self.psi = None
        self.phi = None
        self.valid = None
        self.meta = PsiPhiArrayMeta()
        self.times = np.array([])
        self._on_device = False
        self._packed = None

    def move_to_gpu(self):
        """Ensure the arrays live on the default device (no-op if already)."""
        if self.psi is not None:
            self.psi = jnp.asarray(self.psi)
            self.phi = jnp.asarray(self.phi)
            if self.valid is not None:
                self.valid = jnp.asarray(self.valid)
            self._on_device = True

    def clear_from_gpu(self):
        self._on_device = False

    # --- decode for host reads ---

    def decoded_psi_phi(self):
        """Return (psi, phi) as float device arrays with 0 at masked pixels,
        plus a float validity plane. Used by the search kernels."""
        if self.meta.num_bytes == 4:
            valid = self.valid
            return self.psi, self.phi, valid
        # Quantized: decode lazily on device.
        psi_codes = jnp.asarray(self.psi)
        phi_codes = jnp.asarray(self.phi)
        valid = (psi_codes != 0).astype(jnp.uint8)
        psi = jnp.where(
            psi_codes == 0, 0.0, (psi_codes.astype(jnp.float32) - 1.0) * self.meta.psi_scale + self.meta.psi_min_val
        )
        phi = jnp.where(
            phi_codes == 0, 0.0, (phi_codes.astype(jnp.float32) - 1.0) * self.meta.phi_scale + self.meta.phi_min_val
        )
        return psi, phi, valid

    def read_psi_phi(self, time, row, col):
        """Read a single (psi, phi) value pair; out-of-bounds or masked reads
        return NaN. Mirrors psi_phi_array.cpp:172-205."""
        if (
            self.psi is None
            or row < 0
            or col < 0
            or row >= self.meta.height
            or col >= self.meta.width
            or time >= self.meta.num_times
        ):
            return PsiPhi(float("nan"), float("nan"))
        if self.meta.num_bytes == 4:
            if self.valid is not None and not bool(np.asarray(self.valid[time, row, col])):
                return PsiPhi(float("nan"), float("nan"))
            return PsiPhi(
                float(np.asarray(self.psi[time, row, col])), float(np.asarray(self.phi[time, row, col]))
            )
        psi_code = float(np.asarray(self.psi[time, row, col]))
        phi_code = float(np.asarray(self.phi[time, row, col]))
        return PsiPhi(
            decode_uint_scalar(psi_code, self.meta.psi_min_val, self.meta.psi_scale),
            decode_uint_scalar(phi_code, self.meta.phi_min_val, self.meta.phi_scale),
        )


def fill_psi_phi_array(result, num_bytes, psi_imgs, phi_imgs, zeroed_times):
    """Pack lists of psi/phi images into a PsiPhiArray, quantizing when
    requested. Mirrors psi_phi_array.cpp:321-372."""
    num_times = len(psi_imgs)
    if num_times == 0:
        raise RuntimeError("No images to fill PsiPhiArray.")
    height, width = np.asanyarray(psi_imgs[0]).shape

    meta = result.meta
    meta.num_bytes = num_bytes if num_bytes in (1, 2) else 4
    meta.block_size = {1: 1, 2: 2, 4: 4}[meta.num_bytes]
    meta.num_times = num_times
    meta.height = height
    meta.width = width
    meta.pixels_per_image = height * width
    meta.num_entries = 2 * meta.pixels_per_image * num_times
    meta.total_array_size = meta.block_size * meta.num_entries

    psi_stack = np.stack([np.asanyarray(p, dtype=np.float32) for p in psi_imgs])
    phi_stack = np.stack([np.asanyarray(p, dtype=np.float32) for p in phi_imgs])

    if meta.num_bytes in (1, 2):
        dtype = np.uint8 if meta.num_bytes == 1 else np.uint16
        psi_params = compute_scale_params_from_image_vect(psi_imgs, meta.num_bytes)
        phi_params = compute_scale_params_from_image_vect(phi_imgs, meta.num_bytes)
        meta.psi_min_val, meta.psi_max_val, meta.psi_scale = psi_params
        meta.phi_min_val, meta.phi_max_val, meta.phi_scale = phi_params
        result.psi = jnp.asarray(_encode_array(psi_stack, *psi_params, dtype))
        result.phi = jnp.asarray(_encode_array(phi_stack, *phi_params, dtype))
        result.valid = None
    else:
        valid = (np.isfinite(psi_stack) & np.isfinite(phi_stack)).astype(np.uint8)
        result.psi = jnp.asarray(np.where(valid, psi_stack, 0.0).astype(np.float32))
        result.phi = jnp.asarray(np.where(valid, phi_stack, 0.0).astype(np.float32))
        result.valid = jnp.asarray(valid)

    result.times = np.asarray(zeroed_times, dtype=float)
    # Matches the reference lifecycle (psi_phi_array.cpp:49-111): building
    # the array does not put it "on GPU"; an explicit move_to_gpu (or the
    # search itself) does. The jnp arrays may already be device-backed —
    # the flag tracks the reference's preload contract, not placement.
    result._on_device = False
    return result


def fill_psi_phi_array_from_image_arrays(result, num_bytes, sci, var, psfs, zeroed_times):
    """Generate psi/phi from sci/var/psf and pack them.

    Mirrors psi_phi_array.cpp:374-410. Quantized builds stream on device
    (:func:`fill_psi_phi_array_streaming`) unless KB_DEVICE_ENCODE=0."""
    import os

    if num_bytes in (1, 2) and os.environ.get("KB_DEVICE_ENCODE", "1") != "0":
        return fill_psi_phi_array_streaming(result, num_bytes, sci, var, psfs, zeroed_times)
    psi_imgs, phi_imgs = generate_all_psi_phi_images(sci, var, psfs)
    return fill_psi_phi_array(result, num_bytes, psi_imgs, phi_imgs, zeroed_times)
