"""Offset-class candidate dedup: distinct (vx, vy) rounding to identical
pixel-offset sequences are searched once and the top-K maps expanded back to
original candidate indices (search_pallas._dedup_plan/_expand_topk_classes).
Must be bit-exact vs the undeduped dispatcher, including exact-lh ties
(reference scores every duplicate: kernels.cu:252-332)."""

import numpy as np
import jax.numpy as jnp
import pytest

from kbmod_tpu.ops.search import trajectory_offsets
from kbmod_tpu.ops.search_pallas import (
    _dedup_plan,
    _expand_topk_classes,
    pack_psi_phi_words,
    search_topk_pallas_packed,
)

EM = np.array([-6.0, 12.0 / 254, 0.1, 4.0 / 254], dtype=np.float32)


def _stack(rng, T, H, W):
    psi = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
    phi = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
    return psi, phi


def _dup_grid(rng, n_base, T, reps=3):
    """A grid with exact-duplicate offset classes: repeated velocities plus
    tiny perturbations that round to the same integer offsets."""
    base_vx = rng.uniform(-6, 6, n_base).astype(np.float32)
    base_vy = rng.uniform(-6, 6, n_base).astype(np.float32)
    vxs = np.repeat(base_vx, reps) + rng.uniform(-1e-4, 1e-4, n_base * reps).astype(np.float32)
    vys = np.repeat(base_vy, reps) + rng.uniform(-1e-4, 1e-4, n_base * reps).astype(np.float32)
    # Shuffle so classes interleave (first-occurrence ordering is exercised).
    perm = rng.permutation(n_base * reps)
    return trajectory_offsets(vxs[perm], vys[perm], np.arange(T) * 0.4)


def _dispatch(words_r, pad_rows, shape, dxs, dys, monkeypatch, dedup, **kw):
    monkeypatch.setenv("KB_DEDUP_CANDIDATES", "1" if dedup else "0")
    monkeypatch.setenv("KB_DEDUP_MIN_FACTOR", "1.01")
    lh, idx = search_topk_pallas_packed(
        words_r, np.asarray(dxs, np.int32), np.asarray(dys, np.int32),
        jnp.float32(2), jnp.float32(0), jnp.asarray(EM),
        shape=shape, pad_rows=pad_rows, bits=8, interpret=True, **kw,
    )
    return np.asarray(lh), np.asarray(idx)


class TestDedupPlan:
    def test_plan_structure(self):
        rng = np.random.default_rng(11)
        dxs, dys = _dup_grid(rng, 9, T=5, reps=3)
        plan = _dedup_plan(np.asarray(dxs, np.int32), np.asarray(dys, np.int32), 1.1)
        assert plan is not None
        u_dxs, u_dys, members, counts = plan
        C = dxs.shape[0]
        n = u_dxs.shape[0]
        assert n < C and counts.sum() == C
        # Every member row holds that class's candidate indices ascending,
        # -1 padded, and its representative offsets match all members.
        dd = np.concatenate([np.asarray(dxs, np.int32), np.asarray(dys, np.int32)], axis=1)
        udd = np.concatenate([u_dxs, u_dys], axis=1)
        mins = []
        for c in range(n):
            m = members[c][members[c] >= 0]
            assert len(m) == counts[c] and (np.diff(m) > 0).all()
            np.testing.assert_array_equal(dd[m], np.broadcast_to(udd[c], (len(m), dd.shape[1])))
            mins.append(m[0])
        # First-occurrence ordering: class index order == min-member order.
        assert (np.diff(mins) > 0).all()

    def test_none_when_unique(self):
        rng = np.random.default_rng(12)
        vxs = rng.uniform(-6, 6, 30).astype(np.float32)
        vys = rng.uniform(-6, 6, 30).astype(np.float32)
        dxs, dys = trajectory_offsets(vxs, vys, np.arange(6) * 0.7)
        dd = np.concatenate([np.asarray(dxs), np.asarray(dys)], axis=1)
        if len(np.unique(dd, axis=0)) == 30:
            assert _dedup_plan(np.asarray(dxs, np.int32), np.asarray(dys, np.int32), 1.01) is None
        # Below the engagement factor: duplicates exist but too few to pay off.
        dxs2 = np.asarray(dxs, np.int32).copy()
        dys2 = np.asarray(dys, np.int32).copy()
        dxs2[1], dys2[1] = dxs2[0], dys2[0]
        assert _dedup_plan(dxs2, dys2, 1.5) is None


class TestDedupDispatcher:
    def test_bit_exact_vs_undeduped(self, monkeypatch):
        rng = np.random.default_rng(13)
        T, H, W = 6, 40, 52
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        dxs, dys = _dup_grid(rng, 12, T, reps=3)
        kw = dict(x_min=0, x_max=W, y_min=0, y_max=H, k_results=4)
        ref = _dispatch(words_r, pad_rows, (T, H, W), dxs, dys, monkeypatch, False, **kw)
        got = _dispatch(words_r, pad_rows, (T, H, W), dxs, dys, monkeypatch, True, **kw)
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_array_equal(ref[1], got[1])

    def test_bit_exact_in_window_with_k_past_classes(self, monkeypatch):
        # K larger than the duplicate multiplicity AND larger than some
        # pixels' surviving candidate count: empties expand as empties.
        rng = np.random.default_rng(14)
        T, H, W = 5, 32, 44
        psi_c, phi_c = _stack(rng, T, H, W)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        dxs, dys = _dup_grid(rng, 4, T, reps=2)
        kw = dict(x_min=3, x_max=37, y_min=5, y_max=29, k_results=6)
        ref = _dispatch(words_r, pad_rows, (T, H, W), dxs, dys, monkeypatch, False, **kw)
        got = _dispatch(words_r, pad_rows, (T, H, W), dxs, dys, monkeypatch, True, **kw)
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_array_equal(ref[1], got[1])

    def test_all_tied_degenerate(self, monkeypatch):
        # Constant images: EVERY candidate ties in lh. The first-occurrence
        # class ordering + final (lh desc, idx asc) sort must reproduce the
        # per-candidate kernels' arrival-order top-K exactly.
        rng = np.random.default_rng(15)
        T, H, W = 5, 24, 36
        psi_c = np.full((T, H, W), 128, dtype=np.uint8)
        phi_c = np.full((T, H, W), 128, dtype=np.uint8)
        words_r, pad_rows = pack_psi_phi_words(psi_c, phi_c)
        dxs, dys = _dup_grid(rng, 6, T, reps=3)
        kw = dict(x_min=8, x_max=28, y_min=8, y_max=16, k_results=5)
        ref = _dispatch(words_r, pad_rows, (T, H, W), dxs, dys, monkeypatch, False, **kw)
        got = _dispatch(words_r, pad_rows, (T, H, W), dxs, dys, monkeypatch, True, **kw)
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_array_equal(ref[1], got[1])

    def test_expand_row_banding(self):
        # The banded expansion concatenates to the same maps as one band.
        rng = np.random.default_rng(16)
        K, SH, SW, n, M = 4, 20, 8, 7, 3
        members = np.full((n, M), -1, np.int32)
        counts = np.zeros(n, np.int32)
        nxt = 0
        for c in range(n):
            counts[c] = rng.integers(1, M + 1)
            members[c, : counts[c]] = np.arange(nxt, nxt + counts[c])
            nxt += counts[c]
        idx = rng.integers(-1, n, (K, SH, SW)).astype(np.int32)
        lh = jnp.asarray(np.where(idx >= 0, rng.normal(5, 1, idx.shape), -np.inf).astype(np.float32))
        idx = jnp.asarray(idx)
        a = _expand_topk_classes(lh, idx, members, row_band=SH)
        b = _expand_topk_classes(lh, idx, members, row_band=6)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
