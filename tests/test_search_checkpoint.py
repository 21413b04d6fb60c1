"""Per-tile checkpoint/resume of the core search: tiled output must equal
the un-tiled search exactly, resume must reuse finished tiles, and a stale
checkpoint dir must be discarded."""

import os

import numpy as np
import pytest

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.ops.psi_phi import generate_psi_phi_from_image_stack
from kbmod_tpu.ops.search import core_search
from kbmod_tpu.search import StackSearch, Trajectory
from kbmod_tpu.search.checkpoint import checkpointed_core_search


@pytest.fixture(scope="module")
def setup():
    times = create_fake_times(6, t0=57130.0, obs_per_day=3)
    ds = FakeDataSet(48, 56, times, use_seed=21)
    ds.insert_object(Trajectory(x=20, y=30, vx=4.0, vy=-2.0, flux=350.0))
    stack = ds.stack_py
    psi, phi = generate_psi_phi_from_image_stack(stack)
    valid = np.isfinite(np.asarray(stack.sci)) & np.isfinite(np.asarray(stack.var))
    vxs = np.linspace(2.0, 6.0, 4).astype(np.float32)
    vys = np.linspace(-4.0, 0.0, 4).astype(np.float32)
    vxg, vyg = np.meshgrid(vxs, vys)
    return (
        np.asarray(psi), np.asarray(phi), valid.astype(np.float32),
        np.asarray(stack.zeroed_times, dtype=np.float32),
        vxg.ravel(), vyg.ravel(), stack,
    )


class TestCheckpointedSearch:
    def test_matches_untiled(self, setup, tmp_path):
        psi, phi, valid, times, vxs, vys, _ = setup
        kwargs = dict(min_obs=3, min_lh=0.0, gate_min_obs=True)
        ref = core_search(psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 3, **kwargs)
        out = checkpointed_core_search(
            psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 3,
            checkpoint_dir=str(tmp_path / "ck"), tile_rows=13, **kwargs,
        )
        for key in ref:
            np.testing.assert_array_equal(out[key], ref[key], err_msg=key)
        # Tiles were written: ceil(48/13) = 4 files.
        files = [f for f in os.listdir(tmp_path / "ck") if f.startswith("tile_")]
        assert len(files) == 4

    def test_resume_uses_tiles(self, setup, tmp_path, monkeypatch):
        psi, phi, valid, times, vxs, vys, _ = setup
        ck = str(tmp_path / "ck2")
        args = (psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 2)
        first = checkpointed_core_search(*args, checkpoint_dir=ck, tile_rows=16)
        # Second run must not call core_search at all.
        import kbmod_tpu.search.checkpoint as ckmod

        def boom(*a, **k):
            raise AssertionError("core_search called on full resume")

        monkeypatch.setattr(ckmod.search_ops, "core_search", boom)
        second = checkpointed_core_search(*args, checkpoint_dir=ck, tile_rows=16)
        for key in first:
            np.testing.assert_array_equal(second[key], first[key])

    def test_partial_resume(self, setup, tmp_path):
        psi, phi, valid, times, vxs, vys, _ = setup
        ck = str(tmp_path / "ck3")
        args = (psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 2)
        full = checkpointed_core_search(*args, checkpoint_dir=ck, tile_rows=16)
        # Simulate a crash that lost one tile: it is recomputed, others reused.
        os.remove(os.path.join(ck, "tile_16_32.npz"))
        again = checkpointed_core_search(*args, checkpoint_dir=ck, tile_rows=16)
        for key in full:
            np.testing.assert_array_equal(again[key], full[key])

    def test_stale_checkpoint_discarded(self, setup, tmp_path):
        psi, phi, valid, times, vxs, vys, _ = setup
        ck = str(tmp_path / "ck4")
        args = (psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 2)
        checkpointed_core_search(*args, checkpoint_dir=ck, tile_rows=16)
        # Different candidate set -> fingerprint mismatch -> fresh search.
        out = checkpointed_core_search(
            psi, phi, valid, times, vxs[:5], vys[:5], 0, 56, 0, 48, 2,
            checkpoint_dir=ck, tile_rows=16,
        )
        ref = core_search(psi, phi, valid, times, vxs[:5], vys[:5], 0, 56, 0, 48, 2)
        for key in ref:
            np.testing.assert_array_equal(out[key], ref[key])

    def test_cleanup(self, setup, tmp_path):
        psi, phi, valid, times, vxs, vys, _ = setup
        ck = str(tmp_path / "ck5")
        checkpointed_core_search(
            psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 2,
            checkpoint_dir=ck, tile_rows=24, cleanup=True,
        )
        assert os.listdir(ck) == []

    def test_stack_search_integration(self, setup, tmp_path):
        _, _, _, _, vxs, vys, stack = setup
        cands = [Trajectory(vx=vx, vy=vy) for vx, vy in zip(vxs, vys)]

        def run(ck=None):
            s = StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times, -1)
            s.set_min_obs(3)
            if ck:
                s.enable_search_checkpointing(ck, tile_rows=16)
            s.search_all(cands, True)
            return s.results.get_arrays()

        plain = run()
        ck = str(tmp_path / "ck6")
        tiled = run(ck)
        resumed = run(ck)  # all tiles on disk
        for key in plain:
            np.testing.assert_array_equal(tiled[key], plain[key], err_msg=key)
            np.testing.assert_array_equal(resumed[key], plain[key], err_msg=key)


class TestFingerprintCoverage:
    def test_phi_only_change_rejects_checkpoint(self, setup, tmp_path):
        """A stack whose phi changed (same psi sample) must NOT resume from
        stale tiles (round-1 advisor finding)."""
        psi, phi, valid, times, vxs, vys, _ = setup
        ck = str(tmp_path / "ck_phi")
        checkpointed_core_search(
            psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 2,
            checkpoint_dir=ck, tile_rows=16,
        )
        phi2 = np.asarray(phi) * 1.7
        out = checkpointed_core_search(
            psi, phi2, valid, times, vxs, vys, 0, 56, 0, 48, 2,
            checkpoint_dir=ck, tile_rows=16,
        )
        ref = core_search(psi, phi2, valid, times, vxs, vys, 0, 56, 0, 48, 2)
        for key in ref:
            np.testing.assert_array_equal(out[key], ref[key])

    def test_valid_only_change_rejects_checkpoint(self, setup, tmp_path):
        psi, phi, valid, times, vxs, vys, _ = setup
        ck = str(tmp_path / "ck_valid")
        checkpointed_core_search(
            psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 2,
            checkpoint_dir=ck, tile_rows=16,
        )
        valid2 = np.asarray(valid).copy()
        valid2[:, ::3, ::3] = 0.0
        # psi/phi stay identical; the validity plane itself must trip
        # the fingerprint.
        out = checkpointed_core_search(
            psi, phi, valid2, times, vxs, vys, 0, 56, 0, 48, 2,
            checkpoint_dir=ck, tile_rows=16,
        )
        ref = core_search(psi, phi, valid2, times, vxs, vys, 0, 56, 0, 48, 2)
        for key in ref:
            np.testing.assert_array_equal(out[key], ref[key])

    def test_callable_kwargs_fingerprint(self, setup, tmp_path):
        """Callable kwargs (the survey path passes packed_provider=lambda)
        must not crash the fingerprint, and the checkpoint must still be
        reusable across runs that pass an equivalent callable."""
        from kbmod_tpu.search.checkpoint import _fingerprint

        psi, phi, valid, times, vxs, vys, _ = setup
        bounds = (0, 56, 0, 48)
        fp1 = _fingerprint(
            psi, phi, valid, times, vxs, vys, bounds, 2,
            {"packed_provider": lambda: None, "min_obs": 3},
        )
        fp2 = _fingerprint(
            psi, phi, valid, times, vxs, vys, bounds, 2,
            {"packed_provider": lambda: "different body", "min_obs": 3},
        )
        assert fp1 == fp2  # callables hash by presence, not identity

        def tile_search(psi_, phi_, valid_, times_, vxs_, vys_, x0, x1, y0, y1, rpp, **kw):
            kw.pop("packed_provider")
            return core_search(psi_, phi_, valid_, times_, vxs_, vys_, x0, x1, y0, y1, rpp, **kw)

        ck = str(tmp_path / "ck_callable")
        out = checkpointed_core_search(
            psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 2,
            checkpoint_dir=ck, tile_rows=16, search_fn=tile_search,
            packed_provider=lambda: None,
        )
        ref = core_search(psi, phi, valid, times, vxs, vys, 0, 56, 0, 48, 2)
        for key in ref:
            np.testing.assert_array_equal(out[key], ref[key])

    def test_sharded_stack_search_checkpointing(self, setup, tmp_path, monkeypatch):
        """Checkpointing composes with the mesh-sharded search path."""
        monkeypatch.setenv("KB_SHARDED", "1")
        _, _, _, _, vxs, vys, stack = setup
        cands = [Trajectory(vx=vx, vy=vy) for vx, vy in zip(vxs, vys)]

        def run(ck=None):
            s = StackSearch(stack.sci, stack.var, stack.psfs, stack.zeroed_times, -1)
            s.set_min_obs(3)
            if ck:
                s.enable_search_checkpointing(ck, tile_rows=16)
            s.search_all(cands, True)
            return s.results.get_arrays()

        plain = run()
        ck = str(tmp_path / "ck_sharded")
        tiled = run(ck)
        assert any(n.startswith("tile_") for n in os.listdir(ck))
        resumed = run(ck)
        for key in plain:
            np.testing.assert_array_equal(tiled[key], plain[key], err_msg=key)
            np.testing.assert_array_equal(resumed[key], plain[key], err_msg=key)
