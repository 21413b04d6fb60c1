"""Row-class snapping (opt-in KB_SNAP_ROW_ERROR): bounded vy quantization
that collapses rounded row sequences into few classes so long-baseline
physical grids can engage the uniform exact-row kernel plan (docs/STATUS.md
"Measured no-go" — this is the lever that sidesteps it)."""

import numpy as np
import pytest

from kbmod_tpu.ops.search import snap_vy_rows, trajectory_offsets


def physical_grid(n_vel=65, n_ang=33):
    """A miniature of the reference's long-baseline default grid."""
    vel = np.linspace(92.0, 526.0, n_vel)
    ang = np.linspace(-np.pi / 15.0, np.pi / 15.0, n_ang)
    vv, aa = np.meshgrid(vel, ang, indexing="ij")
    return (
        (vv * np.cos(aa)).ravel().astype(np.float32),
        (vv * np.sin(aa)).ravel().astype(np.float32),
    )


class TestSnapVyRows:
    def test_row_error_bound(self):
        rng = np.random.default_rng(5)
        vys = rng.uniform(-110, 110, 4096).astype(np.float32)
        times = np.sort(rng.uniform(0.0, 3.0, 24))
        times[0] = 0.0
        for max_err in (0.5, 0.75, 1.5):
            snapped, _ = snap_vy_rows(vys, times, max_err)
            # Row position error at every obs <= max_err (+ float32 slack).
            err = np.abs(snapped[:, None] * times[None, :] - vys[:, None] * times[None, :])
            assert err.max() <= max_err + 1e-3, (max_err, err.max())

    def test_class_collapse(self):
        vxs, vys = physical_grid()
        times = np.linspace(0.0, 3.0, 12)
        _, dys_before = trajectory_offsets(vxs, vys, times)
        before = len(np.unique(dys_before, axis=0))

        snapped, n_classes = snap_vy_rows(vys, times, 0.75)
        _, dys_after = trajectory_offsets(vxs, snapped, times)
        after = len(np.unique(dys_after, axis=0))

        # Identical snapped vy => identical rounded row sequence, so the
        # class count is exactly the number of distinct snapped values,
        # and it collapses hard: span(vy)*t_max/(2*0.75) ~ 440 max.
        assert after == n_classes
        # The mini grid starts at 1359 classes -> 393; the full 33k grid
        # collapses 9253 -> ~440 (factor 21, measured in docs/STATUS.md).
        assert after < before / 3, (before, after)
        assert after <= int(np.ptp(vys) * times[-1] / 1.5) + 2

    def test_degenerate_times(self):
        vys = np.array([1.0, 2.0, 3.0], np.float32)
        snapped, n = snap_vy_rows(vys, np.zeros(4), 0.75)
        np.testing.assert_array_equal(snapped, vys)
        assert n == 3

    def test_search_recovery_with_snapping(self, monkeypatch):
        """With snapping enabled the injected object is still recovered at
        the same pixel, with vy within the snap lattice spacing."""
        import kbmod_tpu.search as kb
        from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
        from kbmod_tpu.trajectory_generator import KBMODV1Search

        times = create_fake_times(12, 57130.2, 4, 0.02, 1)
        # Reference-default PSF width (psf_val=1.4): snapping's <=0.75 px
        # row shift costs little flux at survey PSFs (a 0.5 px PSF would
        # lose ~20% likelihood — sharp-PSF users should lower the budget).
        ds = FakeDataSet(64, 64, times, use_seed=77, psf_val=1.4)
        ds.insert_object(kb.Trajectory(x=12, y=15, vx=14.0, vy=9.0, flux=400.0))
        stack = ds.stack_py
        cands = list(KBMODV1Search(15, 10.0, 20.0, 15, 0.3, 0.9))

        def run():
            s = kb.StackSearch(
                np.asarray(stack.sci), np.asarray(stack.var),
                [np.asarray(p) for p in stack.psfs],
                np.asarray(stack.zeroed_times), -1,
            )
            s.set_min_obs(8)
            s.search_all(cands, True)
            return s.get_results(0, 1)[0]

        plain = run()
        monkeypatch.setenv("KB_SNAP_ROW_ERROR", "0.75")
        snapped = run()

        t_max = float(stack.zeroed_times[-1])
        q = 2 * 0.75 / t_max  # the snap lattice spacing
        assert (snapped.x, snapped.y) == (plain.x, plain.y) == (12, 15)
        # The winning vy is a lattice point within one spacing of the
        # unsnapped winner (the best neighbor may sit on either side).
        assert abs(snapped.vy - plain.vy) <= q + 1e-5
        # Likelihood nearly unchanged at survey PSF widths.
        assert snapped.lh >= 0.95 * plain.lh, (snapped.lh, plain.lh)
