"""Trajectory generator tests (modeled on the reference's
tests/test_trajectory_generator.py)."""

import math

import numpy as np
import pytest

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.trajectory_generator import (
    create_trajectory_generator,
    KBMODV1Search,
    KBMODV1SearchConfig,
    EclipticCenteredSearch,
    PencilSearch,
    RandomVelocitySearch,
    SingleVelocitySearch,
    VelocityGridSearch,
)


class TestGenerators:
    def test_single_velocity(self):
        gen = SingleVelocitySearch(10.0, 5.0)
        trjs = list(gen)
        assert len(trjs) == 1
        assert trjs[0].vx == 10.0
        assert trjs[0].vy == 5.0

    def test_velocity_grid(self):
        gen = VelocityGridSearch(3, 0.0, 2.0, 3, -0.25, 0.25)
        trjs = list(gen)
        assert len(trjs) == 9
        assert np.isclose(trjs[0].vx, 0.0)
        assert np.isclose(trjs[2].vx, 2.0)  # endpoints inclusive
        assert np.isclose(trjs[0].vy, -0.25)
        with pytest.raises(ValueError):
            VelocityGridSearch(1, 0.0, 2.0, 3, -0.25, 0.25)

    def test_kbmodv1(self):
        gen = KBMODV1Search(4, 0.0, 8.0, 3, 0.0, math.pi / 2)
        trjs = list(gen)
        assert len(trjs) == 12
        # Half-open ranges: max vel 8*(3/4)=6, max ang pi/2*(2/3).
        vels = {round(math.hypot(t.vx, t.vy), 6) for t in trjs}
        assert max(vels) <= 6.0 + 1e-6
        with pytest.raises(ValueError):
            KBMODV1Search(0, 0.0, 8.0, 3, 0.0, 1.0)

    def test_kbmodv1_config(self):
        gen = KBMODV1SearchConfig([0.0, 8.0, 4], [0.25, 0.25, 5], average_angle=1.0)
        assert gen.min_ang == 0.75
        assert gen.max_ang == 1.25
        assert len(list(gen)) == 20

    def test_ecliptic_centered(self):
        gen = EclipticCenteredSearch(
            velocities=[0.0, 10.0, 3], angles=[-0.5, 0.5, 3], given_ecliptic=0.0
        )
        trjs = list(gen)
        assert len(trjs) == 9
        vels = sorted({round(math.hypot(t.vx, t.vy), 4) for t in trjs})
        assert vels[-1] == 10.0  # endpoints inclusive

    def test_ecliptic_angle_units(self):
        gen = EclipticCenteredSearch(
            velocities=[5.0, 5.0, 1], angles=[0.0, 0.0, 1], angle_units="degree", given_ecliptic=90.0
        )
        trj = next(iter(gen))
        assert abs(trj.vx) < 1e-6
        assert np.isclose(trj.vy, 5.0)

    def test_pencil(self):
        gen = PencilSearch(10.0, 0.0, max_ang_offset=0.1, ang_step=0.05, max_vel_offset=1.0, vel_step=0.5)
        trjs = list(gen)
        assert len(trjs) == len(gen.ang_array) * len(gen.vel_array)

    def test_random(self):
        gen = RandomVelocitySearch(-5, 5, -5, 5, max_samples=20, seed=3)
        trjs = list(gen)
        assert len(trjs) == 20
        assert all(-5 <= t.vx <= 5 for t in trjs)
        # Exhausted until reset.
        assert len(list(gen)) == 0
        gen.reset_sample_count(5)
        assert len(list(gen)) == 5

    def test_velocity_arrays(self):
        gen = VelocityGridSearch(3, 0.0, 2.0, 2, -1.0, 1.0)
        vxs, vys = gen.velocity_arrays()
        assert vxs.shape == (6,)
        assert vxs.dtype == np.float32


class TestFactory:
    def test_from_dict(self):
        gen = create_trajectory_generator({"name": "SingleVelocitySearch", "vx": 1.0, "vy": 2.0})
        assert isinstance(gen, SingleVelocitySearch)

    def test_from_config(self):
        config = SearchConfiguration()
        gen = create_trajectory_generator(config)
        assert isinstance(gen, EclipticCenteredSearch)
        assert len(gen) == 257 * 129

    def test_unknown_name(self):
        with pytest.raises(KeyError):
            create_trajectory_generator({"name": "DoesNotExist"})
        with pytest.raises(KeyError):
            create_trajectory_generator({})
