"""SearchConfiguration tests (modeled on the reference's
tests/test_configuration.py)."""

import math
import os
import tempfile

import pytest

from kbmod_tpu.configuration import SearchConfiguration


class TestConfiguration:
    def test_defaults(self):
        config = SearchConfiguration()
        assert config["num_obs"] == 10
        assert config["lh_level"] == 10.0
        assert config["results_per_pixel"] == 8
        assert config["encode_num_bytes"] == -1
        assert config["psf_val"] == 1.4
        assert config["sigmaG_lims"] == [25, 75]
        assert config["do_clustering"] is True
        assert config["cluster_type"] == "all"
        assert config["generator_config"]["name"] == "EclipticCenteredSearch"
        assert config["generator_config"]["velocities"] == [92.0, 526.0, 257]
        assert math.isclose(config["generator_config"]["angles"][0], -math.pi / 15)

    def test_set_and_get(self):
        config = SearchConfiguration()
        config.set("num_obs", 5)
        assert config["num_obs"] == 5
        config.set_multiple({"lh_level": 20.0, "max_results": 10})
        assert config["lh_level"] == 20.0
        assert config["max_results"] == 10

    def test_unset(self):
        config = SearchConfiguration()
        config.set("num_obs", 5)
        config.unset("num_obs")
        assert config["num_obs"] == 10

    def test_validate(self):
        config = SearchConfiguration()
        config.validate()
        config.set("encode_num_bytes", 3)
        with pytest.raises(ValueError):
            config.validate()

    def test_from_dict(self):
        config = SearchConfiguration.from_dict({"num_obs": 7, "custom_thing": "abc"})
        assert config["num_obs"] == 7
        assert config["custom_thing"] == "abc"

    def test_yaml_roundtrip(self):
        config = SearchConfiguration()
        config.set("num_obs", 3)
        config.set("lh_level", 12.5)
        config2 = SearchConfiguration.from_yaml(config.to_yaml())
        assert config2["num_obs"] == 3
        assert config2["lh_level"] == 12.5
        assert config == config2

    def test_file_roundtrip(self):
        config = SearchConfiguration()
        config.set("num_obs", 4)
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "config.yml")
            config.to_file(path)
            config2 = SearchConfiguration.from_file(path)
            assert config2["num_obs"] == 4
            with pytest.raises(FileExistsError):
                config.to_file(path)
            config.to_file(path, overwrite=True)

    def test_copy_independent(self):
        config = SearchConfiguration()
        copy = config.copy()
        copy.set("num_obs", 99)
        assert config["num_obs"] == 10
