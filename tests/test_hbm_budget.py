"""The written HBM budget (VERDICT r4 #7): the survey path's device-memory
need is arithmetic in the code — estimate_search_hbm — and the pipeline's
pre-check enforces it against the real free-memory envelope."""

import numpy as np
import pytest

from kbmod_tpu.configuration import SearchConfiguration
from kbmod_tpu.ops.search import estimate_search_hbm
from kbmod_tpu.ops.search_pallas import pack_psi_phi_words, packed_stream_bytes
from kbmod_tpu.run_search import check_gpu_memory


class FakeStack:
    def __init__(self, T, H, W):
        self.num_times = T
        self.height = H
        self.width = W

    def get_total_pixels(self):
        return self.num_times * self.height * self.width


class TestPackedStreamBytes:
    @pytest.mark.parametrize("T,H,W", [(6, 64, 80), (9, 40, 56), (300, 32, 32)])
    def test_matches_actual_pack_output(self, T, H, W):
        """The budget's dominant term must be the packer's EXACT output
        size, not an approximation — otherwise the 4k fit is folklore."""
        rng = np.random.default_rng(5)
        psi_c = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
        phi_c = rng.integers(1, 256, (T, H, W), dtype=np.uint8)
        words_r, _ = pack_psi_phi_words(psi_c, phi_c)
        assert packed_stream_bytes(T, H, W, itemsize=1) == words_r.size * 4

    def test_matches_uint16_single_stream(self):
        T, H, W = 5, 48, 64
        rng = np.random.default_rng(6)
        psi_c = rng.integers(0, 1 << 16, (T, H, W), dtype=np.uint16)
        phi_c = rng.integers(1, 1 << 16, (T, H, W), dtype=np.uint16)
        words_r, _ = pack_psi_phi_words(psi_c, phi_c)
        assert packed_stream_bytes(T, H, W, itemsize=2) == words_r.size * 4


class TestSurveyBudget:
    def test_survey_4k_fits_one_v5e_chip(self):
        """The production gate config (100 x 4096^2 uint8, 256-row tiles,
        sigma-G over-provisioned K'=32) must fit a 16 GiB chip with
        headroom for the XLA workspace — this is the arithmetic behind
        scripts/survey_pipeline_gate.py and survey_full_grid.py."""
        budget = estimate_search_hbm(
            100, 4096, 4096, encode_num_bytes=1, k_search=32, tile_rows=256
        )
        # Dominant terms are where expected.
        assert budget["packed_stream"] > 7 * 2**30
        assert abs(budget["code_planes"] - 2 * 100 * 4096**2) < 1
        assert budget["total"] < 0.85 * 16 * 2**30

    def test_untiled_4k_would_not_fit(self):
        """Full-frame (untiled) top-K maps at sigma-G depth push past the
        chip: the reason the survey path REQUIRES row tiling."""
        budget = estimate_search_hbm(
            100, 4096, 4096, encode_num_bytes=1, k_search=32, tile_rows=4096
        )
        assert budget["total"] > 16 * 2**30


class TestMemoryPrecheck:
    def _config(self):
        config = SearchConfiguration()
        config.set("encode_num_bytes", 1)
        config.set("results_per_pixel", 8)
        return config

    def test_reduced_envelope_refuses_survey_stack(self, monkeypatch):
        import kbmod_tpu.search as kb

        monkeypatch.setattr(kb, "get_gpu_free_memory", lambda: 2 * 2**30)
        assert not check_gpu_memory(self._config(), FakeStack(100, 4096, 4096))

    def test_full_envelope_admits_survey_stack(self, monkeypatch):
        import kbmod_tpu.search as kb

        monkeypatch.setattr(kb, "get_gpu_free_memory", lambda: 16 * 2**30)
        monkeypatch.setenv("KB_SEARCH_CKPT_DIR", "/tmp/kb_budget_test_ckpt")
        assert check_gpu_memory(self._config(), FakeStack(100, 4096, 4096))

    def test_untiled_survey_stack_refused_even_at_full_envelope(self, monkeypatch):
        import kbmod_tpu.search as kb

        monkeypatch.setattr(kb, "get_gpu_free_memory", lambda: 16 * 2**30)
        monkeypatch.delenv("KB_SEARCH_CKPT_DIR", raising=False)
        assert not check_gpu_memory(self._config(), FakeStack(100, 4096, 4096))
