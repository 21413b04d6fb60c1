"""Analysis and visualization helpers (matplotlib-based).

Reference: src/kbmod/analysis/ (plotting.py, visualizer.py,
analyze_fakes.py, results_rater.py).
"""

from kbmod_tpu.analysis.results_rater import ResultsRater, extract_results_row_scalars

__all__ = ["ResultsRater", "extract_results_row_scalars"]
