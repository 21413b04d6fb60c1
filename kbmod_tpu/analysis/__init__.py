"""Analysis and visualization helpers (matplotlib-based).

Reference: src/kbmod/analysis/ (plotting.py, visualizer.py,
analyze_fakes.py, results_rater via kbmod_tpu.cmdline).
"""
