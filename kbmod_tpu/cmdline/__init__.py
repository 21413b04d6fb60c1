"""Command-line tools (reference: src/kbmod_cmdline/, registered as
console scripts in pyproject.toml)."""
