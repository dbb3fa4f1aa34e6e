"""Utilities: profiling, synthetic scenes, masked-array helpers."""
