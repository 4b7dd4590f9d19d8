"""Utilities: PLY I/O, point-cloud ops, synthetic scenes, validation."""
