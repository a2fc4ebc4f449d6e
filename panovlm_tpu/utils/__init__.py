"""Shared algorithm utilities: tracks, timing, config."""
