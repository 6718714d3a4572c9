"""Placeholder — filled in by its milestone."""
