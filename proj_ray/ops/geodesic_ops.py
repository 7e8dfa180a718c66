"""Placeholder — operations to be implemented."""
