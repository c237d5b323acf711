"""Utilities: checkpoint conversion/persistence, visualization, logging."""
