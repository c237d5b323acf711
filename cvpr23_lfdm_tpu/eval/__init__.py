"""Evaluation harnesses (self-reconstruction metrics, generation)."""
