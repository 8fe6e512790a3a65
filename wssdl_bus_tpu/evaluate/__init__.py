"""Inference driver and metrics."""
