"""Experiment pipeline: JSON-configured multi-stage drivers."""
