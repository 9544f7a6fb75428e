"""Experiment harness: dataset registry, evaluation CLI, baselines."""
