"""CLI entry points (reference experiments/: run, render, study, plot)."""
