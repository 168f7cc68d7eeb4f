"""Genome and read-count simulation + evaluation metrics (test fixtures and
benchmark ground truth)."""
