"""Synthetic data generation for tests, demos, and recovery studies."""
