"""Utilities: checkpoint loading, experiment logging/tracking."""
