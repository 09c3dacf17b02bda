"""Placeholder package for user-provided official-model spec YAMLs."""
