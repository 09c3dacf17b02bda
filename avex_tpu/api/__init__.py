"""Packaged API assets: official model specs and console entry points."""
