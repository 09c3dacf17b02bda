"""Packaged config assets (user spec YAMLs may be dropped here)."""
