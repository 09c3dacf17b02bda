"""Model zoo: architecture wrappers, registry, factory, loading."""
