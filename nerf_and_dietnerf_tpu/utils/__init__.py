"""Cross-cutting utilities: config schema, save-dir management, logging."""
