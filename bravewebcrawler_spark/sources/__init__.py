"""Sources: deterministic synthetic web + table IO seam."""
