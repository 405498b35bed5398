"""Column-level function helpers (JVM-side where possible)."""
