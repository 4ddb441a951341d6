"""Column-level building blocks (JVM-side expressions first, pandas UDFs second)."""
