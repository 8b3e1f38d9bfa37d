"""Column-level function library (JVM-side expressions + Arrow UDF helpers)."""
