"""Source/sink connectors: parquet-directory databases (testable here) and
JDBC (code-complete, requires a reachable database + driver jar)."""
