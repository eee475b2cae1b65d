from xdump_spark.planner.closure import compute_closure, pull_related

__all__ = ["compute_closure", "pull_related"]
