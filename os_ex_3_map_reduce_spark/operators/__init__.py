from .map_reduce import MapReduceClient, map_reduce, run_map_reduce  # noqa: F401
