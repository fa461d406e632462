from .catalog import all_oracles, all_queries, get_query  # noqa: F401
