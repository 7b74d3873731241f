from .catalog import ORACLE, QUERIES, query  # noqa: F401
