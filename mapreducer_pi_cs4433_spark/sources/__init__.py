from .loaders import (  # noqa: F401
    load_access_logs,
    load_corpus,
    load_friends,
    load_pages,
    load_table,
)
