from .social import (  # noqa: F401
    above_average_connectors,
    activity_summary,
    filter_by_nationality,
    friend_in_degree,
    nationality_counts,
    page_access_counts,
    stale_or_disconnected,
    top_k_pages,
    unvisited_friend_owners,
    word_count,
)
