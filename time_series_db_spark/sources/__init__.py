from time_series_db_spark.sources.tables import (  # noqa: F401
    DEFAULT_STEP_MS,
    EVENTS_MAX_TS,
    EVENTS_MIN_TS,
    fetch_events,
    fetch_series_identities,
    load_table,
    oracle_samples_cte,
)
