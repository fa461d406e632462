from .custom import (  # noqa: F401
    SyntheticEventsDataSource,
    SyntheticPartitionedStreamSource,
    register_synthetic_source,
)
from .io import compact_table, read_table, write_table  # noqa: F401
from .tables import BROADCAST_TABLES, TABLES, load_table, register_views  # noqa: F401
