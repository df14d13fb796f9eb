from .tables import TABLES, load, load_all  # noqa: F401
from .generator import sensor_stream_batch, sensor_stream_streaming  # noqa: F401
