from .metrics import GridMetrics, build_grid  # noqa: F401
from .topology import CubeTopology  # noqa: F401
