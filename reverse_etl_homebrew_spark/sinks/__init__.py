from .control import ControlTables
from .transport import FakeHubSpot, Transport, compute_backoff
from .api_writer import write_plan

__all__ = ["ControlTables", "FakeHubSpot", "Transport", "compute_backoff", "write_plan"]
