"""Import-compatibility alias: reference scripts use
``from fbpic.main import Simulation`` (reference main.py)."""
from .core.simulation import Simulation  # noqa: F401
