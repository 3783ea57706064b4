from hommx_tpu.micro.periodic import PeriodicMap, build_periodic_map
from hommx_tpu.micro.engine import MicroEngine

__all__ = ["PeriodicMap", "build_periodic_map", "MicroEngine"]
