from hommx_tpu.utils.options import SolverOptions

__all__ = ["SolverOptions"]
