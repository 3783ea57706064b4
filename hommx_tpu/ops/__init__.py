from hommx_tpu.ops import assembly, elements, function_space, quadrature, solvers, sparse

__all__ = ["assembly", "elements", "function_space", "quadrature", "solvers", "sparse"]
